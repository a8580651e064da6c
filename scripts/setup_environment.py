#!/usr/bin/env python
"""``scripts/setup_environment.py`` (reference README.md:116): one-shot
environment setup — install the pinned package list, build the native
audio runtime, then run the verification suite."""
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

if __name__ == "__main__":
    sys.path.insert(0, str(ROOT))
    from whisper_aries_tpu.cli.install_packages import main as install

    rc = install(sys.argv[1:])
    if rc == 0:
        mk = subprocess.call(["make", "-C", str(ROOT / "native")])
        if mk != 0:
            print("native build failed — numpy fallbacks will be used")
        from whisper_aries_tpu.cli.verify_setup import main as verify

        rc = verify([])
    raise SystemExit(rc)
