#!/usr/bin/env python
"""Automated dependency installation (reference README.md:36-40)."""
from whisper_aries_tpu.cli.install_packages import main

if __name__ == "__main__":
    raise SystemExit(main())
