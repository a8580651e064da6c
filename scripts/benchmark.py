#!/usr/bin/env python
"""``scripts/benchmark.py`` — the benchmark entry the reference README
documents under its scripts/ tree (README.md:117).  Alias for the repo-root
``bench.py`` (same knobs: ARIES_BENCH_BATCH / _BEAM / _TOKENS / _COMPUTE /
_KV); prints one JSON line with throughput vs the reference baseline."""
import pathlib
import runpy
import sys

if __name__ == "__main__":
    root = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    runpy.run_path(str(root / "bench.py"), run_name="__main__")
