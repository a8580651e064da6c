#!/usr/bin/env python
"""LLM meeting analysis CLI (reference-compatible entry point)."""
from whisper_aries_tpu.cli.meeting import main

if __name__ == "__main__":
    raise SystemExit(main())
