#!/usr/bin/env python
"""Thin wrapper for the documented `transcribe.py` CLI (see
whisper_aries_tpu/cli/transcribe.py)."""
from whisper_aries_tpu.cli.transcribe import main

if __name__ == "__main__":
    raise SystemExit(main())
