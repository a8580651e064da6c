#!/usr/bin/env python
"""Thin wrapper for the documented `batch_transcribe.py` CLI (see
whisper_aries_tpu/cli/batch_transcribe.py)."""
from whisper_aries_tpu.cli.batch_transcribe import main

if __name__ == "__main__":
    raise SystemExit(main())
