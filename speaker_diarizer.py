#!/usr/bin/env python
"""Standalone speaker diarization CLI (reference-compatible entry point)."""
from whisper_aries_tpu.cli.diarize import main

if __name__ == "__main__":
    raise SystemExit(main())
