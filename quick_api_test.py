#!/usr/bin/env python
"""Non-interactive API smoke test (reference quick_api_test.py equivalent)."""
import sys

from whisper_aries_tpu.cli.clients import quick_test

if __name__ == "__main__":
    audio = sys.argv[1] if len(sys.argv) > 1 else "examples/sample_audio.wav"
    base = sys.argv[2] if len(sys.argv) > 2 else "http://localhost:8001"
    raise SystemExit(0 if quick_test(audio, base) else 1)
