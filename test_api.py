#!/usr/bin/env python
"""API integration client (reference test_api.py equivalent)."""
from whisper_aries_tpu.cli.clients import main

if __name__ == "__main__":
    raise SystemExit(main())
