#!/usr/bin/env python
"""Full conversation pipeline CLI (reference-compatible entry point)."""
from whisper_aries_tpu.cli.conversation import main

if __name__ == "__main__":
    raise SystemExit(main())
