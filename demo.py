#!/usr/bin/env python
"""End-to-end demo on the bundled sample audio."""
from whisper_aries_tpu.cli.demo import main

if __name__ == "__main__":
    raise SystemExit(main())
