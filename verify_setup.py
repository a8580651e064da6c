#!/usr/bin/env python
"""Environment verification CLI."""
from whisper_aries_tpu.cli.verify_setup import main

if __name__ == "__main__":
    raise SystemExit(main())
