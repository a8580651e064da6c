#!/usr/bin/env python
"""Job-queue API server (reference-compatible entry point, port 8001)."""
from whisper_aries_tpu.serve.server import main

if __name__ == "__main__":
    main()
