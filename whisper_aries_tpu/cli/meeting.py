"""Meeting-analysis CLI (reference: meeting_analyzer.py:115-120)."""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="meeting_analyzer",
        description="LLM meeting summary from a pipeline JSON transcript",
    )
    p.add_argument("transcript_json")
    p.add_argument("--model", default=None, help="chat model name")
    p.add_argument("--base-url", default=None,
                   help="OpenAI-compatible API base URL")
    args = p.parse_args(argv)

    from whisper_aries_tpu.analyze.meeting import analyze_meeting
    from whisper_aries_tpu.config import load_config

    cfg = load_config().analyze
    if args.model:
        cfg.model = args.model
    if args.base_url:
        cfg.base_url = args.base_url
    try:
        outs = analyze_meeting(args.transcript_json, cfg)
    except Exception as e:
        print(f"analysis failed: {e}", file=sys.stderr)
        return 1
    for kind, path in outs.items():
        print(f"{kind}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
