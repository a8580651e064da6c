"""``batch_transcribe.py`` — directory/batch transcription CLI.

Documented in the reference README (README.md:101-118) but absent from its
repo; named by the driver's BASELINE config #4 ("batch directory
transcription with batched beam search across files"). One resident engine
transcribes every file; windows from the batch share the same compiled
program, and per-file outputs land next to the sources (or in
--output-dir). Already-transcribed files are skipped unless --overwrite —
per-file resume for long batch jobs (SURVEY §5 checkpoint/resume gap).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path
from typing import Optional, Sequence

AUDIO_EXTS = {".wav", ".mp3", ".flac", ".ogg", ".m4a", ".mp4", ".mov", ".mkv",
              ".webm", ".avi"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="batch_transcribe",
        description="Transcribe every media file in a directory",
    )
    p.add_argument("directory", help="directory (searched recursively)")
    p.add_argument("--model", default="large-v3")
    p.add_argument("--language", default=None)
    p.add_argument("--beam-size", type=int, default=1)
    p.add_argument("--formats", default="txt,json")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--overwrite", action="store_true",
                   help="re-transcribe files with existing outputs")
    p.add_argument("--model-cache", default="./models")
    p.add_argument("--allow-random", action="store_true")
    p.add_argument("--manifest", default=None,
                   help="write a JSON manifest of all results here")
    p.add_argument("--verbose", "-v", action="store_true")
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)
    root = Path(args.directory)
    if not root.is_dir():
        print(f"not a directory: {root}", file=sys.stderr)
        return 1
    files = sorted(
        p for p in root.rglob("*") if p.suffix.lower() in AUDIO_EXTS
    )
    if not files:
        print("no media files found", file=sys.stderr)
        return 1
    formats = [f.strip() for f in args.formats.split(",") if f.strip()]

    from whisper_aries_tpu.pipeline.engine import AriesTranscriber

    engine = AriesTranscriber(
        model_size=args.model,
        num_workers=args.workers,
        cache_dir=args.model_cache,
        allow_random=args.allow_random,
    )

    t0 = time.time()
    total_audio = 0.0
    manifest = []
    done = skipped = failed = 0
    for i, f in enumerate(files, 1):
        out_dir = Path(args.output_dir) if args.output_dir else f.parent
        primary = out_dir / f"{f.stem}.{formats[0]}"
        if primary.exists() and not args.overwrite:
            skipped += 1
            print(f"[{i}/{len(files)}] skip (exists): {f.name}")
            continue
        try:
            res = engine.transcribe_file(
                str(f),
                language=args.language,
                beam_size=args.beam_size,
                output_formats=formats,
                output_dir=str(out_dir),
            )
            total_audio += res["duration"]
            done += 1
            manifest.append({
                "file": str(f),
                "language": res["language"],
                "duration": res["duration"],
                "segments": len(res["segments"]),
                "rtf": res["real_time_factor"],
                "outputs": res.get("output_files", {}),
            })
            print(f"[{i}/{len(files)}] {f.name}: {res['duration']:.0f}s audio "
                  f"@ {res['real_time_factor']:.1f}x")
        except Exception as e:
            failed += 1
            manifest.append({"file": str(f), "error": str(e)})
            print(f"[{i}/{len(files)}] FAILED {f.name}: {e}", file=sys.stderr)

    wall = time.time() - t0
    agg_rtf = total_audio / wall if wall > 0 else 0.0
    print(f"\n{done} transcribed, {skipped} skipped, {failed} failed; "
          f"{total_audio:.0f}s audio in {wall:.0f}s = {agg_rtf:.1f}x realtime")
    if args.manifest:
        with open(args.manifest, "w", encoding="utf-8") as mf:
            json.dump({"results": manifest, "aggregate_rtf": agg_rtf}, mf,
                      indent=2)
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
