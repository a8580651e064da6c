"""Legacy-engine compatibility surface.

The reference ships a second, standalone engine ("Yasmeen's code/
complete_fixed_whisper.py", SURVEY §2.1 Lx) whose distinctive features —
JSON config file with auto-written defaults (:611-636), progress callback
(:687,803-804), adaptive chunk shrink (:721-725), text-merging overlap
strategy (:880-902), and a result dict carrying ``parallel_info`` +
``performance`` blocks (:846-873) with the >=10x/5x/2x self-assessment
(:941-950) — are all implemented across this framework. This module
provides the legacy class shape so callers of the old engine can switch
without rewriting: ``FixedUltraFastTranscriber(config_file)
.transcribe_ultra_fast(path, ...)``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

from whisper_aries_tpu.utils.perf import assess_performance_tier

DEFAULT_CONFIG = {
    # legacy defaults (complete_fixed_whisper.py:611-636, :684-686)
    "model_size": "large-v3",
    "device": "auto",
    "compute_type": "bf16",
    "chunk_duration": 240,
    "overlap_duration": 10,
    "max_workers": None,
    "language": None,
    "beam_size": 1,
    "vad_filter": True,
    "vad_parameters": {
        "min_silence_duration_ms": 500,
        "speech_pad_ms": 200,
    },
}


class FixedUltraFastTranscriber:
    """Config-file-driven engine facade over AriesTranscriber."""

    def __init__(self, config_file: str = "whisper_config.json",
                 allow_random: bool = False, _engine=None):
        self.config_file = config_file
        self.config = dict(DEFAULT_CONFIG)
        p = Path(config_file)
        if p.exists():
            self.config.update(json.loads(p.read_text(encoding="utf-8")))
        else:
            # auto-write defaults like the legacy engine (:611-636)
            p.write_text(json.dumps(DEFAULT_CONFIG, indent=2),
                         encoding="utf-8")
        if _engine is not None:
            self.engine = _engine
        else:
            from whisper_aries_tpu.pipeline.engine import AriesTranscriber

            self.engine = AriesTranscriber(
                model_size=self.config["model_size"],
                compute_type=self.config.get("compute_type", "bf16"),
                chunk_length_minutes=self.config["chunk_duration"] / 60.0,
                overlap_seconds=self.config["overlap_duration"],
                num_workers=self.config.get("max_workers"),
                allow_random=allow_random,
            )

    def transcribe_ultra_fast(
        self,
        audio_path: str,
        language: Optional[str] = None,
        progress_callback=None,
        output_formats=("txt", "json"),
        output_dir: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Legacy entry point (complete_fixed_whisper.py:680-873 shape)."""
        t0 = time.time()

        def cb(done, total):
            if progress_callback:
                progress_callback({"completed_chunks": done,
                                   "total_chunks": total})

        res = self.engine.transcribe_file(
            audio_path,
            language=language or self.config.get("language"),
            beam_size=self.config.get("beam_size", 1),
            vad_filter=self.config.get("vad_filter", True),
            vad_parameters=self.config.get("vad_parameters"),
            output_formats=output_formats,
            output_dir=output_dir,
            chunking_mode="fixed",
            overlap_strategy="merge",  # the legacy text-merge strategy
            progress_callback=cb,
        )
        total_time = time.time() - t0
        speed = res["duration"] / total_time if total_time > 0 else 0.0
        perf = res.get("performance") or {}
        return {
            "success": res["success"],
            "text": res["text"],
            "segments": res["segments"],
            "language": res["language"],
            "audio_duration": res["duration"],
            "parallel_info": {
                "workers_used": self.engine.batch_size,
                "chunks_processed": res["num_windows"],
                "parallel_efficiency": perf.get("parallel_efficiency"),
                "chunks_per_minute": perf.get("units_per_minute"),
            },
            "performance": {
                "total_time": total_time,
                "speed_factor": speed,
                "assessment": assess_performance_tier(speed),
            },
            "outputs": res.get("output_files", {}),
        }
