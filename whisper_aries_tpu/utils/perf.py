"""Performance monitoring and profiling.

Parity with the reference's two real observability components (SURVEY §5):
  * ``PerformanceMonitor`` (Yasmeen's code/complete_fixed_whisper.py:527-598)
    — thread-safe ledger of per-chunk processing, rolling speed factor
    (audio-sec/wall-sec), ETA, chunks/min, per-worker distribution, and
    parallel efficiency, surfaced to a progress callback;
  * ``WorkerDiagnostics`` (:249-284) — timestamped activity log.

Here "worker" becomes "device/window batch", and ``profile_trace`` adds the
TPU-native upgrade: a context manager around ``jax.profiler`` producing
XPlane traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional


class PerformanceMonitor:
    """Ledger of completed decode batches/windows with rolling stats."""

    def __init__(self, total_audio_s: float = 0.0,
                 progress_callback: Optional[Callable[[Dict], None]] = None):
        self._lock = threading.Lock()
        self.total_audio_s = total_audio_s
        self.progress_callback = progress_callback
        self.start_time = time.time()
        self.records: List[Dict[str, Any]] = []

    def record(self, unit_id: int, audio_s: float, wall_s: float,
               device: int = 0, kind: str = "window") -> None:
        with self._lock:
            self.records.append({
                "id": unit_id, "audio_s": audio_s, "wall_s": wall_s,
                "device": device, "kind": kind, "t": time.time(),
            })
        if self.progress_callback:
            self.progress_callback(self.snapshot())

    # -- derived metrics ---------------------------------------------------

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            recs = list(self.records)
        elapsed = max(time.time() - self.start_time, 1e-9)
        done_audio = sum(r["audio_s"] for r in recs)
        speed = done_audio / elapsed
        remaining = max(0.0, self.total_audio_s - done_audio)
        eta = remaining / speed if speed > 0 else None
        per_device: Dict[int, int] = defaultdict(int)
        for r in recs:
            per_device[r["device"]] += 1
        n_devices = max(len(per_device), 1)
        ideal = len(recs) / n_devices if recs else 0
        efficiency = (
            min(per_device.values()) / ideal if recs and ideal > 0 else 0.0
        )
        return {
            "elapsed_s": elapsed,
            "completed_units": len(recs),
            "completed_audio_s": done_audio,
            "average_speed_factor": speed,
            "units_per_minute": len(recs) / elapsed * 60.0,
            "eta_s": eta,
            "per_device_distribution": dict(per_device),
            "parallel_efficiency": efficiency,
        }

    def final_report(self) -> Dict[str, Any]:
        snap = self.snapshot()
        snap["performance_tier"] = assess_performance_tier(
            snap["average_speed_factor"]
        )
        return snap


def assess_performance_tier(speed_factor: float) -> str:
    """The reference's self-assessment tiers
    (complete_fixed_whisper.py:941-950)."""
    if speed_factor >= 10:
        return "excellent"
    if speed_factor >= 5:
        return "great"
    if speed_factor >= 2:
        return "good"
    return "below-realtime-target"


class WorkerDiagnostics:
    """Timestamped per-unit activity log
    (complete_fixed_whisper.py:249-284 equivalent)."""

    STATES = ("PLANNED", "ENCODING", "DECODING", "FALLBACK", "COMPLETED",
              "ERROR")

    def __init__(self):
        self._lock = threading.Lock()
        self.events: List[Dict[str, Any]] = []

    def log(self, unit_id: Any, state: str, detail: str = "") -> None:
        with self._lock:
            self.events.append({
                "t": time.time(), "unit": unit_id, "state": state,
                "detail": detail, "thread": threading.get_ident(),
            })

    def summary(self) -> Dict[str, int]:
        with self._lock:
            counts: Dict[str, int] = defaultdict(int)
            for e in self.events:
                counts[e["state"]] += 1
            return dict(counts)

    def dump(self) -> List[str]:
        with self._lock:
            return [
                f"{e['t']:.3f} [{e['thread']}] unit={e['unit']} "
                f"{e['state']} {e['detail']}"
                for e in self.events
            ]


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/aries_profile"):
    """jax.profiler trace context (TensorBoard/Perfetto-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
