"""Process / device memory probes.

Extends the reference's psutil RSS probe (utils.py:79-89) with TPU HBM stats
via jax, used by the batch-size autotuner in the parallel layer.
"""

from __future__ import annotations

from typing import Optional


def get_memory_usage() -> Optional[float]:
    """Current process RSS in MB, or None when psutil is unavailable."""
    try:
        import psutil

        return psutil.Process().memory_info().rss / (1024 * 1024)
    except ImportError:
        return None


def get_device_memory_stats() -> list:
    """Per-device memory stats from jax (empty list if unavailable).

    Replaces the reference's torch.cuda VRAM probes
    (final_optimized_transcriber.py:223-232) for worker/batch sizing.
    """
    try:
        import jax

        stats = []
        for d in jax.devices():
            s = getattr(d, "memory_stats", lambda: None)()
            stats.append(
                {
                    "device": str(d),
                    "bytes_in_use": (s or {}).get("bytes_in_use"),
                    "bytes_limit": (s or {}).get("bytes_limit"),
                }
            )
        return stats
    except Exception:
        return []


def is_oom_error(e: BaseException) -> bool:
    """Out-of-device-memory heuristic for retry ladders.

    XLA raises XlaRuntimeError with RESOURCE_EXHAUSTED; the axon remote
    tunnel can strip the message down to generic text, so match the status
    first and fall back to substrings.
    """
    name = type(e).__name__
    msg = str(e).lower()
    # all observed spellings: RESOURCE_EXHAUSTED, "Resource exhausted",
    # and the axon backend's "TPU backend error (ResourceExhausted)"
    # (no separator — missed by the first two patterns until round 5)
    if ("resource_exhausted" in msg or "resource exhausted" in msg
            or "resourceexhausted" in msg):
        return True
    if name in ("XlaRuntimeError", "RuntimeError", "JaxRuntimeError") and (
        "memory" in msg or "hbm" in msg or "oom" in msg or "allocat" in msg
    ):
        return True
    # The axon remote-compile tunnel wraps compile-time OOM as an opaque
    # "HTTP 500: tpu_compile_helper subprocess exit code 1" with the real
    # allocation table only in stderr logs. Treat it as retryable-as-OOM:
    # a genuine compile bug will keep failing down to batch 1 and surface.
    if "tpu_compile_helper" in msg or "remote_compile" in msg:
        return True
    return False
