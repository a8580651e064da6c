"""Performance-monitor and diagnostics tests."""

import time

from whisper_aries_tpu.utils.perf import (
    PerformanceMonitor,
    WorkerDiagnostics,
    assess_performance_tier,
)


def test_monitor_metrics():
    mon = PerformanceMonitor(total_audio_s=120.0)
    mon.record(0, 30.0, 0.5, device=0)
    mon.record(1, 30.0, 0.5, device=1)
    snap = mon.snapshot()
    assert snap["completed_units"] == 2
    assert snap["completed_audio_s"] == 60.0
    assert snap["average_speed_factor"] > 0
    assert snap["eta_s"] is not None and snap["eta_s"] >= 0
    assert snap["per_device_distribution"] == {0: 1, 1: 1}
    assert snap["parallel_efficiency"] == 1.0


def test_monitor_callback_and_tier():
    calls = []
    mon = PerformanceMonitor(progress_callback=calls.append)
    mon.record(0, 30.0, 1.0)
    assert len(calls) == 1
    rep = mon.final_report()
    assert rep["performance_tier"] in (
        "excellent", "great", "good", "below-realtime-target"
    )


def test_tiers():
    assert assess_performance_tier(12) == "excellent"
    assert assess_performance_tier(6) == "great"
    assert assess_performance_tier(3) == "good"
    assert assess_performance_tier(1) == "below-realtime-target"


def test_worker_diagnostics():
    d = WorkerDiagnostics()
    d.log(0, "PLANNED")
    d.log(0, "DECODING", "batch 0")
    d.log(0, "COMPLETED")
    d.log(1, "ERROR", "boom")
    assert d.summary() == {"PLANNED": 1, "DECODING": 1, "COMPLETED": 1,
                           "ERROR": 1}
    lines = d.dump()
    assert len(lines) == 4 and "boom" in lines[-1]


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from whisper_aries_tpu.utils.perf import profile_trace

    with profile_trace(str(tmp_path / "trace")) as d:
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    import os

    assert any(os.scandir(d))
