"""VAD scorer, segment state machine, and window-planner tests."""

import numpy as np
import pytest

from whisper_aries_tpu.vad import (
    VadOptions,
    collect_speech_segments,
    get_speech_probs,
    plan_chunks,
    plan_windows,
)
from whisper_aries_tpu.vad.planner import Window, windows_to_batch

SR = 16000


def synth(speech_spans, total_s, seed=0):
    """Noise floor with 'speech' (modulated tone bursts) in given spans."""
    rng = np.random.default_rng(seed)
    n = int(total_s * SR)
    x = 0.002 * rng.standard_normal(n).astype(np.float32)
    t = np.arange(n) / SR
    for s, e in speech_spans:
        m = (t >= s) & (t < e)
        x[m] += (0.3 * np.sin(2 * np.pi * 300 * t[m])
                 * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t[m]))).astype(np.float32)
    return x


def test_speech_probs_separate_speech_from_silence():
    x = synth([(2.0, 5.0)], 10.0)
    probs = get_speech_probs(x)
    frame_s = 512 / SR
    t = np.arange(len(probs)) * frame_s
    sp = probs[(t > 2.2) & (t < 4.8)]
    sil = probs[(t < 1.5) | (t > 5.5)]
    assert sp.mean() > 0.8
    assert sil.mean() < 0.2


def test_collect_segments_basic():
    x = synth([(2.0, 5.0), (7.0, 9.0)], 12.0)
    probs = get_speech_probs(x)
    segs = collect_speech_segments(probs, VadOptions(), total_samples=len(x))
    assert len(segs) == 2
    (s0, e0), (s1, e1) = segs
    assert s0 == pytest.approx(2.0, abs=0.35)  # includes 200ms pad
    assert e0 == pytest.approx(5.0, abs=0.6)
    assert s1 == pytest.approx(7.0, abs=0.35)


def test_collect_segments_bridges_short_silence():
    # 300 ms gap < default 500 ms min_silence -> one segment
    x = synth([(1.0, 3.0), (3.3, 5.0)], 7.0)
    probs = get_speech_probs(x)
    segs = collect_speech_segments(probs, VadOptions(), total_samples=len(x))
    assert len(segs) == 1


def test_collect_segments_drops_blips():
    x = synth([(2.0, 2.1)], 6.0)  # 100ms < 250ms min_speech
    probs = get_speech_probs(x)
    segs = collect_speech_segments(probs, VadOptions(), total_samples=len(x))
    assert segs == []


def test_collect_segments_max_duration_split():
    x = synth([(0.5, 40.0)], 41.0)
    probs = get_speech_probs(x)
    segs = collect_speech_segments(
        probs, VadOptions(max_speech_duration_s=30.0), total_samples=len(x)
    )
    assert len(segs) >= 2
    assert all(e - s <= 30.5 for s, e in segs)


def test_all_silence():
    x = 0.001 * np.random.default_rng(0).standard_normal(SR * 5).astype(np.float32)
    segs = collect_speech_segments(get_speech_probs(x), total_samples=len(x))
    assert segs == []


# ---------------------------------------------------------------------------
# Planner
# ---------------------------------------------------------------------------


def test_plan_windows_packs_within_30s():
    segs = [(0.0, 10.0), (12.0, 25.0)]
    ws = plan_windows(segs, 30.0)
    assert len(ws) == 1
    assert ws[0].start == 0.0 and ws[0].end == 25.0


def test_plan_windows_skips_long_silence():
    segs = [(0.0, 10.0), (100.0, 110.0)]
    ws = plan_windows(segs, 120.0)
    assert len(ws) == 2
    assert ws[1].start == 100.0


def test_plan_windows_tiles_long_speech():
    segs = [(0.0, 95.0)]
    ws = plan_windows(segs, 100.0)
    assert sum(w.duration for w in ws) == pytest.approx(95.0)
    assert all(w.duration <= 30.0 + 1e-9 for w in ws)
    # contiguous tiling
    for a, b in zip(ws, ws[1:]):
        assert b.start == pytest.approx(a.end)


def test_plan_windows_respects_window_budget():
    # gap bridging must not stretch a window past 30s
    segs = [(0.0, 20.0), (22.0, 40.0)]
    ws = plan_windows(segs, 50.0)
    assert all(w.duration <= 30.0 + 1e-9 for w in ws)
    covered = sum(w.duration for w in ws)
    assert covered >= 36.0  # all speech covered


def test_plan_chunks_reference_layout():
    ws = plan_chunks(600.0, chunk_length_minutes=3.0, overlap_seconds=5.0)
    assert len(ws) == 4  # ceil(600/180)
    assert ws[0].start == 0.0 and ws[0].end == 185.0
    assert ws[1].start == 180.0
    assert ws[-1].end == 600.0
    assert [w.chunk_id for w in ws] == [0, 1, 2, 3]


def test_windows_to_batch_shapes():
    audio = np.arange(SR * 40, dtype=np.float32) / (SR * 40)
    ws = [Window(0.0, 30.0), Window(30.0, 40.0)]
    batch = windows_to_batch(audio, ws)
    assert batch.shape == (2, SR * 30)
    assert batch[0, 0] == audio[0]
    assert batch[1, 0] == audio[SR * 30]
    # zero padding after the short window
    assert batch[1, SR * 10 :].max() == 0.0


# ---------------------------------------------------------------------------
# Learned VAD net
# ---------------------------------------------------------------------------


def test_vad_net_shapes_and_range():
    import jax.numpy as jnp

    from whisper_aries_tpu.models.vad_net import (
        VadDims,
        init_vad,
        make_nn_speech_scorer,
        vad_forward,
    )

    dims = VadDims()
    params = init_vad(dims)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 512 * 20)), jnp.float32
    )
    probs = np.asarray(vad_forward(params, audio, dims))
    assert probs.shape == (2, 20)
    assert (probs >= 0).all() and (probs <= 1).all()

    scorer = make_nn_speech_scorer(params, dims)
    p = scorer(np.zeros(512 * 7 + 100, np.float32))
    assert p.shape == (7,)
    assert scorer(np.zeros(10, np.float32)).shape == (0,)


def test_vad_net_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from whisper_aries_tpu.models.vad_net import (
        init_vad,
        load_vad_params,
        vad_forward,
    )

    params = init_vad()
    flat = {}
    for i, leaf in enumerate(params["stem"]):
        flat[f"stem.{i}.w"] = np.asarray(leaf["w"])
        flat[f"stem.{i}.b"] = np.asarray(leaf["b"])
    for i, leaf in enumerate(params["ctx"]):
        flat[f"ctx.{i}.w"] = np.asarray(leaf["w"])
        flat[f"ctx.{i}.b"] = np.asarray(leaf["b"])
    flat["head.w"] = np.asarray(params["head"]["w"])
    flat["head.b"] = np.asarray(params["head"]["b"])
    save_file(flat, str(tmp_path / "vad.safetensors"))

    loaded = load_vad_params(str(tmp_path))
    assert loaded is not None
    audio = jnp.asarray(np.random.default_rng(1).standard_normal((1, 512 * 5)),
                        jnp.float32)
    np.testing.assert_allclose(
        np.asarray(vad_forward(params, audio)),
        np.asarray(vad_forward(loaded, audio)),
        atol=1e-6,
    )
    assert load_vad_params(str(tmp_path / "nope")) is None
