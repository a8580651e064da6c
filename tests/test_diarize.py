"""Diarization tests: clustering correctness, net shapes, end-to-end
two-speaker separation with synthetic voices."""

import numpy as np
import pytest

from whisper_aries_tpu.diarize import (
    DiarizationPipeline,
    agglomerative_cluster,
    relabel_by_first_appearance,
)
from whisper_aries_tpu.diarize.cluster import cosine_distance_matrix

SR = 16000


# ---------------------------------------------------------------------------
# Clustering
# ---------------------------------------------------------------------------


def test_cluster_two_blobs(rng):
    a = rng.normal([5, 0, 0], 0.05, (10, 3))
    b = rng.normal([0, 5, 0], 0.05, (8, 3))
    emb = np.concatenate([a, b])
    labels = agglomerative_cluster(emb, threshold=0.5)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_cluster_threshold_controls_merging(rng):
    a = rng.normal([5, 1, 0], 0.05, (6, 3))
    b = rng.normal([5, -1, 0], 0.05, (6, 3))  # ~0.077 cosine distance apart
    emb = np.concatenate([a, b])
    tight = agglomerative_cluster(emb, threshold=0.01)
    loose = agglomerative_cluster(emb, threshold=0.5)
    assert len(set(tight)) == 2
    assert len(set(loose)) == 1


def test_cluster_constraints(rng):
    a = rng.normal([5, 0, 0], 0.05, (6, 3))
    b = rng.normal([0, 5, 0], 0.05, (6, 3))
    emb = np.concatenate([a, b])
    one = agglomerative_cluster(emb, threshold=0.1, max_clusters=1)
    assert len(set(one)) == 1
    many = agglomerative_cluster(emb, threshold=1.9, min_clusters=2)
    assert len(set(many)) >= 2


def test_cluster_edge_cases():
    assert agglomerative_cluster(np.zeros((0, 4))).shape == (0,)
    assert agglomerative_cluster(np.ones((1, 4))).tolist() == [0]


def test_relabel_by_first_appearance():
    labels = np.array([2, 2, 0, 1, 0])
    order = np.array([0, 1, 2, 3, 4])
    out = relabel_by_first_appearance(labels, order)
    assert out.tolist() == [0, 0, 1, 2, 1]


# ---------------------------------------------------------------------------
# Nets
# ---------------------------------------------------------------------------


def test_segmentation_net_shapes():
    import jax.numpy as jnp

    from whisper_aries_tpu.models.diarize_nets import (
        SegDims,
        init_segmentation,
        powerset_to_multilabel,
        segmentation_forward,
    )

    dims = SegDims()
    params = init_segmentation(dims)
    mel = jnp.zeros((2, 80, 200))
    lp = segmentation_forward(params, mel, dims)
    assert lp.shape == (2, 100, dims.n_classes)
    probs = np.exp(np.asarray(lp))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    ml = powerset_to_multilabel(np.asarray(lp))
    assert ml.shape == (2, 100, 3)
    assert (ml >= 0).all() and (ml <= 1).all()


def test_embedding_net_shapes_and_norm():
    import jax.numpy as jnp

    from whisper_aries_tpu.models.diarize_nets import (
        embedding_forward,
        init_embedding,
    )

    params = init_embedding()
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((3, 80, 200)),
                      jnp.float32)
    emb = np.asarray(embedding_forward(params, mel))
    assert emb.shape == (3, 192)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# End-to-end (classical fallback mode)
# ---------------------------------------------------------------------------


def synth_speaker(f0, formant, spans, total_s, seed):
    """Cheap 'voice': harmonic stack at f0 with a formant emphasis."""
    rng = np.random.default_rng(seed)
    n = int(total_s * SR)
    t = np.arange(n) / SR
    x = 0.002 * rng.standard_normal(n).astype(np.float32)
    for s, e in spans:
        m = (t >= s) & (t < e)
        tm = t[m]
        v = sum(
            (1.0 / (1 + abs(k * f0 - formant) / 300.0))
            * np.sin(2 * np.pi * k * f0 * tm + k)
            for k in range(1, 12)
        )
        env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * tm + seed)
        x[m] += (0.25 * v / 3.0 * env).astype(np.float32)
    return x


def test_diarization_two_speakers():
    # NOTE: this out-of-corpus voice (harmonic stack, gapless smooth-AM
    # envelope) is the hardest case in the suite — it needed the
    # union-with-marginal-floor powerset decode for full turn coverage
    # (the hard argmax alone fragmented turns on channel flicker).
    a = synth_speaker(110, 500, [(0.5, 4.0), (8.0, 11.5)], 16.0, seed=1)
    b = synth_speaker(280, 2400, [(4.5, 7.5), (12.0, 15.5)], 16.0, seed=2)
    wav = a + b
    pipe = DiarizationPipeline()  # per-backend default threshold
    turns = pipe(wav)
    assert turns, "no turns detected"
    speakers = {t["speaker"] for t in turns}
    assert speakers == {"SPEAKER_00", "SPEAKER_01"}

    def speaker_at(tm):
        for t in turns:
            if t["start"] <= tm <= t["end"]:
                return t["speaker"]
        return None

    # first voice appears first -> SPEAKER_00
    assert speaker_at(2.0) == "SPEAKER_00"
    assert speaker_at(6.0) == "SPEAKER_01"
    assert speaker_at(9.5) == "SPEAKER_00"
    assert speaker_at(13.5) == "SPEAKER_01"


def test_diarization_num_speakers_constraint():
    a = synth_speaker(110, 500, [(0.5, 3.0)], 8.0, seed=1)
    b = synth_speaker(280, 2400, [(4.0, 7.0)], 8.0, seed=2)
    pipe = DiarizationPipeline()
    turns = pipe(a + b, num_speakers=1)
    assert {t["speaker"] for t in turns} == {"SPEAKER_00"}


def test_diarization_silence():
    x = 0.001 * np.random.default_rng(0).standard_normal(SR * 4).astype(np.float32)
    assert DiarizationPipeline()(x) == []


def test_dedupe():
    turns = [
        {"start": 1.0, "end": 2.0, "speaker": "SPEAKER_00"},
        {"start": 1.0, "end": 2.0, "speaker": "SPEAKER_00"},
        {"start": 2.0, "end": 3.0, "speaker": "SPEAKER_01"},
    ]
    assert len(DiarizationPipeline.dedupe(turns)) == 2


# ---------------------------------------------------------------------------
# Neural segmentation mode
# ---------------------------------------------------------------------------


def test_neural_active_regions_from_synthetic_probs():
    """Region extraction + window stitching logic with injected seg probs."""
    pipe = DiarizationPipeline()
    pipe.seg_params = object()  # enable neural path

    def fake_seg(wav):
        # two 10s windows (hop 5): speaker 0 active 1-3s, speaker 1 active 6-9s
        probs = np.zeros((2, 500, 3), np.float32)
        probs[0, 50:150, 0] = 0.9     # window0: 1.0-3.0s spk0
        probs[0, 300:450, 1] = 0.9    # window0: 6.0-9.0s spk1
        probs[1, 50:200, 1] = 0.9     # window1 (starts 5s): 6.0-9.0s spk1
        return probs, [0.0, 5.0]

    pipe._segmentation_multilabel = fake_seg
    # non-silent audio: the neural path gates sustained sub--56dBFS spans
    wav = 0.05 * np.ones(16000 * 15, np.float32)
    regions = pipe._neural_active_regions(wav)
    assert (1.0, 3.0) in regions
    # the 6-9s activity appears once per window but clipped to unique spans
    mids = [r for r in regions if 5.5 < r[0] < 9.5]
    covered = sum(e - s for s, e in mids)
    assert 2.4 <= covered <= 3.6  # ~3s total, no double counting


def test_neural_mode_end_to_end_with_fake_segmentation():
    """Full neural-mode flow: fake segmentation + real embeddings/cluster."""
    a = synth_speaker(110, 500, [(1.0, 4.0)], 12.0, seed=1)
    b = synth_speaker(280, 2400, [(6.0, 9.0)], 12.0, seed=2)
    wav = a + b
    pipe = DiarizationPipeline()  # per-backend default threshold
    pipe.seg_params = object()

    def fake_seg(w):
        probs = np.zeros((2, 500, 3), np.float32)
        probs[0, 50:200, 0] = 0.9   # 1-4s
        probs[0, 300:450, 1] = 0.9  # 6-9s
        probs[1, 50:200, 0] = 0.9   # 6-9s in window1 coords
        return probs, [0.0, 5.0]

    pipe._segmentation_multilabel = fake_seg
    turns = pipe(wav)
    assert turns
    speakers = {t["speaker"] for t in turns}
    assert speakers == {"SPEAKER_00", "SPEAKER_01"}

    def speaker_at(tm):
        for t in turns:
            if t["start"] <= tm <= t["end"]:
                return t["speaker"]
        return None

    assert speaker_at(2.0) == "SPEAKER_00"
    assert speaker_at(7.5) == "SPEAKER_01"
