"""Word-timestamp tests: DTW correctness, word splitting, attention-to-time
mapping on synthetic attention, and engine integration."""

import numpy as np
import pytest

from whisper_aries_tpu.align.word_align import (
    attention_to_token_times,
    dtw_path,
    find_word_alignments,
    split_tokens_into_words,
)


def test_dtw_identity_diagonal():
    n = 6
    cost = np.ones((n, n)) - np.eye(n)  # cheapest along the diagonal
    ti, tj = dtw_path(cost)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == n - 1 and tj[-1] == n - 1
    # monotonic
    assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()
    # diagonal is recovered
    on_diag = sum(1 for a, b in zip(ti, tj) if a == b)
    assert on_diag == n


def test_dtw_stretched_alignment():
    # 3 text tokens against 9 time steps, each token 'active' for 3 steps
    cost = np.ones((3, 9))
    for t in range(3):
        cost[t, 3 * t : 3 * t + 3] = 0.0
    ti, tj = dtw_path(cost)
    # token boundaries land at the right times
    first_j = {t: None for t in range(3)}
    for a, b in zip(ti, tj):
        if first_j[a] is None:
            first_j[a] = b
    assert first_j[0] == 0
    assert 2 <= first_j[1] <= 3
    assert 5 <= first_j[2] <= 6


def test_attention_to_token_times_synthetic():
    # (L=4, H=2, T_text=3, T_audio=50): token t attends around frame 10+15t
    L, H, T, A = 4, 2, 3, 50
    qk = np.zeros((L, H, T, A))
    for t in range(T):
        center = 10 + 15 * t
        qk[:, :, t, :] = -((np.arange(A) - center) ** 2) / 20.0
    times = attention_to_token_times(qk, n_frames=A)
    assert times.shape == (T,)
    # DTW marks a token's start where attention shifts to it — the midpoint
    # between adjacent centers (10, 25, 40 -> boundaries ~17.5, ~32.5 frames)
    assert times[0] == 0.0
    assert abs(times[1] - 0.35) < 0.08
    assert abs(times[2] - 0.65) < 0.08


class WordTok:
    """ids: 0='he',1='llo',2=' wor',3='ld',4=' hi'; specials from 10."""

    PIECES = {0: "he", 1: "llo", 2: " wor", 3: "ld", 4: " hi"}

    def __init__(self):
        from whisper_aries_tpu.decoding.tokenizer import build_special_tokens

        self.specials = build_special_tokens(10, 2)

    def decode(self, ids, skip_special=True):
        return "".join(self.PIECES.get(int(i), "") for i in ids
                       if int(i) < 10)


def test_split_tokens_into_words():
    tok = WordTok()
    words, groups = split_tokens_into_words([0, 1, 2, 3, 4], tok)
    assert words == ["hello", " world", " hi"]
    assert groups == [[0, 1], [2, 3], [4]]


def test_find_word_alignments_end_to_end():
    tok = WordTok()
    sp = tok.specials
    t0 = sp.seconds_to_timestamp(0.0)
    tokens = [t0, 0, 1, 2, 3, sp.seconds_to_timestamp(2.0)]
    L, H, A = 4, 2, 120
    qk = np.zeros((L, H, len(tokens), A))
    centers = [0, 10, 20, 45, 60, 100]  # frames (20ms) per token
    for i, c in enumerate(centers):
        qk[:, :, i, :] = -((np.arange(A) - c) ** 2) / 30.0
    words = find_word_alignments(tokens, qk, tok, n_frames=A)
    assert [w["word"] for w in words] == ["hello", " world"]
    w0, w1 = words
    # centers 10/20 for "hello" tokens, 45/60 for " world": DTW boundaries at
    # ~frame 5 (0.1s) and ~frame 32 (0.65s)
    assert abs(w0["start"] - 0.1) < 0.15
    assert w0["end"] <= w1["start"] + 1e-6
    assert abs(w1["start"] - 0.65) < 0.2
    assert all(0 < w["probability"] <= 1 for w in words)


@pytest.mark.slow
def test_engine_word_timestamps_integration():
    """word_timestamps=True must attach a words list to every segment."""
    from tests.test_engine import TinyTokenizer
    import jax.numpy as jnp

    from whisper_aries_tpu.audio.decode import write_wav
    from whisper_aries_tpu.models import whisper as W
    from whisper_aries_tpu.pipeline.engine import AriesTranscriber

    tok = TinyTokenizer()
    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=tok.specials.n_vocab, n_text_ctx=448,
        n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    engine = AriesTranscriber(
        model_size="tiny-test", _params=W.init_params(dims, dtype=jnp.float32),
        _dims=dims, _tokenizer=tok, windows_per_device=1,
    )
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 8) / 16000
    x = (0.3 * np.sin(2 * np.pi * 300 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.wav")
        write_wav(p, x, 16000)
        res = engine.transcribe_file(
            p, language="en", output_formats=(), beam_size=1,
            temperature=(0.0,), max_new_tokens=12, word_timestamps=True,
        )
    assert res["success"]
    for seg in res["segments"]:
        assert "words" in seg
        for w in seg.get("words", []):
            assert set(w) == {"word", "start", "end", "probability"}
            assert w["end"] >= w["start"]


# ---------------------------------------------------------------------------
# Cross-validation vs transformers' DTW/median-filter (SURVEY §7 hard-part 2)
# ---------------------------------------------------------------------------


def test_dtw_matches_transformers():
    """Our dtw_path and transformers' _dynamic_time_warping must pick the
    same token->frame jump times on the same cost matrix."""
    pytest.importorskip("torch")
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
    )

    from whisper_aries_tpu.align.word_align import dtw_path

    rng = np.random.default_rng(5)
    for trial in range(5):
        matrix = rng.standard_normal((12, 60)).astype(np.float32)
        ti, tj = dtw_path(-matrix.astype(np.float64))
        hf_ti, hf_tj = _dynamic_time_warping(-matrix.astype(np.float64))
        jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
        hf_jumps = np.pad(np.diff(hf_ti), (1, 0), constant_values=1).astype(bool)
        np.testing.assert_array_equal(ti[jumps], hf_ti[hf_jumps])
        np.testing.assert_array_equal(tj[jumps], hf_tj[hf_jumps], err_msg=f"trial {trial}")


def test_median_filter_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers.models.whisper.generation_whisper import _median_filter

    from whisper_aries_tpu.align.word_align import _median_filter as ours

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    want = _median_filter(torch.from_numpy(x), 7).numpy()
    np.testing.assert_allclose(ours(x, 7), want, atol=1e-6)


def test_token_times_match_transformers_pipeline():
    """Full alignment math cross-check: identical synthetic attention logits
    through (a) our attention_to_token_times and (b) an openai-whisper-
    equivalent pipeline rebuilt from transformers' primitives."""
    torch = pytest.importorskip("torch")
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
        _median_filter,
    )

    from whisper_aries_tpu.align.word_align import (
        FRAME_S,
        attention_to_token_times,
    )

    rng = np.random.default_rng(7)
    L, H, T_text, T_audio = 4, 2, 10, 80
    n_frames = 70
    cross_qk = (3.0 * rng.standard_normal((L, H, T_text, T_audio))).astype(
        np.float32
    )

    ours = attention_to_token_times(cross_qk, n_frames)

    # independent reimplementation (openai/whisper find_alignment steps)
    w = torch.from_numpy(cross_qk[L // 2 :, :, :, :n_frames]).double()
    w = torch.softmax(w, dim=-1)
    mean = w.mean(dim=-2, keepdim=True)
    std = w.std(dim=-2, keepdim=True, unbiased=False) + 1e-8
    w = (w - mean) / std
    w = _median_filter(w, 7)
    matrix = w.mean(dim=(0, 1)).numpy()
    ti, tj = _dynamic_time_warping(-matrix.astype(np.float64))
    jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
    want = np.zeros(T_text)
    want[ti[jumps]] = tj[jumps] * FRAME_S

    np.testing.assert_allclose(ours, want, atol=1e-9)


def test_alignment_heads_selection():
    """Per-checkpoint (layer, head) pairs select exactly those attention
    maps; result equals the generic path on a head-set that matches it."""
    rng = np.random.default_rng(11)
    L, H, T_text, T_audio = 4, 2, 8, 60
    cqk = (3.0 * rng.standard_normal((L, H, T_text, T_audio))).astype(np.float32)

    from whisper_aries_tpu.align.word_align import attention_to_token_times

    # explicit pairs covering the whole top half == the layer fallback
    pairs = [(l, h) for l in (2, 3) for h in range(H)]
    t_pairs = attention_to_token_times(cqk, 50, alignment_heads=pairs)
    t_fallback = attention_to_token_times(cqk, 50)
    np.testing.assert_allclose(t_pairs, t_fallback, atol=1e-9)
    # a different head subset gives a (generally) different alignment
    t_sub = attention_to_token_times(cqk, 50, alignment_heads=[(0, 0)])
    assert t_sub.shape == t_fallback.shape


def test_load_alignment_heads_from_generation_config(tmp_path):
    import json as _json

    from whisper_aries_tpu.models.loader import load_alignment_heads

    (tmp_path / "generation_config.json").write_text(
        _json.dumps({"alignment_heads": [[3, 1], [5, 0]]})
    )
    assert load_alignment_heads(tmp_path) == [(3, 1), (5, 0)]
    assert load_alignment_heads(None) is None
    assert load_alignment_heads(tmp_path / "missing") is None
