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
