"""Semantics tests for the faster-whisper decode-option whitelist surface
(reference forwards these at final_optimized_transcriber.py:310-319):
suppress_tokens, without_timestamps, max_initial_timestamp,
prompt_reset_on_temperature, multilingual, prepend/append_punctuations —
plus the native DTW kernel and the batched alignment forward pass.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_aries_tpu.decoding.tokenizer import build_special_tokens
from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.pipeline.engine import AriesTranscriber

from tests.test_engine import TinyTokenizer, tiny_engine, speech_wav  # noqa: F401


class NonSpeechTok(TinyTokenizer):
    """TinyTokenizer variant with a non-empty default non-speech set."""

    def non_speech_tokens(self, encoder):
        return [7, 8]


def _tiny_dims(tok):
    return W.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=tok.specials.n_vocab, n_text_ctx=448,
        n_text_state=64, n_text_head=2, n_text_layer=2,
    )


@pytest.fixture(scope="module")
def ns_engine():
    tok = NonSpeechTok()
    dims = _tiny_dims(tok)
    return AriesTranscriber(
        model_size="tiny-test", _params=W.init_params(dims, dtype=jnp.float32),
        _dims=dims, _tokenizer=tok, windows_per_device=1,
    )


# ---------------------------------------------------------------------------
# suppress_tokens
# ---------------------------------------------------------------------------


def test_suppress_mask_minus_one_expands_to_non_speech(ns_engine):
    import whisper_aries_tpu.decoding.generate as G

    mask = np.asarray(ns_engine._make_suppress_mask((-1,)))
    assert mask[7] == G.NEG_INF and mask[8] == G.NEG_INF
    # empty list: no extra ids, but specials stay suppressed
    mask0 = np.asarray(ns_engine._make_suppress_mask(()))
    assert mask0[7] == 0.0 and mask0[8] == 0.0
    sp = ns_engine.tokenizer.specials
    for t in (sp.sot, sp.sot_prev, sp.no_speech, sp.translate, sp.transcribe):
        assert mask0[t] == G.NEG_INF
    # explicit ids suppress those ids
    mask5 = np.asarray(ns_engine._make_suppress_mask((5,)))
    assert mask5[5] == G.NEG_INF and mask5[7] == 0.0


def test_engine_default_mask_comes_from_config(ns_engine):
    """config.decode.suppress_tokens=(-1,) is CONSUMED (the round-2 dead
    knob): the engine's default mask equals _make_suppress_mask(config)."""
    want = np.asarray(
        ns_engine._make_suppress_mask(ns_engine.config.decode.suppress_tokens)
    )
    np.testing.assert_array_equal(np.asarray(ns_engine.suppress_mask), want)


def test_suppressed_ids_never_sampled(ns_engine):
    """Decoder-level determinism: suppress everything except {2, 3}; then
    also suppressing 3 forces token 2 at the first sampled position and 3
    must never appear anywhere."""
    import jax

    import whisper_aries_tpu.decoding.generate as G

    dims = ns_engine.dims
    sp = ns_engine.tokenizer.specials
    ids = ns_engine.ids
    allowed = {2, 3, sp.eot}
    base_suppress = [i for i in range(dims.n_vocab) if i not in allowed]
    rng = np.random.default_rng(2)
    xa = jnp.asarray(rng.standard_normal(
        (1, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    prompt = jnp.asarray([[sp.sot]], jnp.int32)

    def run(extra):
        mask = jnp.asarray(
            G.build_suppress_mask(dims.n_vocab, base_suppress + extra)
        )
        out = G.greedy_decode(
            ns_engine.params, xa, prompt, dims, ids, mask, jnp.int32(0),
            jnp.float32(1.0), jax.random.PRNGKey(7), sample_len=16,
            with_timestamps=False,
        )
        return np.asarray(out["tokens"])[0, 1:]

    toks_a = run([])
    assert set(toks_a) <= {2, 3, sp.eot}
    toks_b = run([3])
    assert toks_b[0] == 2, "only unsuppressed text token must be sampled first"
    assert 3 not in toks_b


def test_engine_threads_suppress_tokens_to_decoder(ns_engine, speech_wav):  # noqa: F811,E501
    import whisper_aries_tpu.decoding.generate as G

    captured = {}
    orig = ns_engine._decode_batch

    def spy(*a, **kw):
        captured["mask"] = np.asarray(kw["opts"].suppress_mask)
        return orig(*a, **kw)

    ns_engine._decode_batch = spy
    try:
        res = ns_engine.transcribe_file(
            speech_wav, language="en", output_formats=(), beam_size=1,
            temperature=(0.0,), max_new_tokens=4, suppress_tokens=[2, 3],
            vad_filter=False, log_prob_threshold=-1e9,
        )
    finally:
        ns_engine._decode_batch = orig
    assert res["success"]
    assert captured["mask"][2] == G.NEG_INF
    assert captured["mask"][3] == G.NEG_INF
    # -1 not in the list: the default non-speech set is NOT suppressed
    assert captured["mask"][7] == 0.0


# ---------------------------------------------------------------------------
# without_timestamps
# ---------------------------------------------------------------------------


def test_without_timestamps_yields_untimed_window_segments(tiny_engine, speech_wav):  # noqa: F811,E501
    sp = tiny_engine.tokenizer.specials
    res = tiny_engine.transcribe_file(
        speech_wav, language="en", output_formats=(), beam_size=1,
        temperature=(0.0,), max_new_tokens=16, without_timestamps=True,
        vad_filter=False, log_prob_threshold=-1e9,
    )
    assert res["success"]
    assert res["segments"], "expected text segments"
    for s in res["segments"]:
        for t in s.get("tokens", []):
            assert t < sp.timestamp_begin
        # one segment spanning its window
        assert s["start"] == pytest.approx(0.0, abs=0.1)
        assert s["end"] == pytest.approx(res["duration"], abs=0.5)


# ---------------------------------------------------------------------------
# max_initial_timestamp
# ---------------------------------------------------------------------------


def test_max_initial_timestamp_zero_forces_window_start(tiny_engine):
    """Grammar-level determinism: with max_initial_timestamp_index=0 the
    first sampled token must be exactly <|0.00|> (the grammar forces a
    timestamp first; the cap pins it to timestamp_begin)."""
    import dataclasses

    import jax

    import whisper_aries_tpu.decoding.generate as G

    dims = tiny_engine.dims
    sp = tiny_engine.tokenizer.specials
    ids0 = dataclasses.replace(tiny_engine.ids, max_initial_timestamp_index=0)
    rng = np.random.default_rng(4)
    xa = jnp.asarray(rng.standard_normal(
        (2, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    prompt = jnp.asarray([[sp.sot]] * 2, jnp.int32)
    out = G.greedy_decode(
        tiny_engine.params, xa, prompt, dims, ids0,
        tiny_engine.suppress_mask, jnp.int32(0),
        jnp.float32(0.0), jax.random.PRNGKey(0), sample_len=8,
        with_timestamps=True,
    )
    first = np.asarray(out["tokens"])[:, 1]
    assert (first == sp.timestamp_begin).all()
    # a loose cap (index 10) still forbids anything above <|0.20|>
    ids10 = dataclasses.replace(tiny_engine.ids, max_initial_timestamp_index=10)
    out10 = G.greedy_decode(
        tiny_engine.params, xa, prompt, dims, ids10,
        tiny_engine.suppress_mask, jnp.int32(0),
        jnp.float32(0.0), jax.random.PRNGKey(0), sample_len=8,
        with_timestamps=True,
    )
    first10 = np.asarray(out10["tokens"])[:, 1]
    assert ((first10 >= sp.timestamp_begin)
            & (first10 <= sp.timestamp_begin + 10)).all()


def test_max_initial_timestamp_index_threaded(tiny_engine, speech_wav):  # noqa: F811,E501
    """The option reaches DecodeSpecialIds (index = seconds / 0.02)."""
    captured = {}
    orig = tiny_engine._decode_batch

    def spy(*a, **kw):
        captured["ids"] = kw["opts"].ids if kw.get("opts") is not None else None
        return orig(*a, **kw)

    tiny_engine._decode_batch = spy
    try:
        tiny_engine.transcribe_file(
            speech_wav, language="en", output_formats=(), beam_size=1,
            temperature=(0.0,), max_new_tokens=4, max_initial_timestamp=0.5,
            vad_filter=False, log_prob_threshold=-1e9,
        )
    finally:
        tiny_engine._decode_batch = orig
    assert captured["ids"].max_initial_timestamp_index == 25


# ---------------------------------------------------------------------------
# prompt_reset_on_temperature (condition_on_previous_text)
# ---------------------------------------------------------------------------


def _sequential_prompts(engine, wav, reset_threshold):
    """Run a forced-fallback sequential transcription; return the list of
    prompt arrays the decoder saw (one per window + fallback calls)."""
    prompts = []
    orig = engine._decode_batch

    def spy(xa, prompt, *a, **kw):
        prompts.append(np.asarray(prompt))
        return orig(xa, prompt, *a, **kw)

    engine._decode_batch = spy
    try:
        res = engine.transcribe_file(
            wav, language="en", output_formats=(), beam_size=1,
            # log_prob_threshold=0 forces needs_fallback on every window
            # (random-weight avg logprobs are negative); ladder ends at 0.4
            temperature=(0.0, 0.4), log_prob_threshold=0.0,
            no_speech_threshold=1.1, max_new_tokens=12,
            condition_on_previous_text=True, vad_filter=False,
            prompt_reset_on_temperature=reset_threshold,
        )
    finally:
        engine._decode_batch = orig
    assert res["success"]
    return prompts, res


@pytest.mark.slow
def test_prompt_reset_on_temperature(tiny_engine, speech_wav):  # noqa: F811
    sp = tiny_engine.tokenizer.specials
    # threshold above the used temperature (0.4): conditioning is KEPT
    keep_prompts, keep_res = _sequential_prompts(tiny_engine, speech_wav, 0.5)
    # threshold below: conditioning RESETS after the fallback
    reset_prompts, _ = _sequential_prompts(tiny_engine, speech_wav, 0.3)

    def has_prev(prompt):
        return bool((prompt == sp.sot_prev).any())

    # window 1 never has previous context in either mode
    assert not has_prev(keep_prompts[0])
    later_keep = any(has_prev(p) for p in keep_prompts[1:])
    later_reset = any(has_prev(p) for p in reset_prompts[1:])
    produced_text = any(
        s.get("tokens") for s in keep_res["segments"]
    )
    if produced_text:
        assert later_keep, "temperature<=threshold must keep conditioning"
    assert not later_reset, "temperature>threshold must reset conditioning"


# ---------------------------------------------------------------------------
# multilingual
# ---------------------------------------------------------------------------


def test_multilingual_retokens_prompt_rows(tiny_engine, speech_wav):  # noqa: F811,E501
    """multilingual=True: the decoder sees per-ROW detected language tokens
    in the prompt, and any produced segments carry their window language."""
    from whisper_aries_tpu.decoding.tokenizer import LANGUAGES

    sp = tiny_engine.tokenizer.specials
    lang0 = min(sp.language_tokens.values())
    prompts = []
    orig = tiny_engine._decode_batch

    def spy(xa, prompt, *a, **kw):
        prompts.append(np.asarray(prompt))
        return orig(xa, prompt, *a, **kw)

    tiny_engine._decode_batch = spy
    try:
        res = tiny_engine.transcribe_file(
            speech_wav, language="en", output_formats=(), beam_size=1,
            temperature=(0.0,), max_new_tokens=8, multilingual=True,
            vad_filter=False, log_prob_threshold=-1e9,
        )
    finally:
        tiny_engine._decode_batch = orig
    assert res["success"]
    assert prompts, "decoder was never called"
    n_lang = sp.num_languages
    for p in prompts:
        # sot at column 0, a (detected) language token at column 1
        assert (p[:, 0] == sp.sot).all()
        assert ((p[:, 1] >= lang0) & (p[:, 1] < lang0 + n_lang)).all()
    for s in res["segments"]:
        assert s.get("language") in LANGUAGES[:n_lang]


def test_window_languages_probe_shapes(tiny_engine):
    xa = jnp.zeros((3, tiny_engine.dims.n_audio_ctx,
                    tiny_engine.dims.n_text_state), jnp.float32)
    toks, codes = tiny_engine._window_languages(xa)
    assert toks.shape == (3,) and len(codes) == 3
    sp = tiny_engine.tokenizer.specials
    lang0 = min(sp.language_tokens.values())
    assert all(lang0 <= t < lang0 + sp.num_languages for t in toks)


# ---------------------------------------------------------------------------
# punctuation merging
# ---------------------------------------------------------------------------


def test_merge_punctuations_openai_semantics():
    from whisper_aries_tpu.align.word_align import merge_punctuations

    def w(word, start, end):
        return {"word": word, "start": start, "end": end, "probability": 1.0}

    words = [w(" ¿", 0.0, 0.1), w("Hola", 0.1, 0.5), w("?", 0.5, 0.55),
             w(" world", 0.6, 1.0), w(".", 1.0, 1.05)]
    groups = [[0], [1, 2], [3], [4, 5], [6]]
    merged, mgroups = merge_punctuations(words, groups)
    assert [x["word"] for x in merged] == [" ¿Hola?", " world."]
    # token positions concatenate through both merges
    assert mgroups == [[0, 1, 2, 3], [4, 5, 6]]
    # surviving words keep their own timing (openai semantics)
    assert merged[0]["start"] == 0.1 and merged[1]["start"] == 0.6


def test_find_word_alignments_with_punctuation_fixture():
    """'Hello, world.'-style token stream: punctuation attaches to words."""
    from whisper_aries_tpu.align.word_align import find_word_alignments

    class PunctTok:
        PIECES = {0: "Hello", 1: ",", 2: " world", 3: "."}

        def __init__(self):
            self.specials = build_special_tokens(10, 2)

        def decode(self, ids, skip_special=True):
            return "".join(self.PIECES.get(int(i), "") for i in ids
                           if int(i) < 10)

    tok = PunctTok()
    sp = tok.specials
    tokens = [sp.seconds_to_timestamp(0.0), 0, 1, 2, 3,
              sp.seconds_to_timestamp(2.0)]
    L, H, A = 2, 2, 120
    qk = np.zeros((L, H, len(tokens), A))
    for i, c in enumerate([0, 10, 30, 60, 80, 100]):
        qk[:, :, i, :] = -((np.arange(A) - c) ** 2) / 30.0
    words, groups = find_word_alignments(
        tokens, qk, tok, n_frames=A,
        prepend_punctuations="\"'“¿([{-",
        append_punctuations="\"'.。,，!！?？:：”)]}、",
        return_groups=True,
    )
    assert [x["word"] for x in words] == ["Hello,", " world."]
    # groups carry flat-token positions covering text tokens 1..4
    assert groups == [[1, 2], [3, 4]]


# ---------------------------------------------------------------------------
# native DTW parity
# ---------------------------------------------------------------------------


def test_native_dtw_matches_python():
    from whisper_aries_tpu.align.word_align import _dtw_native, _dtw_path_py

    rng = np.random.default_rng(9)
    for shape in [(1, 1), (5, 5), (12, 60), (37, 211), (224, 400)]:
        cost = rng.standard_normal(shape).astype(np.float64)
        native = _dtw_native(cost)
        if native is None:
            pytest.skip("native library not built")
        ti, tj = native
        pti, ptj = _dtw_path_py(cost)
        np.testing.assert_array_equal(ti, pti)
        np.testing.assert_array_equal(tj, ptj)


# ---------------------------------------------------------------------------
# batched alignment forward parity
# ---------------------------------------------------------------------------


def test_alignment_forward_matches_decoder_forward():
    tok = TinyTokenizer()
    dims = _tiny_dims(tok)
    params = W.init_params(dims, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B, S = 2, 8
    xa = jnp.asarray(rng.standard_normal(
        (B, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 10, size=(B, S)).astype(np.int32))

    logits, cqk = W.decoder_forward(params, toks, xa, dims,
                                    return_cross_qk=True)
    cqk = np.asarray(cqk)  # (L, B, H, S, Ta)

    from whisper_aries_tpu.align.word_align import _alignment_head_onehot

    pairs = [(0, 1), (1, 0)]
    sel, n_sel = _alignment_head_onehot(dims, pairs)
    sel_qk, token_probs = W.alignment_forward(
        params, toks, xa, jnp.asarray(sel), dims
    )
    sel_qk = np.asarray(sel_qk)
    assert sel_qk.shape == (n_sel, B, S, dims.n_audio_ctx)
    for i, (l, h) in enumerate(pairs):
        np.testing.assert_allclose(sel_qk[i], cqk[l, :, h], atol=2e-4)

    # token_probs = p(tok_i | tok_<i), position 0 fixed to 1
    lp = np.asarray(logits)
    sm = np.exp(lp - lp.max(axis=-1, keepdims=True))
    sm = sm / sm.sum(axis=-1, keepdims=True)
    want = np.ones((B, S))
    for b in range(B):
        for i in range(1, S):
            want[b, i] = sm[b, i - 1, int(toks[b, i])]
    np.testing.assert_allclose(np.asarray(token_probs), want, atol=1e-5)


def test_alignment_head_onehot_fallback_is_top_half():
    tok = TinyTokenizer()
    dims = _tiny_dims(tok)
    sel, n_sel = __import__(
        "whisper_aries_tpu.align.word_align", fromlist=["_alignment_head_onehot"]
    )._alignment_head_onehot(dims, None)
    # 2 text layers -> top half is layer 1, all heads
    assert n_sel == dims.n_text_head
    assert sel[1].sum() == n_sel and sel[0].sum() == 0
