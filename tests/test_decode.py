"""Decode-loop tests: filter grammar, greedy/beam parity vs HF generate on a
tiny random model, sampling behaviour, and segment parsing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.decoding.segments_parse import (
    compression_ratio,
    parse_window_tokens,
    window_quality,
)
from whisper_aries_tpu.models import whisper as W


# ---------------------------------------------------------------------------
# Filter grammar unit tests (synthetic small vocab)
# ---------------------------------------------------------------------------

# layout: text tokens 0..9, eot=10, specials 11..19, timestamps 20..39
TIDS = G.DecodeSpecialIds(
    eot=10, sot=11, no_speech=12, no_timestamps=13, timestamp_begin=20,
    blank=5, n_vocab=40, max_initial_timestamp_index=10,
)


def _filter(logits, is_first=False, last=-1, penult=-1, max_ts=-1):
    out = G._apply_filters(
        jnp.asarray(logits, jnp.float32)[None],
        TIDS,
        jnp.zeros((40,), jnp.float32),
        jnp.asarray(is_first),
        jnp.asarray([last], jnp.int32),
        jnp.asarray([penult], jnp.int32),
        jnp.asarray([max_ts], jnp.int32),
        True,
    )
    return np.asarray(out)[0]


def test_filter_first_position_forces_timestamp():
    logits = np.zeros(40, np.float32)
    f = _filter(logits, is_first=True)
    assert np.all(f[:20] == G.NEG_INF)  # text + eot + specials suppressed
    assert np.all(f[20:31] > G.NEG_INF / 2)  # timestamps up to init cap live
    assert np.all(f[31:] == G.NEG_INF)  # beyond max_initial_timestamp


def test_filter_after_single_timestamp_requires_ts_or_eot():
    logits = np.zeros(40, np.float32)
    logits[10] = 6.0  # keep eot attractive so the timestamp-mass rule
    # (which also suppresses eot, matching openai/whisper) stays dormant
    f = _filter(logits, last=22, penult=3, max_ts=22)
    assert np.all(f[:10] == G.NEG_INF)  # text suppressed
    assert f[10] > G.NEG_INF / 2  # eot allowed
    assert np.all(f[20:22] == G.NEG_INF)  # non-decreasing: < last forbidden
    assert f[22] > G.NEG_INF / 2  # same timestamp allowed (closing pair)


def test_filter_after_timestamp_pair_requires_text():
    logits = np.zeros(40, np.float32)
    logits[:10] = 1.0  # make text attractive so force-ts rule doesn't kick in
    f = _filter(logits, last=24, penult=22, max_ts=24)
    assert np.all(f[20:] == G.NEG_INF)  # timestamps suppressed
    assert np.all(f[:10] > G.NEG_INF / 2)  # text allowed


def test_filter_monotonic_floor_after_pair():
    logits = np.zeros(40, np.float32)
    logits[:10] = 5.0
    f = _filter(logits, last=3, penult=24, max_ts=24)  # inside text run
    # next timestamp must be > max_ts (nonzero-length segments)
    assert np.all(f[20:25] == G.NEG_INF)
    assert f[25] > G.NEG_INF / 2


def test_filter_timestamp_mass_forces_timestamp():
    logits = np.zeros(40, np.float32)
    logits[20:] = 2.0  # big mass on timestamps
    logits[3] = 2.5  # best text token, but logsumexp(ts) >> it
    f = _filter(logits, last=1, penult=2)
    assert f[3] == G.NEG_INF


def test_filter_blank_suppression_flag():
    logits = np.zeros(40, np.float32)
    f = G._apply_filters(
        jnp.asarray(logits)[None], TIDS, jnp.zeros((40,)),
        jnp.asarray(True), jnp.asarray([-1]), jnp.asarray([-1]),
        jnp.asarray([-1]), False, True,
    )
    f = np.asarray(f)[0]
    assert f[TIDS.blank] == G.NEG_INF and f[TIDS.eot] == G.NEG_INF
    assert np.all(f[TIDS.timestamp_begin:] == G.NEG_INF)  # no timestamps mode


# ---------------------------------------------------------------------------
# Greedy / beam parity vs HuggingFace on a tiny random model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=60, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(7)
    model = WhisperForConditionalGeneration(cfg).eval()
    dims = W.dims_from_hf_config(cfg)
    params = W.convert_hf_state_dict(model.state_dict(), dims)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 80, 120)).astype(np.float32)
    return model, dims, params, mel


# ids for the tiny model: no timestamps exist (>=vocab), eot = eos = 2
def _tiny_ids(dims):
    return G.DecodeSpecialIds(
        eot=2, sot=3, no_speech=0, no_timestamps=dims.n_vocab + 1,
        timestamp_begin=dims.n_vocab + 2, blank=-1, n_vocab=dims.n_vocab,
    )


def test_greedy_matches_hf_generate(tiny_pair):
    import torch

    model, dims, params, mel = tiny_pair
    n_new = 10
    with torch.no_grad():
        want = model.generate(
            input_features=torch.from_numpy(mel), max_new_tokens=n_new,
            num_beams=1, do_sample=False,
        ).numpy()
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    out = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        jnp.float32(0.0), jax.random.PRNGKey(0), sample_len=n_new,
        with_timestamps=False, suppress_blank=False,
    )
    got = np.asarray(out["tokens"])
    for b in range(2):
        w = want[b].tolist()
        g = got[b].tolist()
        # transformers may or may not include the decoder-start token in the
        # returned sequence; strip it from both, then compare up to and
        # including the first eot.
        if w and w[0] == 3:
            w = w[1:]
        g = g[1:]
        w_body = w[: (w.index(2) + 1 if 2 in w else len(w))]
        g_body = g[: (g.index(2) + 1 if 2 in g else len(g))]
        assert g_body == w_body, (b, g, w)


def test_beam_matches_hf_generate(tiny_pair):
    import torch

    model, dims, params, mel = tiny_pair
    n_new = 8
    with torch.no_grad():
        want = model.generate(
            input_features=torch.from_numpy(mel), max_new_tokens=n_new,
            num_beams=4, do_sample=False, length_penalty=0.0,
            early_stopping=True,
        ).numpy()
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    out = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_size=4, sample_len=n_new, with_timestamps=False,
        length_penalty=0.0, suppress_blank=False,
    )
    got = np.asarray(out["tokens"])
    for b in range(2):
        w = want[b].tolist()
        g = got[b].tolist()
        if w and w[0] == 3:
            w = w[1:]
        g = g[1:]
        w_body = w[: (w.index(2) + 1 if 2 in w else len(w))]
        g_body = g[: (g.index(2) + 1 if 2 in g else len(g))]
        assert g_body == w_body, (b, g, w)


def test_beam_score_at_least_greedy(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    kwargs = dict(
        sample_len=8, with_timestamps=False, suppress_blank=False,
    )
    g = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), **kwargs,
    )
    b = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), beam_size=4,
        length_penalty=0.0, **kwargs,
    )
    assert np.all(np.asarray(b["sum_logprob"]) >= np.asarray(g["sum_logprob"]) - 1e-3)


def test_sampled_decode_respects_suppress_mask(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    suppress = G.build_suppress_mask(dims.n_vocab, [5, 6, 7])
    out = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.asarray(suppress), jnp.int32(0), jnp.float32(0.8),
        jax.random.PRNGKey(42), sample_len=12, with_timestamps=False,
        suppress_blank=False,
    )
    toks = np.asarray(out["tokens"])[:, 1:]
    assert not np.isin(toks, [5, 6, 7]).any()


# ---------------------------------------------------------------------------
# Segment parsing
# ---------------------------------------------------------------------------


class FakeTokenizer:
    """Minimal tokenizer: ids < 10 are text chars 'a'+id."""

    def __init__(self):
        from whisper_aries_tpu.decoding.tokenizer import build_special_tokens

        self.specials = build_special_tokens(10, 2)

    def decode(self, ids, skip_special=True):
        return "".join(chr(ord("a") + i) for i in ids if i < 10)


def test_parse_window_tokens_pairs():
    tok = FakeTokenizer()
    sp = tok.specials
    t = sp.seconds_to_timestamp
    ids = [sp.sot, t(0.0), 0, 1, t(2.0), t(2.0), 2, 3, t(5.0), sp.eot, sp.eot]
    segs = parse_window_tokens(ids, tok, window_start=100.0,
                               window_duration=30.0, prompt_len=1)
    assert len(segs) == 2
    assert segs[0] == {"start": 100.0, "end": 102.0, "text": "ab", "tokens": [0, 1]}
    assert segs[1]["start"] == 102.0 and segs[1]["end"] == 105.0
    assert segs[1]["text"] == "cd"


def test_parse_window_tokens_unclosed_final():
    tok = FakeTokenizer()
    sp = tok.specials
    t = sp.seconds_to_timestamp
    ids = [t(1.0), 0, 1, 2]  # no closing timestamp
    segs = parse_window_tokens(ids, tok, window_start=0.0, window_duration=20.0)
    assert len(segs) == 1
    assert segs[0]["start"] == 1.0 and segs[0]["end"] == 20.0


def test_parse_window_tokens_no_timestamps_at_all():
    tok = FakeTokenizer()
    ids = [0, 1, 2]
    segs = parse_window_tokens(ids, tok, window_start=10.0, window_duration=5.0)
    assert len(segs) == 1
    assert segs[0]["start"] == 10.0 and segs[0]["end"] == 15.0


def test_parse_window_clips_to_window():
    tok = FakeTokenizer()
    sp = tok.specials
    t = sp.seconds_to_timestamp
    ids = [t(1.0), 0, t(29.5)]
    segs = parse_window_tokens(ids, tok, window_start=0.0, window_duration=12.0)
    assert segs[0]["end"] == 12.0


def test_compression_ratio_flags_loops():
    looped = "the same thing " * 50
    normal = "The stale smell of old beer lingers."
    assert compression_ratio(looped) > 2.4
    assert compression_ratio(normal) < 2.4
    q = window_quality(looped, avg_logprob=-0.2, no_speech_prob=0.1)
    assert q["needs_fallback"]
    q2 = window_quality(normal, avg_logprob=-0.2, no_speech_prob=0.1)
    assert not q2["needs_fallback"] and not q2["is_silence"]
    q3 = window_quality("", avg_logprob=-1.5, no_speech_prob=0.9)
    assert q3["is_silence"]


def test_window_quality_none_thresholds_disable_gates():
    """faster-whisper option contract: a None threshold disables that
    gate (must not raise on float-vs-None comparison)."""
    looped = "the same thing " * 50
    q = window_quality(looped, avg_logprob=-9.0, no_speech_prob=0.99,
                       log_prob_threshold=None,
                       compression_ratio_threshold=None,
                       no_speech_threshold=None)
    assert not q["needs_fallback"] and not q["is_silence"]
    # no_speech gate alone (lp gate off): silence decided purely by prob
    q2 = window_quality("", avg_logprob=5.0, no_speech_prob=0.9,
                        log_prob_threshold=None,
                        no_speech_threshold=0.6)
    assert q2["is_silence"]
    # lp rescue still applies when both set
    q3 = window_quality("", avg_logprob=-0.1, no_speech_prob=0.9,
                        log_prob_threshold=-1.0, no_speech_threshold=0.6)
    assert not q3["is_silence"]


def test_repetition_penalty_filter_math():
    logits = np.array([[2.0, -1.0, 0.5, 3.0]], np.float32)
    present = np.array([[True, True, False, False]])
    out = np.asarray(G.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(present), jnp.float32(2.0)
    ))
    # positive logits divided, negative multiplied, absent untouched
    np.testing.assert_allclose(out[0], [1.0, -2.0, 0.5, 3.0])


def test_repetition_penalty_discourages_repeats(tiny_pair):
    """With a huge penalty the greedy decode must not emit the same text
    token twice (until forced to eot/other)."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    base = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=10, with_timestamps=False,
        suppress_blank=False,
    )
    pen = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=10, with_timestamps=False,
        suppress_blank=False, repetition_penalty=jnp.float32(1e6),
    )
    for b in range(2):
        toks = [t for t in np.asarray(pen["tokens"])[b, 1:].tolist()
                if t != ids.eot]
        assert len(toks) == len(set(toks)), toks
    # the unpenalized random model does repeat (sanity that the test bites)
    toks0 = [t for t in np.asarray(base["tokens"])[0, 1:].tolist()
             if t != ids.eot]
    assert len(toks0) != len(set(toks0))


# ---------------------------------------------------------------------------
# n-gram blocking, beam repetition penalty, patience (round-2 parity knobs)
# ---------------------------------------------------------------------------


def test_ngram_banned_mask_unit():
    # buffer: [7, 1, 2, 9, 1, 2, <pos>, eot-fill...]; last 2 tokens are (1, 2)
    toks = jnp.asarray([[7, 1, 2, 9, 1, 2, 0, 0]], jnp.int32)
    banned = np.asarray(G.ngram_banned_mask(toks, jnp.int32(6), 3, 12))[0]
    # trigrams seen: (7,1,2),(1,2,9),(2,9,1),(9,1,2); ctx (1,2) -> ban 9
    assert banned[9]
    assert banned.sum() == 1
    # n=2: ctx (2,) -> bigrams (1,2),(2,9),(9,1) -> ban 9; also (2,... ) wait
    banned2 = np.asarray(G.ngram_banned_mask(toks, jnp.int32(6), 2, 12))[0]
    assert banned2[9] and not banned2[3]


def test_ngram_banned_mask_ignores_future_fill():
    toks = jnp.asarray([[1, 2, 3, 2, 2, 2, 2, 2]], jnp.int32)
    # pos=3: only tokens [1,2,3] exist; ctx for n=2 is (3,); no (3,x) seen
    banned = np.asarray(G.ngram_banned_mask(toks, jnp.int32(3), 2, 12))[0]
    assert not banned.any()


def test_greedy_no_repeat_ngram(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    out = G.greedy_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=14, with_timestamps=False,
        suppress_blank=False, no_repeat_ngram_size=2,
    )
    for b in range(2):
        toks = [t for t in np.asarray(out["tokens"])[b].tolist()
                if t != ids.eot]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


def test_beam_repetition_penalty_discourages_repeats(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    out = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), beam_size=3,
        sample_len=10, with_timestamps=False, suppress_blank=False,
        repetition_penalty=jnp.float32(1e6),
    )
    for b in range(2):
        toks = [t for t in np.asarray(out["tokens"])[b, 1:].tolist()
                if t != ids.eot]
        assert len(toks) == len(set(toks)), toks


def test_beam_no_repeat_ngram(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    out = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), beam_size=3,
        sample_len=14, with_timestamps=False, suppress_blank=False,
        no_repeat_ngram_size=2,
    )
    for b in range(2):
        toks = [t for t in np.asarray(out["tokens"])[b].tolist()
                if t != ids.eot]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


def test_beam_patience_explores_superset(tiny_pair):
    """With length_penalty=0 the best finished score under patience p2 > p1
    must be >= (candidate superset; Kasai et al. semantics)."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    common = dict(
        beam_size=3, sample_len=10, with_timestamps=False,
        suppress_blank=False, length_penalty=0.0,
    )
    p1 = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), patience=1.0, **common,
    )
    p2 = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 3, jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(0), patience=2.0, **common,
    )
    assert np.all(np.asarray(p2["sum_logprob"])
                  >= np.asarray(p1["sum_logprob"]) - 1e-3)
    # patience=2 keeps a larger candidate buffer
    assert p2["all_tokens"].shape[1] > p1["all_tokens"].shape[1]


def test_no_speech_prob_measured_at_sot_index(tiny_pair):
    """With a <|startofprev|>-style prefix before sot, no_speech_prob must be
    the softmax at the sot position, not position 0 (ADVICE round-1 fix)."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    prompt = jnp.asarray([[5, 4, 3], [6, 7, 3]], jnp.int32)  # sot at idx 2
    out = G.greedy_decode(
        params, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(2), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=4, with_timestamps=False,
        suppress_blank=False,
    )
    logits = W.decoder_forward(params, prompt, xa, dims)  # (B, 3, V)
    want = np.asarray(jax.nn.softmax(logits[:, 2], axis=-1))[:, ids.no_speech]
    np.testing.assert_allclose(
        np.asarray(out["no_speech_prob"]), want, rtol=1e-4, atol=1e-5
    )


def test_left_padded_prompt_exact_parity(tiny_pair):
    """A left-padded prompt with prompt_start must decode bit-identically to
    the unpadded prompt (mask + shifted positional embeddings)."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    base = G.greedy_decode(
        params, xa, jnp.asarray([[5, 3], [7, 3]], jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(1), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=8, with_timestamps=False,
        suppress_blank=False,
    )
    padded = G.greedy_decode(
        params, xa,
        jnp.asarray([[-1, -1, -1, 5, 3], [-1, -1, -1, 7, 3]], jnp.int32),
        dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(4), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=8, with_timestamps=False,
        suppress_blank=False, prompt_start=jnp.int32(3),
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"])[:, 2:], np.asarray(padded["tokens"])[:, 5:]
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(padded["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(base["no_speech_prob"]),
        np.asarray(padded["no_speech_prob"]), rtol=1e-4, atol=1e-5,
    )


def test_left_padded_prompt_beam_parity(tiny_pair):
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=3, sample_len=8, with_timestamps=False,
                  suppress_blank=False)
    base = G.beam_search_decode(
        params, xa, jnp.asarray([[5, 3], [7, 3]], jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(1), **common,
    )
    padded = G.beam_search_decode(
        params, xa,
        jnp.asarray([[-1, -1, 5, 3], [-1, -1, 7, 3]], jnp.int32), dims, ids,
        jnp.zeros((dims.n_vocab,)), jnp.int32(3),
        prompt_start=jnp.int32(2), **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"])[:, 2:], np.asarray(padded["tokens"])[:, 4:]
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(padded["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )


def test_beam_cache_permute_matches_gather():
    """The beam reorder's one-hot permutation matmul must reproduce
    jnp.take exactly for every cache dtype (bf16/f32 values, int8+f32
    scales) — int8 magnitudes <=127 are exact in bf16, f32 buffers
    permute in f32 with f32 accumulation."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, K = 3, 5
    src = jnp.asarray(rng.integers(0, B * K, (B * K,)).astype(np.int32))
    perm = jax.nn.one_hot(src, B * K, dtype=jnp.bfloat16)

    def permute_rows(x, p):
        if jnp.issubdtype(x.dtype, jnp.integer):
            y = jnp.einsum("oi,li...->lo...", p, x.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return jnp.round(y).astype(x.dtype)
        y = jnp.einsum("oi,li...->lo...", p.astype(x.dtype), x,
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    for arr in (
        jnp.asarray(rng.integers(-127, 128, (4, B * K, 2, 8, 6)).astype(np.int8)),
        jnp.asarray(rng.standard_normal((4, B * K, 2, 1, 6)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((4, B * K, 2, 8, 6))).astype(jnp.bfloat16),
    ):
        want = jnp.take(arr, src, axis=1)
        got = permute_rows(arr, perm)
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_beam_reorder_matches_gather():
    """The Pallas DMA row-permute (ops/pallas_beam_reorder.py) must equal
    jnp.take over the equivalent flat row map for every cache dtype
    (bf16/f32 values, int8 + f32 scales). Interpret mode on CPU; the same
    kernel compiles on TPU where it replaces the one-hot matmul."""
    import jax.numpy as jnp

    from whisper_aries_tpu.ops.pallas_beam_reorder import permute_cache_rows

    rng = np.random.default_rng(1)
    B, K = 3, 5
    src = rng.integers(0, K, (B, K)).astype(np.int32)
    flat_src = (np.arange(B)[:, None] * K + src).reshape(-1)

    cache = {
        "k8": jnp.asarray(
            rng.integers(-127, 128, (4, B * K, 2, 8, 16)).astype(np.int8)),
        "ks": jnp.asarray(
            rng.standard_normal((4, B * K, 2, 1, 16)).astype(np.float32)),
        "v": jnp.asarray(
            rng.standard_normal((4, B * K, 2, 8, 16))).astype(jnp.bfloat16),
    }
    got = permute_cache_rows(cache, jnp.asarray(src), interpret=True)
    for key, arr in cache.items():
        want = jnp.take(arr, jnp.asarray(flat_src), axis=1)
        assert got[key].dtype == arr.dtype
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want))


def test_top_k_unrolled_matches_lax_top_k():
    """_top_k_unrolled (k argmax passes) must match lax.top_k exactly,
    including NEG_INF-padded rows and tie handling (lower index first)."""
    import jax
    import jax.numpy as jnp

    from whisper_aries_tpu.decoding.generate import NEG_INF, _top_k_unrolled

    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 997)).astype(np.float32)
    x[0, :] = NEG_INF                      # fully dead row
    x[1, 100:] = NEG_INF                   # partially dead row
    x[2, 10] = x[2, 20] = x[2, 30] = 7.5   # exact ties
    xj = jnp.asarray(x)
    want_v, want_i = jax.lax.top_k(xj, 5)
    got_v, got_i = _top_k_unrolled(xj, 5)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.slow
def test_beam_ancestry_reorder_parity(tiny_pair, self_kv_int8):
    """beam_reorder="ancestry" (append-only cache + lazy ancestry-masked
    attention, decoder_step's beam_anc) must reproduce the permute-mode
    decode: same tokens and scores for both cache layouts, including a
    left-padded prompt (valid_start interaction with the ancestry mask)."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=4, sample_len=8, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False,
                  self_kv_int8=self_kv_int8)
    # sot_index must point at a REAL position: logits at left-padding
    # positions are all-masked-softmax garbage whose value legitimately
    # depends on the attention width (Tmax readback vs local-slab S)
    for prompt, start, sot_i in (
        (jnp.full((2, 1), 3, jnp.int32), jnp.int32(0), jnp.int32(0)),
        (jnp.asarray([[-1, -1, 5, 3], [-1, -1, 7, 3]], jnp.int32),
         jnp.int32(2), jnp.int32(3)),
    ):
        base = G.beam_search_decode(
            params, xa, prompt, dims, ids,
            jnp.zeros((dims.n_vocab,), jnp.float32), sot_i,
            prompt_start=start, beam_reorder="xla", **common,
        )
        anc = G.beam_search_decode(
            params, xa, prompt, dims, ids,
            jnp.zeros((dims.n_vocab,), jnp.float32), sot_i,
            prompt_start=start, beam_reorder="ancestry", **common,
        )
        np.testing.assert_array_equal(
            np.asarray(base["tokens"]), np.asarray(anc["tokens"])
        )
        np.testing.assert_allclose(
            np.asarray(base["sum_logprob"]),
            np.asarray(anc["sum_logprob"]), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(base["no_speech_prob"]),
            np.asarray(anc["no_speech_prob"]), rtol=1e-5, atol=1e-6,
        )


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.slow
def test_beam_mega_kernel_parity(tiny_pair, self_kv_int8):
    """beam_reorder="mega" (all-layers Pallas megakernel decode step,
    interpret mode off-TPU) must reproduce the XLA decode with the SAME
    int8 weights: identical tokens, scores within f32 tolerance. The
    mega path IS the int8 compute path (weights quantised with the
    ops/quant.py grid inside pack_layer_weights), so the XLA baseline
    here runs the quantized tree through quant_matmul (outscale) — the
    kernel's GEMM mirrors that math term for term. Covers the kernel's
    whole-tensor int8 GEMMs, bucketed packed-cache ancestry
    self-attention, whole-window packed int8 cross-attention, and MLP
    across multiple beam steps. With ``self_kv_int8`` both sides ALSO
    quantize the beam self-cache (the kernel in-kernel on append, the
    XLA baseline quantize-on-write with the same absmax-over-dh grid),
    exercising KV_CACHE int8 end-to-end."""
    from whisper_aries_tpu.ops.quant import quantize_model_params

    _, dims, params, mel = tiny_pair
    qparams = quantize_model_params(params)
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=4, sample_len=6, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False, kv_int8=True,
                  self_kv_int8=self_kv_int8)
    prompt = jnp.full((2, 1), 3, jnp.int32)
    base = G.beam_search_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="xla", **common,
    )
    mega = G.beam_search_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="mega", beam_group=1, **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(mega["tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(mega["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.slow
def test_greedy_mega_grouped_parity(tiny_pair, self_kv_int8):
    """Grouped-windows greedy megakernel (mega_group=4, interpret mode
    off-TPU) must reproduce the XLA greedy decode with the SAME int8
    weights: identical tokens, scores within f32 tolerance. Covers the
    block-diagonal grouped cross mask (W.group_cross_mega), the grouped
    prefill relayout (W.pack_greedy_prefill_cache) and the identity
    -ancestry kernel step, both bf16 and in-kernel-int8 self-cache."""
    from whisper_aries_tpu.ops.quant import quantize_model_params

    _, dims, params, mel = tiny_pair
    qparams = quantize_model_params(params)
    mel8 = np.tile(np.asarray(mel), (4, 1, 1))     # 8 windows, 2 groups
    xa = W.encode(params, jnp.asarray(mel8), dims)
    ids = _tiny_ids(dims)
    common = dict(sample_len=6, with_timestamps=False,
                  suppress_blank=False, kv_int8=True,
                  self_kv_int8=self_kv_int8)
    prompt = jnp.full((8, 1), 3, jnp.int32)
    base = G.greedy_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        jnp.float32(0.0), jax.random.PRNGKey(0), **common,
    )
    mega = G.greedy_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        jnp.float32(0.0), jax.random.PRNGKey(0), mega_group=4, **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(mega["tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(mega["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(base["no_speech_prob"]),
        np.asarray(mega["no_speech_prob"]), rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.slow
def test_beam_mega_grouped_parity(tiny_pair, self_kv_int8):
    """GROUPED-BEAM megakernel (beam_group=2: two windows' beams share
    one kernel window's rows, interpret mode off-TPU) must reproduce the
    XLA beam decode with the same int8 weights token for token. Covers
    the grouped prefill regroup, the slot-offset ancestry mapping, and
    the rows_per_block block-diagonal cross mask."""
    from whisper_aries_tpu.ops.quant import quantize_model_params

    _, dims, params, mel = tiny_pair
    qparams = quantize_model_params(params)
    mel4 = np.tile(np.asarray(mel), (2, 1, 1))
    xa = W.encode(params, jnp.asarray(mel4), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=4, sample_len=6, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False, kv_int8=True,
                  self_kv_int8=self_kv_int8)
    prompt = jnp.full((4, 1), 3, jnp.int32)
    base = G.beam_search_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="xla", **common,
    )
    grouped = G.beam_search_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="mega", beam_group=2, **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(grouped["tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(grouped["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.parametrize("S,Kg", [(3, 2), (4, 2), (2, 4)])
@pytest.mark.slow
def test_multi_token_verify_step_parity(tiny_pair, self_kv_int8, S, Kg):
    """S-token verify megakernel step (speculative decode,
    decoder_step_fused_multi, interpret mode off-TPU) must reproduce the
    XLA S-token decoder_step with the same int8 weights: near-identical
    logits at every drafted position across TWO consecutive multi-steps
    (the second step reads cache lanes the first appended)."""
    from whisper_aries_tpu.ops.pallas_decode_layers import (
        pack_layer_weights,
    )
    from whisper_aries_tpu.ops.quant import quantize_model_params

    _, dims, params, mel = tiny_pair
    qparams = W.fuse_decoder_qkv(quantize_model_params(params))
    B = 4
    mel4 = np.tile(np.asarray(mel), (2, 1, 1))
    xa = W.encode(params, jnp.asarray(mel4), dims)
    P = 2
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(3, 50, (B, P)), jnp.int32)
    drafts = jnp.asarray(rng.integers(3, 50, (B, 2 * S)), jnp.int32)
    L = P + 2 * S + 2

    # ---- XLA baseline: plain cache, S-token steps --------------------
    cross_q = W.precompute_cross_kv_int8(qparams, xa, dims)
    cache_x = W.init_kv_cache(dims, B, dtype=xa.dtype, max_len=L,
                              int8=self_kv_int8)
    _, cache_x = W.decoder_step(qparams, prompt, jnp.int32(0), cache_x,
                                cross_q, dims)
    lx1, cache_x = W.decoder_step(qparams, drafts[:, :S], jnp.int32(P),
                                  cache_x, cross_q, dims)
    lx2, cache_x = W.decoder_step(qparams, drafts[:, S:], jnp.int32(P + S),
                                  cache_x, cross_q, dims)

    # ---- mega multi-token step over the grouped packed cache ---------
    cross_mega = W.precompute_cross_kv_int8_packed(qparams, xa, dims)
    cross_g = W.group_cross_mega(cross_mega, Kg)
    cache_m = W.init_kv_cache(dims, B, dtype=xa.dtype, max_len=P)
    _, cache_m = W.decoder_step(qparams, prompt, jnp.int32(0), cache_m,
                                W.cross_views_from_packed(
                                    cross_mega, dims.n_text_head,
                                    xa.shape[1]),
                                dims)
    packed = W.pack_greedy_prefill_cache(cache_m, Kg, max_len=L,
                                         int8=self_kv_int8,
                                         n_head=dims.n_text_head)
    wpack = pack_layer_weights(qparams["decoder"]["blocks"])
    lm1, packed = W.decoder_step_fused_multi(
        qparams, wpack, drafts[:, :S], jnp.int32(P), packed, cross_g,
        dims, group=Kg, interpret=True)
    lm2, packed = W.decoder_step_fused_multi(
        qparams, wpack, drafts[:, S:], jnp.int32(P + S), packed, cross_g,
        dims, group=Kg, interpret=True)

    for lx, lm in ((lx1, lm1), (lx2, lm2)):
        np.testing.assert_array_equal(
            np.argmax(np.asarray(lx), -1), np.argmax(np.asarray(lm), -1))
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lm),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("self_kv_int8", [False, True])
@pytest.mark.slow
def test_beam_mega_kernel_sharded_parity(tiny_pair, self_kv_int8):
    """The PRODUCTION multi-chip decode path: beam_reorder="mega" (+ the
    beam_tail kernel) running under shard_map on the 8-device mesh must
    reproduce the single-device XLA decode token for token. This is the
    one-replica-per-chip mapping (complete_fixed_whisper.py:180-186,
    SURVEY §2.4): each device runs the whole Pallas megakernel (interpret
    mode off-TPU) on its local window shard with zero collectives."""
    from whisper_aries_tpu.ops.quant import quantize_model_params
    from whisper_aries_tpu.parallel.mesh import make_mesh, replicate_params

    _, dims, params, mel = tiny_pair
    qparams = quantize_model_params(params)
    # 8 windows over 8 devices (1 window/device) — tile the 2 base mels
    mel8 = np.tile(np.asarray(mel), (4, 1, 1))
    xa = W.encode(params, jnp.asarray(mel8), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=4, sample_len=6, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False, kv_int8=True,
                  self_kv_int8=self_kv_int8)
    prompt = jnp.full((8, 1), 3, jnp.int32)
    base = G.beam_search_decode(
        qparams, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="xla", beam_tail="xla", **common,
    )
    mesh = make_mesh(8)
    assert int(np.prod(mesh.devices.shape)) == 8
    from jax.sharding import NamedSharding, PartitionSpec as P

    xa_sh = jax.device_put(xa, NamedSharding(mesh, P("data", None, None)))
    pr_sh = jax.device_put(prompt, NamedSharding(mesh, P("data", None)))
    mega = G.beam_search_decode_sharded(
        mesh, replicate_params(qparams, mesh), xa_sh, pr_sh, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="mega", beam_tail="kernel", **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(mega["tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]), np.asarray(mega["sum_logprob"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(base["no_speech_prob"]),
        np.asarray(mega["no_speech_prob"]), rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_beam_sharded_optional_operands_parity(tiny_pair):
    """beam_search_decode_sharded with the OPTIONAL array operands
    (repetition_penalty scalar, prompt_start for left-padded prompts)
    must match the single-device call — covers the dynamic in_specs
    assembly for replicated extras."""
    from whisper_aries_tpu.parallel.mesh import make_mesh, replicate_params

    _, dims, params, mel = tiny_pair
    mel8 = np.tile(np.asarray(mel), (4, 1, 1))
    xa = W.encode(params, jnp.asarray(mel8), dims)
    ids = _tiny_ids(dims)
    common = dict(beam_size=3, sample_len=5, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False,
                  beam_reorder="xla", beam_tail="xla")
    prompt = jnp.asarray(np.tile([[-1, -1, 5, 3]], (8, 1)), jnp.int32)
    rep = jnp.float32(1.3)
    ps = jnp.int32(2)
    base = G.beam_search_decode(
        params, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(3),
        repetition_penalty=rep, prompt_start=ps, **common,
    )
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = G.beam_search_decode_sharded(
        mesh, replicate_params(params, mesh),
        jax.device_put(xa, NamedSharding(mesh, P("data", None, None))),
        jax.device_put(prompt, NamedSharding(mesh, P("data", None))),
        dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(3),
        repetition_penalty=rep, prompt_start=ps, **common,
    )
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(sharded["tokens"]))
    np.testing.assert_allclose(
        np.asarray(base["sum_logprob"]),
        np.asarray(sharded["sum_logprob"]), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_beam_tail_kernel_end_to_end_parity(tiny_pair):
    """beam_tail="kernel" (fused filters+log_softmax+top-k tail,
    interpret mode off-TPU) must reproduce the XLA tail through full
    beam decodes: identical tokens and scores, with timestamps on and
    off."""
    _, dims, params, mel = tiny_pair
    xa = W.encode(params, jnp.asarray(mel), dims)
    ids = _tiny_ids(dims)
    for with_ts in (True, False):
        common = dict(beam_size=4, sample_len=6, with_timestamps=with_ts,
                      length_penalty=0.0, suppress_blank=True)
        prompt = jnp.full((2, 1), 3, jnp.int32)
        base = G.beam_search_decode(
            params, xa, prompt, dims, ids,
            jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
            beam_reorder="xla", beam_tail="xla", **common,
        )
        kern = G.beam_search_decode(
            params, xa, prompt, dims, ids,
            jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
            beam_reorder="xla", beam_tail="kernel", **common,
        )
        np.testing.assert_array_equal(
            np.asarray(base["tokens"]), np.asarray(kern["tokens"])
        )
        np.testing.assert_allclose(
            np.asarray(base["sum_logprob"]),
            np.asarray(kern["sum_logprob"]), rtol=1e-5, atol=1e-6,
        )


@pytest.mark.slow
def test_mega_kernel_int8_self_cache_reference_parity():
    """Golden-model check of the megakernel's int8 self-cache mode
    (self_kv_int8 + mega): the Pallas kernel in interpret mode must
    reproduce fused_decoder_layers_reference — same activations (up to
    the Abramowitz-Stegun erf fit), bit-identical appended int8 K/V
    values, and identical per-(slot, head) scales. Covers the in-kernel
    quantize-on-append, the scale-array aligned write-back, and the
    scale-aware attention math."""
    from whisper_aries_tpu.ops.pallas_decode_layers import (
        fused_decoder_layers, fused_decoder_layers_reference,
        pack_layer_weights,
    )

    dims = W.WhisperDims(80, 192, 384, 6, 2, 1000, 64, 384, 6, 2)
    rng = np.random.default_rng(7)
    params = W.fuse_decoder_qkv(W.init_params(dims, dtype=jnp.float32))
    wpack = pack_layer_weights(params["decoder"]["blocks"])
    Bw, K, KP = 2, 4, 8
    H = dims.n_text_head
    dh = dims.n_text_state // H
    HP = ((H + 7) // 8) * 8
    L = dims.n_text_layer
    M = 256
    xa = jnp.asarray(rng.standard_normal((Bw, dims.n_audio_ctx, 384)),
                     jnp.float32) * 0.1
    cm = W.precompute_cross_kv_int8_packed(params, xa, dims)
    pos = 9          # posk = 36: mid-tile append, bucket 2 fetch
    ckv = jnp.asarray(
        rng.integers(-127, 128, (L, Bw, 2 * H, dh, M)), jnp.int8)
    ksc = jnp.asarray(
        0.01 + rng.random((L, Bw, 2 * HP, M)), jnp.float32)
    anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                   (Bw, 1, 40))
    amask = W.ancestry_mask(anc, jnp.int32(pos), jnp.int32(0), 40,
                            include_own=True, minor=M)
    x = jnp.asarray(0.1 * rng.standard_normal((Bw * K, 384)), jnp.float32)

    xr, ckv_r, ksc_r = fused_decoder_layers_reference(
        x, wpack, ckv, cm["kv8"], cm["sc"], amask, jnp.int32(pos), H, K,
        ksc=ksc)
    xk, ckv_k, ksc_k = fused_decoder_layers(
        x, wpack, ckv, cm["kv8"], cm["sc"], cm["cmask"], amask,
        jnp.int32(pos), H, K, ksc=ksc, interpret=True)

    # Quantization amplifies op-ordering noise: a ~3e-7 relative diff in
    # an appended K/V value flips its int8 at a round(x)=x.5 boundary,
    # and one flipped cache value moves attention outputs by ~scale/127
    # (~1.6e-2 absolute here). So: activations compared at flip-scale
    # tolerance, cache values required bit-exact except |delta|<=1 flips
    # on <0.1% of elements, scales at op-ordering tolerance. A real
    # logic bug (wrong placement column, k/v scale swap, stale tile)
    # fails all three by orders of magnitude.
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xr),
                               rtol=6e-2, atol=2e-2)
    ck_r, ck_k = np.asarray(ckv_r), np.asarray(ckv_k)
    delta = np.abs(ck_r.astype(np.int32) - ck_k.astype(np.int32))
    assert delta.max() <= 1, f"int8 append differs by >1: {delta.max()}"
    assert (delta != 0).mean() < 1e-3, (
        f"too many int8 rounding flips: {(delta != 0).sum()}")
    np.testing.assert_allclose(np.asarray(ksc_k), np.asarray(ksc_r),
                               rtol=2e-3, atol=0)
