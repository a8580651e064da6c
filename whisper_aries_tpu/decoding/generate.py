"""On-device autoregressive decoding: greedy, sampled, and batched beam search.

TPU-native replacement for CTranslate2's C++ beam-search decoder (reference
requirements.txt:9; params whitelisted at final_optimized_transcriber.py:
310-319). Everything runs inside one jitted ``lax.while_loop`` per window
batch: static token-buffer shapes, a static-shape KV cache updated in place,
logit filters expressed as vectorised masks, and beam reordering as gathers.
Only detokenisation and the temperature-fallback policy live on host.

Whisper-specific logit rules implemented (matching openai/whisper's
SuppressBlank / SuppressTokens / ApplyTimestampRules semantics):
  * blank suppression at the first sampled position,
  * static suppress-token mask (non-speech symbols, task/sot specials),
  * timestamp grammar: timestamps come in pairs, are monotonically
    non-decreasing, an initial-timestamp cap, and the "if the probability
    mass on timestamps beats every text token, force a timestamp" rule —
    tracked with O(1) carried state (last/penultimate/max-timestamp) instead
    of re-scanning the token history each step.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_aries_tpu.models import whisper as W

NEG_INF = float(np.finfo(np.float32).min)


@dataclass(frozen=True)
class DecodeSpecialIds:
    """Static token ids the decode loop needs (see tokenizer.SpecialTokens)."""

    eot: int
    sot: int
    no_speech: int
    no_timestamps: int
    timestamp_begin: int
    blank: int  # id of the encoded " " token
    n_vocab: int
    max_initial_timestamp_index: int = 50  # 1.0 s / 0.02

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "DecodeSpecialIds":
        sp = tokenizer.specials
        blank_ids = tokenizer.encode(" ")
        return cls(
            eot=sp.eot, sot=sp.sot, no_speech=sp.no_speech,
            no_timestamps=sp.no_timestamps, timestamp_begin=sp.timestamp_begin,
            blank=blank_ids[0] if blank_ids else 0, n_vocab=sp.n_vocab,
        )


def build_suppress_mask(n_vocab: int, suppress_ids: Sequence[int]) -> np.ndarray:
    """(vocab,) additive mask: NEG_INF at suppressed ids, 0 elsewhere."""
    mask = np.zeros((n_vocab,), np.float32)
    ids = [i for i in suppress_ids if 0 <= i < n_vocab]
    mask[ids] = NEG_INF
    return mask


class LoopState(NamedTuple):
    tokens: jax.Array        # (B, L) int32 token buffer (prompt + samples)
    pos: jax.Array           # scalar int32 — next position to fill
    cache_k: jax.Array
    cache_v: jax.Array
    sum_logprob: jax.Array   # (B,)
    finished: jax.Array      # (B,) bool
    last_tok: jax.Array      # (B,) int32
    penult_tok: jax.Array    # (B,) int32
    max_ts_tok: jax.Array    # (B,) int32 — highest timestamp sampled so far
    key: jax.Array           # PRNG key (for temperature sampling)
    present: jax.Array       # (B, V) bool — tokens sampled so far (for
    # repetition penalty; CTranslate2 parity, SURVEY §2.3 N1)


def apply_repetition_penalty(logits: jax.Array, present: jax.Array,
                             penalty: jax.Array) -> jax.Array:
    """CTranslate2/HF-style repetition penalty: previously produced tokens
    get their logit divided by the penalty when positive, multiplied when
    negative (penalty > 1 discourages repeats)."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(present, penalized, logits)


def _apply_filters(
    logits: jax.Array,          # (B, V) float32
    ids: DecodeSpecialIds,
    suppress_mask: jax.Array,   # (V,)
    is_first_sample: jax.Array,  # scalar bool
    last_tok: jax.Array,
    penult_tok: jax.Array,
    max_ts_tok: jax.Array,
    with_timestamps: bool,
    suppress_blank: bool = True,
) -> jax.Array:
    V = logits.shape[-1]
    vocab_idx = jnp.arange(V)[None, :]

    logits = logits + suppress_mask[None, :]
    # never emit notimestamps/sot during sampling
    logits = jnp.where(vocab_idx == ids.no_timestamps, NEG_INF, logits)

    # SuppressBlank at the very first sampled position: " " and eot
    if suppress_blank:
        blank_mask = (vocab_idx == ids.blank) | (vocab_idx == ids.eot)
        logits = jnp.where(is_first_sample & blank_mask, NEG_INF, logits)

    if not with_timestamps:
        logits = jnp.where(vocab_idx >= ids.timestamp_begin, NEG_INF, logits)
        return logits

    tsb = ids.timestamp_begin
    last_was_ts = last_tok >= tsb
    penult_was_ts = penult_tok >= tsb

    # after a timestamp pair -> text required; after a single timestamp ->
    # text forbidden (must close the pair or end).
    ts_region = vocab_idx >= tsb
    text_region = vocab_idx < ids.eot
    suppress_ts = last_was_ts & penult_was_ts
    suppress_text = last_was_ts & ~penult_was_ts
    logits = jnp.where(suppress_ts[:, None] & ts_region, NEG_INF, logits)
    logits = jnp.where(suppress_text[:, None] & text_region, NEG_INF, logits)

    # monotonic timestamps: forbid < max so far (or <= max when the pair is
    # already closed, forcing nonzero-length segments).
    has_ts = max_ts_tok >= tsb
    floor = jnp.where(last_was_ts & ~penult_was_ts, max_ts_tok, max_ts_tok + 1)
    mono_bad = ts_region & (vocab_idx < floor[:, None]) & has_ts[:, None]
    logits = jnp.where(mono_bad, NEG_INF, logits)

    # at the first sampled position: must start with a timestamp, capped at
    # max_initial_timestamp.
    init_cap = tsb + ids.max_initial_timestamp_index
    logits = jnp.where(is_first_sample & (vocab_idx < tsb), NEG_INF, logits)
    logits = jnp.where(is_first_sample & (vocab_idx > init_cap), NEG_INF, logits)

    # if total timestamp probability beats every text token, force a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(
        jnp.where(ts_region, logprobs, NEG_INF), axis=-1
    )
    max_text_lp = jnp.max(jnp.where(ts_region, NEG_INF, logprobs), axis=-1)
    force_ts = ts_lp > max_text_lp
    logits = jnp.where(force_ts[:, None] & ~ts_region, NEG_INF, logits)
    return logits


# ---------------------------------------------------------------------------
# Greedy / sampled decode
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("dims", "ids", "sample_len", "with_timestamps",
                     "prompt_len", "suppress_blank", "kv_int8"),
)
def greedy_decode(
    params: Dict[str, Any],
    xa: jax.Array,                 # (B, Ta, D) encoded audio
    prompt: jax.Array,             # (B, P) int32 — sot sequence (maybe + prev)
    dims: W.WhisperDims,
    ids: DecodeSpecialIds,
    suppress_mask: jax.Array,      # (V,)
    sot_index: jax.Array,          # scalar: index of <|sot|> within prompt
    temperature: jax.Array,        # scalar float; 0 => argmax
    key: jax.Array,                # PRNG key
    sample_len: int = 224,
    with_timestamps: bool = True,
    prompt_len: Optional[int] = None,
    suppress_blank: bool = True,
    kv_int8: bool = False,
    repetition_penalty: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Batched greedy/sampled decode with KV cache under lax.while_loop.

    ``kv_int8=True`` stores the cross-attention K/V as int8 with
    per-position scales and attends through the fused Pallas kernel —
    halving the dominant decode-step HBM stream (see
    ops/pallas_cross_attn.py).

    Returns dict with tokens (B, P+sample_len), n_sampled (B,), sum_logprob
    (B,), avg_logprob (B,), no_speech_prob (B,).
    """
    B, P = prompt.shape
    L = P + sample_len
    cross_kv = (W.precompute_cross_kv_int8(params, xa, dims) if kv_int8
                else W.precompute_cross_kv(params, xa, dims))
    cache = W.init_kv_cache(dims, B, dtype=xa.dtype, max_len=L)

    # Prefill the prompt.
    logits_p, cache = W.decoder_step(
        params, prompt, jnp.int32(0), cache, cross_kv, dims
    )
    # no-speech prob measured at the sot position's output.
    sot_logits = jnp.take_along_axis(
        logits_p, sot_index[None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, ids.no_speech]

    tokens = jnp.concatenate(
        [prompt.astype(jnp.int32), jnp.full((B, sample_len), ids.eot, jnp.int32)],
        axis=1,
    )

    state = LoopState(
        tokens=tokens,
        pos=jnp.int32(P),
        cache_k=cache["k"],
        cache_v=cache["v"],
        sum_logprob=jnp.zeros((B,), jnp.float32),
        finished=jnp.zeros((B,), bool),
        last_tok=prompt[:, -1].astype(jnp.int32),
        penult_tok=jnp.full((B,), -1, jnp.int32),
        max_ts_tok=jnp.full((B,), -1, jnp.int32),
        key=key,
        present=jnp.zeros((B, ids.n_vocab), bool),
    )

    first_logits = logits_p[:, -1]  # predicts the first sampled token

    def step(state: LoopState, logits: jax.Array) -> LoopState:
        is_first = state.pos == P
        if repetition_penalty is not None:
            logits = apply_repetition_penalty(
                logits, state.present, repetition_penalty
            )
        f = _apply_filters(
            logits, ids, suppress_mask, is_first,
            state.last_tok, state.penult_tok, state.max_ts_tok,
            with_timestamps, suppress_blank,
        )
        logprobs = jax.nn.log_softmax(f, axis=-1)
        key, sub = jax.random.split(state.key)
        # lax.cond so the PRNG bits (a full (B, vocab) threefry draw) are
        # only generated when actually sampling — at temperature 0 the
        # categorical would cost more than the decoder step itself.
        next_tok = jax.lax.cond(
            temperature > 0,
            lambda: jax.random.categorical(
                sub, f / jnp.maximum(temperature, 1e-6)
            ),
            lambda: jnp.argmax(f, axis=-1),
        ).astype(jnp.int32)
        next_tok = jnp.where(state.finished, ids.eot, next_tok)

        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_logprob = state.sum_logprob + jnp.where(state.finished, 0.0, tok_lp)
        finished = state.finished | (next_tok == ids.eot)

        tokens = jax.lax.dynamic_update_slice(
            state.tokens, next_tok[:, None], (0, state.pos)
        )
        is_ts = next_tok >= ids.timestamp_begin
        max_ts = jnp.where(is_ts, jnp.maximum(state.max_ts_tok, next_tok),
                           state.max_ts_tok)
        # track sampled tokens for the repetition penalty (CTranslate2
        # semantics penalize every previously produced token; the timestamp
        # grammar masks still dominate where they apply)
        present = state.present
        if repetition_penalty is not None:
            rows = jnp.arange(next_tok.shape[0])
            present = state.present.at[rows, next_tok].set(
                state.present[rows, next_tok] | ~state.finished
            )
        return state._replace(
            tokens=tokens, pos=state.pos + 1,
            sum_logprob=sum_logprob, finished=finished,
            last_tok=next_tok, penult_tok=state.last_tok, max_ts_tok=max_ts,
            key=key, present=present,
        )

    # First sampled token comes from the prefill logits.
    state = step(state, first_logits)

    def cond(state: LoopState):
        return (~jnp.all(state.finished)) & (state.pos < L)

    def body(state: LoopState):
        logits, cache = W.decoder_step(
            params,
            jax.lax.dynamic_slice(state.tokens, (0, state.pos - 1), (B, 1)),
            state.pos - 1,
            {"k": state.cache_k, "v": state.cache_v},
            cross_kv,
            dims,
        )
        state = state._replace(cache_k=cache["k"], cache_v=cache["v"])
        return step(state, logits[:, 0])

    state = jax.lax.while_loop(cond, body, state)

    n_sampled = jnp.sum(
        (state.tokens[:, P:] != ids.eot).astype(jnp.int32), axis=1
    )
    avg_logprob = state.sum_logprob / (n_sampled.astype(jnp.float32) + 1.0)
    return {
        "tokens": state.tokens,
        "n_sampled": n_sampled,
        "sum_logprob": state.sum_logprob,
        "avg_logprob": avg_logprob,
        "no_speech_prob": no_speech_prob,
    }


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


class BeamState(NamedTuple):
    tokens: jax.Array        # (B, K, L)
    pos: jax.Array
    cache_k: jax.Array       # (Lyr, B*K, H, T, dh)
    cache_v: jax.Array
    sum_logprob: jax.Array   # (B, K)
    finished: jax.Array      # (B, K)
    last_tok: jax.Array      # (B, K)
    penult_tok: jax.Array
    max_ts_tok: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("dims", "ids", "beam_size", "sample_len",
                     "with_timestamps", "length_penalty", "suppress_blank",
                     "kv_int8"),
)
def beam_search_decode(
    params: Dict[str, Any],
    xa: jax.Array,               # (B, Ta, D)
    prompt: jax.Array,           # (B, P)
    dims: W.WhisperDims,
    ids: DecodeSpecialIds,
    suppress_mask: jax.Array,
    sot_index: jax.Array,
    beam_size: int = 5,
    sample_len: int = 224,
    with_timestamps: bool = True,
    length_penalty: float = 1.0,
    suppress_blank: bool = True,
    kv_int8: bool = False,
) -> Dict[str, jax.Array]:
    """Batched beam search, beams flattened into the batch axis.

    Finished beams are frozen (they may only re-propose eot at zero cost);
    each step takes the top-K of the K*V expansion per batch element and
    reorders the KV cache with a gather. Final selection maximises
    sum_logprob / length**length_penalty over finished beams (GNMT-style
    ((5+len)/6)**p when length_penalty != 1 is applied by the caller's
    ranking — here the classic Whisper convention score/len**p).
    """
    B, P = prompt.shape
    K = beam_size
    L = P + sample_len
    V = ids.n_vocab

    # Cross K/V stay at batch B and are SHARED by the K beams of each window
    # (decoder_step's grouped cross-attention) — replicating them per beam
    # would cost K x the dominant HBM buffer for zero benefit. kv_int8
    # additionally halves the per-step stream (Pallas fused dequant attn).
    cross_kv = (W.precompute_cross_kv_int8(params, xa, dims) if kv_int8
                else W.precompute_cross_kv(params, xa, dims))
    cache = W.init_kv_cache(dims, B * K, dtype=xa.dtype, max_len=L)

    prompt_k = jnp.repeat(prompt, K, axis=0)
    logits_p, cache = W.decoder_step(
        params, prompt_k, jnp.int32(0), cache, cross_kv, dims
    )
    sot_logits = jnp.take_along_axis(
        logits_p, sot_index[None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, ids.no_speech]
    no_speech_prob = no_speech_prob.reshape(B, K)[:, 0]

    tokens = jnp.concatenate(
        [jnp.tile(prompt[:, None, :], (1, K, 1)).astype(jnp.int32),
         jnp.full((B, K, sample_len), ids.eot, jnp.int32)],
        axis=2,
    )
    # Initialise beam scores so only beam 0 is live (avoids K duplicates).
    init_scores = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)[None, :], (B, 1)
    )

    state = BeamState(
        tokens=tokens,
        pos=jnp.int32(P),
        cache_k=cache["k"],
        cache_v=cache["v"],
        sum_logprob=init_scores,
        finished=jnp.zeros((B, K), bool),
        last_tok=jnp.tile(prompt[:, -1:].astype(jnp.int32), (1, K)),
        penult_tok=jnp.full((B, K), -1, jnp.int32),
        max_ts_tok=jnp.full((B, K), -1, jnp.int32),
    )

    first_logits = logits_p[:, -1]  # (B*K, V)

    def expand(state: BeamState, logits_flat: jax.Array) -> BeamState:
        is_first = state.pos == P
        f = _apply_filters(
            logits_flat, ids, suppress_mask, is_first,
            state.last_tok.reshape(-1), state.penult_tok.reshape(-1),
            state.max_ts_tok.reshape(-1), with_timestamps, suppress_blank,
        )
        logprobs = jax.nn.log_softmax(f, axis=-1).reshape(B, K, V)

        # Frozen finished beams: only eot at zero incremental cost.
        eot_only = jnp.full((V,), NEG_INF).at[ids.eot].set(0.0)
        logprobs = jnp.where(state.finished[:, :, None], eot_only[None, None],
                             logprobs)

        total = state.sum_logprob[:, :, None] + logprobs  # (B, K, V)
        flat = total.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # (B, K)
        src_beam = top_idx // V  # (B, K)
        next_tok = (top_idx % V).astype(jnp.int32)

        # Gather beam state along the beam axis.
        def g(x):  # (B, K, ...) gather
            return jnp.take_along_axis(
                x, src_beam.reshape(B, K, *([1] * (x.ndim - 2))), axis=1
            )

        tokens = g(state.tokens)
        finished = jnp.take_along_axis(state.finished, src_beam, axis=1)
        last = jnp.take_along_axis(state.last_tok, src_beam, axis=1)
        max_ts = jnp.take_along_axis(state.max_ts_tok, src_beam, axis=1)

        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, :, None], (0, 0, state.pos)
        )
        new_finished = finished | (next_tok == ids.eot)
        is_ts = next_tok >= ids.timestamp_begin
        new_max_ts = jnp.where(is_ts & ~finished,
                               jnp.maximum(max_ts, next_tok), max_ts)

        # Reorder the KV cache: flat index b*K + src_beam.
        flat_src = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
        cache_k = jnp.take(state.cache_k, flat_src, axis=1)
        cache_v = jnp.take(state.cache_v, flat_src, axis=1)

        return BeamState(
            tokens=tokens, pos=state.pos + 1,
            cache_k=cache_k, cache_v=cache_v,
            sum_logprob=top_scores,
            finished=new_finished,
            last_tok=jnp.where(new_finished, last, next_tok),
            penult_tok=jnp.where(new_finished, jnp.full_like(last, -1), last),
            max_ts_tok=new_max_ts,
        )

    state = expand(state, first_logits)

    def cond(state: BeamState):
        return (~jnp.all(state.finished)) & (state.pos < L)

    def body(state: BeamState):
        tok_in = jax.lax.dynamic_slice(
            state.tokens, (0, 0, state.pos - 1), (B, K, 1)
        ).reshape(B * K, 1)
        logits, cache = W.decoder_step(
            params, tok_in, state.pos - 1,
            {"k": state.cache_k, "v": state.cache_v}, cross_kv, dims,
        )
        state = state._replace(cache_k=cache["k"], cache_v=cache["v"])
        return expand(state, logits[:, 0])

    state = jax.lax.while_loop(cond, body, state)

    n_sampled = jnp.sum(
        (state.tokens[:, :, P:] != ids.eot).astype(jnp.int32), axis=2
    )
    lengths = n_sampled.astype(jnp.float32) + 1.0
    final_score = state.sum_logprob / (lengths ** length_penalty)
    best = jnp.argmax(final_score, axis=1)  # (B,)

    def pick(x):
        return jnp.take_along_axis(
            x, best.reshape(B, *([1] * (x.ndim - 1))), axis=1
        )[:, 0]

    best_tokens = pick(state.tokens)
    best_sum = jnp.take_along_axis(state.sum_logprob, best[:, None], axis=1)[:, 0]
    best_n = jnp.take_along_axis(n_sampled, best[:, None], axis=1)[:, 0]
    return {
        "tokens": best_tokens,
        "n_sampled": best_n,
        "sum_logprob": best_sum,
        "avg_logprob": best_sum / (best_n.astype(jnp.float32) + 1.0),
        "no_speech_prob": no_speech_prob,
        "all_tokens": state.tokens,
        "all_scores": final_score,
    }


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("dims", "sot", "lang0", "n_lang"))
def detect_language_logits(
    params: Dict[str, Any], xa: jax.Array, dims: W.WhisperDims,
    sot: int, lang0: int, n_lang: int,
) -> jax.Array:
    """(B, n_lang) language probabilities from a single decode step on <|sot|>
    (faster-whisper's language detection from the first window; SURVEY §2.3
    N2)."""
    B = xa.shape[0]
    cross_kv = W.precompute_cross_kv(params, xa, dims)
    cache = W.init_kv_cache(dims, B, dtype=xa.dtype, max_len=4)
    prompt = jnp.full((B, 1), sot, jnp.int32)
    logits, _ = W.decoder_step(params, prompt, jnp.int32(0), cache, cross_kv, dims)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], lang0, n_lang, axis=1
    )
    return jax.nn.softmax(lang_logits, axis=-1)
