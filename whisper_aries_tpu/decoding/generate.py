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
    cache: Any               # self-attn KV cache pytree (bf16 or int8+scales)
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


def ngram_banned_mask(tokens: jax.Array, pos: jax.Array, n: int,
                      n_vocab: int) -> jax.Array:
    """(R, V) bool mask of tokens that would complete an already-seen n-gram.

    CTranslate2's ``no_repeat_ngram_size`` semantics (reference whitelists it
    at final_optimized_transcriber.py:310-319): if the last n-1 tokens
    followed by candidate t form an n-gram already present in ``tokens`` up to
    ``pos``, t is banned. Vectorised over all history positions — no
    data-dependent shapes, so it stays inside the jitted decode loop.
    """
    R, L = tokens.shape
    n_ctx = n - 1
    n_pos = L - n + 1
    start = jnp.maximum(pos - n_ctx, 0)
    ctx = jax.lax.dynamic_slice(tokens, (jnp.int32(0), start), (R, n_ctx))
    idx = jnp.arange(n_pos)[:, None] + jnp.arange(n_ctx)[None, :]
    hist = tokens[:, idx]                                   # (R, n_pos, n-1)
    ends = jnp.arange(n_pos) + n_ctx                        # index of the
    match = jnp.all(hist == ctx[:, None, :], axis=-1)       # n-gram's last tok
    match = match & (ends[None, :] < pos) & (pos >= n_ctx)
    follow = tokens[:, n_ctx:]                              # (R, n_pos)
    rows = jnp.arange(R)[:, None]
    counts = jnp.zeros((R, n_vocab), jnp.int32).at[rows, follow].add(
        match.astype(jnp.int32)
    )
    return counts > 0


def _top_k_unrolled(flat: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact descending top-k over the last axis as k argmax+mask passes.

    ``jax.lax.top_k`` over the beam expansion's (B, K*V) candidates lowers
    to a sort-based program measured at 8.4 ms/step on TPU (21% of the
    whole beam step, scripts/profile_beam_parts.py); k unrolled argmax
    passes over the same tensor measure 0.87 ms. Ties resolve to the lower
    index in both (argmax picks the first maximum); picked entries are
    masked to -inf (strictly below the NEG_INF = f32-min padding), so
    results are identical to lax.top_k for every row with at least k
    entries above -inf — always true in the beam loop, where each live
    beam contributes a full vocab of finite logprobs.
    """
    rows = jnp.arange(flat.shape[0])
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(flat, axis=-1)
        vals.append(jnp.take_along_axis(flat, i[:, None], axis=1)[:, 0])
        idxs.append(i)
        flat = flat.at[rows, i].set(-jnp.inf)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


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

    # if total timestamp probability beats every text token, force a
    # timestamp. The comparison is shift-invariant (log_softmax subtracts
    # the same logsumexp Z from both sides), so it runs on RAW logits — no
    # (B, V) log_softmax materialised here (one ~0.7 ms full-vocab pass per
    # decode step on TPU, measured by scripts/profile_beam_parts.py).
    ts_lp = jax.nn.logsumexp(
        jnp.where(ts_region, logits, NEG_INF), axis=-1
    )
    max_text_lp = jnp.max(jnp.where(ts_region, NEG_INF, logits), axis=-1)
    force_ts = ts_lp > max_text_lp
    logits = jnp.where(force_ts[:, None] & ~ts_region, NEG_INF, logits)
    return logits


# ---------------------------------------------------------------------------
# Greedy / sampled decode
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("dims", "ids", "sample_len", "with_timestamps",
                     "prompt_len", "suppress_blank", "kv_int8",
                     "self_kv_int8", "no_repeat_ngram_size", "mega_group"),
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
    self_kv_int8: bool = False,
    repetition_penalty: Optional[jax.Array] = None,
    no_repeat_ngram_size: int = 0,
    prompt_start: Optional[jax.Array] = None,
    mega_group: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Batched greedy/sampled decode with KV cache under lax.while_loop.

    ``kv_int8=True`` stores the cross-attention K/V as int8 with
    per-position scales and attends through the fused Pallas kernel —
    halving the dominant decode-step HBM stream (see
    ops/pallas_cross_attn.py).

    ``prompt_start``: scalar index of the first real token when ``prompt``
    is left-padded (pad value -1) to a static width — variable-length
    prompts (condition_on_previous_text) then share ONE compiled program,
    with results identical to the unpadded decode (see decoder_step).

    ``mega_group=Kg`` (static, requires ``kv_int8`` and B % Kg == 0)
    routes the decode steps through the all-layers int8 Pallas megakernel
    in GROUPED-WINDOWS form: Kg distinct windows pack into the kernel's
    K beam slots (identity ancestry isolates their self-attention;
    a block-diagonal cross mask + per-group packed cross KV isolates
    cross-attention, W.group_cross_mega). Greedy K=1 would waste 7/8 of
    the kernel's KP=8 row padding and pay L*B iteration grains; grouping
    reclaims the rows and divides the iteration count by Kg. The
    reference engine's default fast path is beam_size=1
    (final_optimized_transcriber.py:434) — this is its kernel.
    ``self_kv_int8`` then quantizes the packed self-cache exactly like
    the beam mega path (in-kernel quantize-on-append).

    Returns dict with tokens (B, P+sample_len), n_sampled (B,), sum_logprob
    (B,), avg_logprob (B,), no_speech_prob (B,).
    """
    B, P = prompt.shape
    L = P + sample_len
    use_mega = mega_group is not None and kv_int8 and B % mega_group == 0
    if use_mega:
        Kg = mega_group
        # grouped layout emitted IN-SCAN (no second whole-size cross
        # buffer; see precompute_cross_kv_int8_packed group notes)
        cross_mega = W.precompute_cross_kv_int8_packed(
            params, xa, dims, group=Kg, rows_per_block=1)
        cross_kv = W.cross_views_from_packed(
            cross_mega, dims.n_text_head, xa.shape[1], group=Kg)
    else:
        cross_kv = (W.precompute_cross_kv_int8(params, xa, dims) if kv_int8
                    else W.precompute_cross_kv(params, xa, dims))
    # self cache int8 is a separate (HBM-capacity) knob: it halves the beam
    # cache footprint but quantize-on-write adds per-step ops — batch 40
    # int8-self measured 107x vs 155x for batch 24 bf16-self (ROADMAP.md),
    # so throughput configs keep it off. The mega path quantizes in-kernel
    # instead (free capacity) — its prefill cache is prompt-sized and
    # packed below.
    cache = W.init_kv_cache(dims, B, dtype=xa.dtype,
                            max_len=P if use_mega else L,
                            int8=self_kv_int8 and not use_mega)

    # Prefill the prompt.
    logits_p, cache = W.decoder_step(
        params, prompt, jnp.int32(0), cache, cross_kv, dims,
        valid_start=prompt_start,
    )
    if use_mega:
        cache = W.pack_greedy_prefill_cache(
            cache, Kg, max_len=L, int8=self_kv_int8,
            n_head=dims.n_text_head)
        cross_grouped = cross_mega  # already grouped in-scan
        # identity ancestry: slot j of a group always holds window j's KV
        anc_id = jnp.broadcast_to(
            jnp.arange(Kg, dtype=jnp.int32)[None, :, None],
            (B // Kg, Kg, L))
        from whisper_aries_tpu.ops.pallas_decode_layers import (
            pack_layer_weights,
        )

        wpack = pack_layer_weights(
            W.fuse_decoder_qkv(params)["decoder"]["blocks"])
        mega_interpret = jax.default_backend() != "tpu"
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
        cache=cache,
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
        if no_repeat_ngram_size >= 2:
            banned = ngram_banned_mask(
                state.tokens, state.pos, no_repeat_ngram_size, ids.n_vocab
            )
            logits = jnp.where(banned, NEG_INF, logits)
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
        tok_in = jax.lax.dynamic_slice(
            state.tokens, (0, state.pos - 1), (B, 1))
        if use_mega:
            logits, cache = W.decoder_step_fused(
                params, wpack, tok_in, state.pos - 1,
                state.cache, cross_grouped, dims,
                beam_anc=anc_id, beam_k=Kg,
                valid_start=prompt_start,
                interpret=mega_interpret,
            )
        else:
            logits, cache = W.decoder_step(
                params, tok_in, state.pos - 1,
                state.cache, cross_kv, dims,
                valid_start=prompt_start,
            )
        state = state._replace(cache=cache)
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
    tokens: jax.Array        # (B, K, L) — live beams only
    pos: jax.Array
    cache: Any               # self-attn KV cache pytree, (Lyr, B*K, ...) leaves
    sum_logprob: jax.Array   # (B, K)
    last_tok: jax.Array      # (B, K)
    penult_tok: jax.Array
    max_ts_tok: jax.Array
    fin_tokens: jax.Array    # (B, C, L) — collected finished hypotheses
    fin_scores: jax.Array    # (B, C) sum logprob (NEG_INF = empty slot)
    fin_count: jax.Array     # (B,) int32
    present: Any             # (B, K, V) bool or None (repetition penalty)
    anc: Any                 # (B, K, L) int32 ancestry table (lazy reorder
                             # mode: cache row holding beam k's position t)
                             # or None (permute mode)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "ids", "beam_size", "sample_len",
                     "with_timestamps", "length_penalty", "suppress_blank",
                     "kv_int8", "self_kv_int8", "patience",
                     "no_repeat_ngram_size", "beam_reorder", "beam_tail",
                     "beam_group"),
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
    self_kv_int8: bool = False,
    patience: float = 1.0,
    repetition_penalty: Optional[jax.Array] = None,
    no_repeat_ngram_size: int = 0,
    prompt_start: Optional[jax.Array] = None,
    beam_reorder: Optional[str] = None,
    beam_tail: Optional[str] = None,
    beam_group: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Batched beam search, beams flattened into the batch axis.

    openai-whisper/CTranslate2 semantics: each step expands the K live beams,
    routes eot candidates into a finished-hypotheses buffer of capacity
    C = round(K * patience) (Kasai et al. beam patience; faster-whisper's
    ``patience`` option), and keeps the top K non-eot candidates live — so
    finished hypotheses never occupy beam slots. The KV cache reorders with
    a gather over the live candidates' source beams. Final selection
    maximises sum_logprob / length**length_penalty over the finished buffer
    (plus still-live beams when the buffer didn't fill before sample_len).

    ``repetition_penalty`` tracks per-beam produced-token presence;
    ``no_repeat_ngram_size`` bans n-gram repeats inside each beam.

    ``beam_reorder`` (static): None/"default" resolves to "mega" on TPU
    when kv_int8 (the production path — all-layers int8 Pallas decode
    megakernel over an append-only K-minor cache with lazy ancestry
    reorder; bench 228.7x vs 188.7x for the XLA step,
    ops/pallas_decode_layers.py) and to the XLA one-hot-permute step
    elsewhere. Explicit modes (A/B knobs): "xla" = one-hot permutation
    matmul with a lax.cond skip on identity steps; "always" = permute
    every step; "nobarrier" = drop the per-buffer permute sequencing
    barriers; "ancestry" = the mega step's lazy-reorder semantics in
    pure XLA (measured 177.9x with the K-minor cache); "pallas" = the
    per-row DMA reorder kernel (measured SLOWER end-to-end: 92.3x — its
    L*B*K tiny program launches serialize; kept as a probe); "mega" =
    force the megakernel. When None, the ARIES_BEAM_REORDER env var is
    consulted ONCE at trace time (the jit cache keys on the static arg,
    not the env) — callers who want the knob live must read the env
    themselves and pass it here (engine does).
    """
    if beam_reorder is None:
        import os as _os_knob

        beam_reorder = _os_knob.environ.get("ARIES_BEAM_REORDER", "default")
    if beam_tail is None:
        import os as _os_knob2

        # same trace-time caveat as beam_reorder: the jit cache keys on
        # the resolved static, not the env — pass explicitly to flip live
        beam_tail = _os_knob2.environ.get("ARIES_BEAM_TAIL", "default")
    # fused filters+log_softmax+top-k tail kernel (ops/pallas_beam_tail):
    # the XLA tail is ~15 separate full-vocab ops (~0.7 ms/step at batch
    # 24, ~2.1 ms at 48 — scripts/profile_beam_tail.py); the kernel is
    # one program. "xla" opts out; "kernel" forces it (interpret mode
    # off-TPU — parity tests).
    use_tail_kernel = (beam_tail == "kernel"
                       or (beam_tail != "xla"
                           and jax.default_backend() == "tpu"))
    if (beam_reorder == "default" and kv_int8
            and jax.default_backend() == "tpu"):
        # the all-layers int8 megakernel IS the default TPU beam path
        # (bench: 351.9x vs 188.7x for the XLA one-hot permute step) —
        # and int8 decoder compute matches the reference's default
        # COMPUTE_TYPE=int8 (README.md:178). Opt out with
        # ARIES_BEAM_REORDER=xla; all prior modes remain selectable.
        # self_kv_int8 additionally quantizes the beam KV cache
        # IN-KERNEL (quantize-on-append, per-slot/head scales).
        beam_reorder = "mega"
    use_mega = beam_reorder == "mega" and kv_int8
    use_ancestry = beam_reorder in ("ancestry", "mega")
    B, P = prompt.shape
    K = beam_size
    L = P + sample_len
    V = ids.n_vocab
    C = max(1, int(round(K * patience)))
    # GROUPED-BEAM megakernel (TPU default, ARIES_BEAM_GROUP=1 opts out):
    # Gw windows' beams pack into one kernel "window" (Gw*K rows) — the
    # grouped-greedy trick applied to beam search, halving the
    # per-(layer,window) iteration count. Beam machinery stays (B, K);
    # only the kernel cache/cross layout and ancestry slots regroup.
    # Measured (batch 48, beam 5): 415.4x vs 406.3x ungrouped; at equal
    # batch 24: 399.9x vs 352x. Falls back to 1 when the batch does not
    # divide (e.g. one window per device under shard_map).
    bg = 1
    if use_mega:
        if beam_group is not None:
            bg = int(beam_group)
        else:
            import os as _os_bg

            try:
                bg = int(_os_bg.environ.get("ARIES_BEAM_GROUP", "2") or 1)
            except ValueError:
                bg = 2
        if bg < 1 or B % bg != 0:
            bg = 1
    GK = bg * K

    # Cross K/V stay at batch B and are SHARED by the K beams of each window
    # (decoder_step's grouped cross-attention) — replicating them per beam
    # would cost K x the dominant HBM buffer for zero benefit. kv_int8
    # additionally halves the per-step stream. The mega path emits the
    # packed kernel layout DIRECTLY from the precompute scan (the quad
    # never materialises — packing a precomputed quad kept two 3 GB cross
    # buffers live and OOM'd the batch-24 bench) and the prefill consumes
    # fused slice views of it.
    if use_mega:
        # grouped layouts are emitted IN-SCAN (group=bg): regrouping a
        # finished pack held two whole-size cross buffers live (round-5
        # grouped-beam A/B OOM'd batch 48 -> 24 exactly this way)
        cross_mega = W.precompute_cross_kv_int8_packed(
            params, xa, dims, group=bg, rows_per_block=K)
        cross_kv = W.cross_views_from_packed(
            cross_mega, dims.n_text_head, xa.shape[1], group=bg)
    else:
        cross_kv = (W.precompute_cross_kv_int8(params, xa, dims) if kv_int8
                    else W.precompute_cross_kv(params, xa, dims))

    if use_ancestry:
        # K-minor cache (windows x T*K minor) + prefill ONCE per window:
        # every beam of a window shares the prompt, so the row-major
        # path's repeat(prompt, K) prefill recomputes identical KV K
        # times; here the single forward broadcasts into the K slots.
        # For mega, prefill runs on a PROMPT-SIZED cache that is then
        # placed at lane 0 of the full packed buffer (static offset ->
        # in-place): concatenating two full-length k/v caches into the
        # packed layout was a second multi-GB transient.
        prefill_len = P if use_mega else L
        cache = W.init_kv_cache(dims, B, dtype=xa.dtype,
                                max_len=prefill_len,
                                int8=self_kv_int8 and not use_mega,
                                beam_k=K)
        logits_p, cache = W.decoder_step(
            params, prompt, jnp.int32(0), cache, cross_kv, dims,
            valid_start=prompt_start, beam_k=K,
        )
        # slice BEFORE the beam repeat — the full (B*K, P, V) prefill
        # logits would be a multi-GB transient at conditioned P=224
        last_logits = jnp.repeat(logits_p[:, -1], K, axis=0)
        if use_mega:
            Mfull = ((L * GK + 127) // 128) * 128 + 128
            small = jnp.concatenate([cache["k"], cache["v"]], axis=2)
            if bg > 1:
                # regroup the per-window K-minor prefill (m = t*K + k)
                # into the grouped GK-minor layout (m = t*GK + gw*K + k).
                # The prefill cache minor is x128-padded — slice to the
                # VALID P*K prefix first (pad slots are zeros and the
                # ancestry masks keep them dead in the big buffer too).
                Lx0, B0, H20, dh0, _ = small.shape
                small = small[..., :P * K].reshape(
                    Lx0, B0 // bg, bg, H20, dh0, P, K).transpose(
                    0, 1, 3, 4, 5, 2, 6).reshape(
                    Lx0, B0 // bg, H20, dh0, P * GK)
            if self_kv_int8:
                # quantize the bf16 prefill KV into the kernel's int8
                # cache + per-(slot, head) scale layout (the decode
                # steps then quantize-on-append IN-KERNEL)
                H = dims.n_text_head
                HP = ((H + 7) // 8) * 8
                Lx, Bw_, H2, dh_, Mp = small.shape
                nf = small.astype(jnp.float32)
                am = jnp.max(jnp.abs(nf), axis=3)       # (L,Bw,2H,Mp)
                sc = jnp.where(am > 0.0, am / 127.0, 1.0)
                q8 = jnp.clip(jnp.round(nf / sc[:, :, :, None, :]),
                              -127, 127).astype(jnp.int8)
                big8 = jnp.zeros(small.shape[:-1] + (Mfull,), jnp.int8)
                scp = jnp.zeros((Lx, Bw_, 2 * HP, Mfull), jnp.float32)
                scp = scp.at[:, :, :H, :Mp].set(sc[:, :, :H])
                scp = scp.at[:, :, HP:HP + H, :Mp].set(sc[:, :, H:])
                cache = {
                    "kv8": jax.lax.dynamic_update_slice(
                        big8, q8, (0, 0, 0, 0, 0)),
                    "ksc": scp,
                }
            else:
                big = jnp.zeros(small.shape[:-1] + (Mfull,), small.dtype)
                cache = {"kv": jax.lax.dynamic_update_slice(
                    big, small, (0, 0, 0, 0, 0))}
    else:
        cache = W.init_kv_cache(dims, B * K, dtype=xa.dtype, max_len=L,
                                int8=self_kv_int8)
        prompt_k = jnp.repeat(prompt, K, axis=0)
        logits_p, cache = W.decoder_step(
            params, prompt_k, jnp.int32(0), cache, cross_kv, dims,
            valid_start=prompt_start,
        )
        last_logits = logits_p[:, -1]  # (B*K, V)
    sot_logits = jnp.take_along_axis(
        logits_p, sot_index[None, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, ids.no_speech]
    no_speech_prob = (no_speech_prob if use_ancestry
                      else no_speech_prob.reshape(B, K)[:, 0])

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
        cache=cache,
        sum_logprob=init_scores,
        last_tok=jnp.tile(prompt[:, -1:].astype(jnp.int32), (1, K)),
        penult_tok=jnp.full((B, K), -1, jnp.int32),
        max_ts_tok=jnp.full((B, K), -1, jnp.int32),
        fin_tokens=jnp.full((B, C, L), ids.eot, jnp.int32),
        fin_scores=jnp.full((B, C), NEG_INF, jnp.float32),
        fin_count=jnp.zeros((B,), jnp.int32),
        present=(jnp.zeros((B, K, V), bool)
                 if repetition_penalty is not None else None),
        anc=(jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                      (B, 1, L))
             if use_ancestry else None),
    )

    first_logits = last_logits  # (B*K, V)
    b_rows = jnp.arange(B)[:, None]

    def expand(state: BeamState, logits_flat: jax.Array) -> BeamState:
        is_first = state.pos == P
        if repetition_penalty is not None:
            logits_flat = apply_repetition_penalty(
                logits_flat, state.present.reshape(B * K, V),
                repetition_penalty,
            )
        if no_repeat_ngram_size >= 2:
            banned = ngram_banned_mask(
                state.tokens.reshape(B * K, L), state.pos,
                no_repeat_ngram_size, V,
            )
            logits_flat = jnp.where(banned, NEG_INF, logits_flat)
        if use_tail_kernel:
            # ONE fused program for filters + log_softmax + score
            # accumulation + eot routing + top-k (semantics identical to
            # the XLA branch below; tests/test_beam_tail.py)
            from whisper_aries_tpu.ops.pallas_beam_tail import beam_tail

            live_score, top_idx, eot_scores = beam_tail(
                logits_flat, state.sum_logprob, state.last_tok,
                state.penult_tok, state.max_ts_tok, suppress_mask,
                is_first, K=K, tsb=ids.timestamp_begin, eot=ids.eot,
                blank=ids.blank, no_ts=ids.no_timestamps,
                init_cap=(ids.timestamp_begin
                          + ids.max_initial_timestamp_index),
                with_timestamps=with_timestamps,
                suppress_blank=suppress_blank,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            f = _apply_filters(
                logits_flat, ids, suppress_mask, is_first,
                state.last_tok.reshape(-1), state.penult_tok.reshape(-1),
                state.max_ts_tok.reshape(-1), with_timestamps,
                suppress_blank,
            )
            logprobs = jax.nn.log_softmax(f, axis=-1).reshape(B, K, V)

            total = state.sum_logprob[:, :, None] + logprobs  # (B, K, V)
            # eot candidates are exactly the eot column — one per live
            # beam — so they never need a top-k over V; mask them out of
            # the flat expansion and keep the round-1-cost top_k(K) for
            # the live refill.
            eot_scores = total[:, :, ids.eot]  # (B, K)
            flat = total.at[:, :, ids.eot].set(NEG_INF).reshape(B, K * V)
            live_score, top_idx = _top_k_unrolled(flat, K)  # (B, K)
        live_src = top_idx // V
        next_tok = (top_idx % V).astype(jnp.int32)

        # --- route eot candidates into the finished buffer ---------------
        # openai-whisper semantics: an eot hypothesis is collected iff it
        # outranks the K-th surviving live candidate (descending order).
        eot_sorted, eot_order = jax.lax.top_k(eot_scores, K)  # (B, K)
        is_fin = (eot_sorted > live_score[:, -1:]) & (eot_sorted > NEG_INF / 2)
        slot = (state.fin_count[:, None]
                + jnp.cumsum(is_fin, axis=1) - is_fin.astype(jnp.int32))
        write = is_fin & (slot < C)
        slot_w = jnp.where(write, slot, C)  # C == out-of-bounds -> dropped
        cand_tokens = jnp.take_along_axis(
            state.tokens, eot_order[:, :, None], axis=1
        )  # (B, K, L) — tail beyond pos is already eot filler
        fin_tokens = state.fin_tokens.at[b_rows, slot_w].set(
            cand_tokens, mode="drop"
        )
        fin_scores = state.fin_scores.at[b_rows, slot_w].set(
            eot_sorted, mode="drop"
        )
        fin_count = state.fin_count + jnp.sum(write, axis=1)

        def g(x):  # (B, K, ...) gather along the beam axis
            return jnp.take_along_axis(
                x, live_src.reshape(B, K, *([1] * (x.ndim - 2))), axis=1
            )

        tokens = jax.lax.dynamic_update_slice(
            g(state.tokens), next_tok[:, :, None], (0, 0, state.pos)
        )
        last = jnp.take_along_axis(state.last_tok, live_src, axis=1)
        max_ts = jnp.take_along_axis(state.max_ts_tok, live_src, axis=1)
        is_ts = next_tok >= ids.timestamp_begin
        new_max_ts = jnp.where(is_ts, jnp.maximum(max_ts, next_tok), max_ts)

        present = state.present
        if repetition_penalty is not None:
            present = g(state.present)
            k_rows = jnp.arange(K)[None, :]
            present = present.at[b_rows, k_rows, next_tok].set(True)

        # Reorder the KV cache: flat index b*K + live_src, applied as a
        # ONE-HOT PERMUTATION MATMUL over the row axis. Measured history
        # (scripts/profile_beam_parts.py + bench.py A/B): jnp.take gather
        # 53 ms/step; one-hot matmul 14.2 ms (the ~150 GFLOP of
        # multiply-by-zero ride the MXU at full bandwidth); Pallas row-DMA
        # kernel (ops/pallas_beam_reorder.py) ~4 ms in isolation but a
        # REGRESSION end-to-end (bench 92.3x vs 188.5x) — its L*B*K tiny
        # program launches serialize against the step's other work. The
        # kernel stays behind ARIES_BEAM_REORDER=pallas as a probe. The
        # barrier chain SEQUENCES per-buffer permutes so no two permute
        # outputs are live together — each transient dies before the next
        # runs, shaving ~1x cache buffer off peak HBM (the beam batch
        # limiter). One-hot works for both cache layouts (bf16 k/v, int8
        # quad; int8 values permute exactly under a 0/1 matrix).
        flat_src = (jnp.arange(B)[:, None] * K + live_src).reshape(-1)
        use_pallas_reorder = (
            jax.default_backend() == "tpu" and beam_reorder == "pallas"
        )

        def permute_rows(x: jax.Array, p: jax.Array) -> jax.Array:
            if use_pallas_reorder:
                from whisper_aries_tpu.ops.pallas_beam_reorder import (
                    _permute_leaf,
                )

                return _permute_leaf(x, live_src)
            # XLA fallback: one-hot permutation matmul over the flat row
            # axis. int8 values (<=127) are exact in bf16; float buffers
            # keep their own dtype (f32 scales must not round through
            # bf16 — a one-hot product with f32 accumulation is bit-exact)
            if jnp.issubdtype(x.dtype, jnp.integer):
                y = jnp.einsum("oi,li...->lo...", p, x.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                return jnp.round(y).astype(x.dtype)
            y = jnp.einsum("oi,li...->lo...", p.astype(x.dtype), x,
                           preferred_element_type=jnp.float32)
            return y.astype(x.dtype)

        def permute_all(cache: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
            perm = jax.nn.one_hot(flat_src, B * K, dtype=jnp.bfloat16)
            if beam_reorder == "nobarrier":
                # A/B knob: unsequenced permutes overlap better but keep
                # every buffer's transient live at once (higher peak HBM)
                return {k: permute_rows(v, perm) for k, v in cache.items()}
            out: Dict[str, jax.Array] = {}
            prev_key = None
            src = perm
            old = dict(cache)
            for key in sorted(cache.keys()):
                if prev_key is not None:
                    done, nxt, src = jax.lax.optimization_barrier(
                        (out[prev_key], old[key], src)
                    )
                    out[prev_key] = done
                    old[key] = nxt
                out[key] = permute_rows(old[key], src)
                prev_key = key
            return out

        if use_ancestry:
            # LAZY reorder: the cache is append-only; only the tiny
            # (B, K, L) ancestry table reorders. Position state.pos-1 was
            # written by this step's decoder_step to each beam's own row
            # (identity); the forked beam k' inherits the full table of
            # its source beam.
            new_cache = state.cache
            ident = jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1)
            )
            anc_ext = jax.lax.dynamic_update_slice(
                state.anc, ident, (0, 0, state.pos - 1)
            )
            new_anc = jnp.take_along_axis(
                anc_ext, live_src[:, :, None], axis=1
            )
        # beams frequently keep their own history (late decode steps in
        # particular) — skip the multi-GB cache permute entirely on those
        # steps. beam_reorder="always" disables the skip (A/B debug knob).
        elif beam_reorder == "always":
            new_cache = permute_all(state.cache)
            new_anc = None
        else:
            is_identity = jnp.all(live_src == jnp.arange(K)[None, :])
            new_cache = jax.lax.cond(
                is_identity, lambda c: c, permute_all, state.cache
            )
            new_anc = None

        return BeamState(
            tokens=tokens, pos=state.pos + 1,
            cache=new_cache,
            sum_logprob=live_score,
            last_tok=next_tok,
            penult_tok=last,
            max_ts_tok=new_max_ts,
            fin_tokens=fin_tokens, fin_scores=fin_scores, fin_count=fin_count,
            present=present,
            anc=new_anc,
        )

    state = expand(state, first_logits)

    def cond(state: BeamState):
        return (~jnp.all(state.fin_count >= C)) & (state.pos < L)

    if use_mega:
        # megakernel step path: the 32-layer stack is ONE pallas call
        # (ops/pallas_decode_layers.py); weights packed once, outside the
        # decode loop. Off-TPU the kernel runs interpreted (tests).
        from whisper_aries_tpu.ops.pallas_decode_layers import (
            pack_layer_weights,
        )

        # fuse is a no-op on the engine's already-fused tree; packing
        # quantises (if needed) + re-refs, once per call (not per step).
        # cross_mega was emitted packed by the precompute scan above.
        wpack = pack_layer_weights(
            W.fuse_decoder_qkv(params)["decoder"]["blocks"])
        mega_interpret = jax.default_backend() != "tpu"

    def body(state: BeamState):
        tok_in = jax.lax.dynamic_slice(
            state.tokens, (0, 0, state.pos - 1), (B, K, 1)
        ).reshape(B * K, 1)
        if use_mega:
            anc_k = state.anc
            if bg > 1:
                # beams of window gw live in kernel slots gw*K + [0, K):
                # offset each window's ancestry values into its slot range
                Ba, Ka, La = anc_k.shape
                anc_k = (anc_k.reshape(Ba // bg, bg, Ka, La)
                         + (jnp.arange(bg, dtype=jnp.int32) * K
                            )[None, :, None, None]
                         ).reshape(Ba // bg, GK, La)
            logits, cache = W.decoder_step_fused(
                params, wpack, tok_in, state.pos - 1,
                state.cache, cross_mega, dims,
                beam_anc=anc_k, beam_k=GK,
                valid_start=prompt_start,
                interpret=mega_interpret,
            )
        else:
            logits, cache = W.decoder_step(
                params, tok_in, state.pos - 1,
                state.cache, cross_kv, dims,
                valid_start=prompt_start,
                beam_anc=state.anc,
                beam_k=K if use_ancestry else None,
            )
        state = state._replace(cache=cache)
        return expand(state, logits[:, 0])

    state = jax.lax.while_loop(cond, body, state)

    # Candidate set: the finished buffer, plus still-live beams only for rows
    # whose buffer never filled (ran out of sample_len) — openai-whisper's
    # finalize() appends eot to unfinished sequences in exactly that case.
    live_ok = (state.fin_count < C)[:, None]
    all_tokens = jnp.concatenate([state.fin_tokens, state.tokens], axis=1)
    all_sum = jnp.concatenate(
        [state.fin_scores, jnp.where(live_ok, state.sum_logprob, NEG_INF)],
        axis=1,
    )  # (B, C+K)
    n_sampled = jnp.sum(
        (all_tokens[:, :, P:] != ids.eot).astype(jnp.int32), axis=2
    )
    lengths = n_sampled.astype(jnp.float32) + 1.0
    final_score = all_sum / (lengths ** length_penalty)
    best = jnp.argmax(final_score, axis=1)  # (B,)

    best_tokens = jnp.take_along_axis(
        all_tokens, best[:, None, None], axis=1
    )[:, 0]
    best_sum = jnp.take_along_axis(all_sum, best[:, None], axis=1)[:, 0]
    best_n = jnp.take_along_axis(n_sampled, best[:, None], axis=1)[:, 0]
    out = {
        "tokens": best_tokens,
        "n_sampled": best_n,
        "sum_logprob": best_sum,
        "avg_logprob": best_sum / (best_n.astype(jnp.float32) + 1.0),
        "no_speech_prob": no_speech_prob,
        "all_tokens": all_tokens,
        "all_scores": final_score,
    }
    return out


def beam_search_decode_sharded(
    mesh,
    params: Dict[str, Any],
    xa: jax.Array,               # (B, Ta, D), B % n_devices == 0
    prompt: jax.Array,           # (B, P)
    dims: W.WhisperDims,
    ids: DecodeSpecialIds,
    suppress_mask: jax.Array,
    sot_index: jax.Array,
    repetition_penalty: Optional[jax.Array] = None,
    prompt_start: Optional[jax.Array] = None,
    row_lang: Optional[jax.Array] = None,
    **static_kw,
) -> Dict[str, jax.Array]:
    """Multi-device beam decode: ONE full decode replica per device via
    ``shard_map`` — the TPU-native version of the reference's
    one-model-replica-per-GPU mapping (complete_fixed_whisper.py:180-186,
    SURVEY §2.4).

    Why not plain GSPMD: the production TPU step is a Pallas megakernel
    (and the beam tail another Pallas program) — opaque custom calls that
    GSPMD cannot partition, so under plain jit a sharded batch would
    gather onto every device and run replicated. Beam decode over windows
    is pure data parallelism (zero cross-window communication), so
    ``shard_map`` over the mesh's first axis is the exact mapping: each
    device runs the whole kernel on its local window shard, XLA inserts
    no collectives, and per-device while-loops stop as soon as their own
    shard finishes.

    ``xa``/``prompt`` (and ``row_lang`` if given) shard on the leading
    batch axis — ``B`` must divide the device count; params, the suppress
    mask and scalar options replicate. ``static_kw`` forwards
    ``beam_size``/``sample_len``/``beam_reorder``/... verbatim to
    :func:`beam_search_decode`.
    """
    from jax.sharding import PartitionSpec as PS

    shard_map = jax.shard_map
    axis = mesh.axis_names[0]

    opt = [("repetition_penalty", repetition_penalty),
           ("prompt_start", prompt_start)]
    extra_names = [n for n, v in opt if v is not None]
    extra_vals = [v for _, v in opt if v is not None]

    def local(params, xa, prompt, suppress_mask, sot_index, *extra):
        kw = dict(zip(extra_names, extra))
        return beam_search_decode(
            params, xa, prompt, dims, ids, suppress_mask, sot_index,
            **kw, **static_kw)

    in_specs = (PS(), PS(axis), PS(axis), PS(), PS())
    in_specs = in_specs + (PS(),) * len(extra_vals)
    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=PS(axis), check_vma=False)
    return fn(params, xa, prompt, suppress_mask, sot_index, *extra_vals)


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("dims", "sot", "lang0", "n_lang"))
def detect_language_batched(
    params: Dict[str, Any], xa: jax.Array, dims: W.WhisperDims,
    sot: int, lang0: int, n_lang: int,
) -> jax.Array:
    """(B, n_lang) language probabilities for EVERY window in the batch
    (faster-whisper's ``multilingual`` per-window detection).

    Uses the teacher-forced decoder_forward on the single <|sot|> token —
    cross-attention reads ``xa`` directly, so no per-layer cross-K/V cache
    is materialised (a bf16 cross-KV precompute at engine batch sizes is
    a multi-GB transient the decode path immediately rebuilds as int8)."""
    B = xa.shape[0]
    prompt = jnp.full((B, 1), sot, jnp.int32)
    logits = W.decoder_forward(params, prompt, xa, dims)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], lang0, n_lang, axis=1
    )
    return jax.nn.softmax(lang_logits, axis=-1)


@functools.partial(jax.jit, static_argnames=("dims", "sot", "lang0", "n_lang"))
def detect_language_ids(
    params: Dict[str, Any], xa: jax.Array, dims: W.WhisperDims,
    sot: int, lang0: int, n_lang: int,
) -> jax.Array:
    """(B,) per-window language TOKEN ids, kept on device.

    The ``multilingual`` engine path injects these straight into the
    device prompt rows — fetching probabilities to host per batch (the
    round-3 _window_languages flow) serialised the double-buffered
    pipeline on a tunnel round-trip; the ids come back to host with the
    decode outputs instead (engine.py dispatch)."""
    probs = detect_language_batched(params, xa, dims, sot, lang0, n_lang)
    return lang0 + jnp.argmax(probs, axis=-1).astype(jnp.int32)


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
