"""Draft-token proposal for speculative decode (prompt-lookup / n-gram).

The round-4 probe (scripts/probe_speculative.py, ROADMAP) established the
go-signal mechanics: verifying S drafted tokens in one megakernel step
costs ~1.07-1.09x a single step, so a verified token is ~3.7x cheaper at
S=4 — IF drafts are ~free. Same-model drafting is NOT free here (the
per-window cross-KV stream dominates the step, and a draft step streams
it again), so the only near-zero-cost drafter is PROMPT-LOOKUP / n-gram
reuse of the already-decoded transcript (Saxena 2023 prompt-lookup
decoding; transformers' `prompt_lookup_num_tokens`): find the most
recent earlier occurrence of the last n-gram and propose the tokens that
followed it. Dictated/read speech and meeting transcripts repeat
n-grams constantly; random-weight output does not — so ACCEPTANCE on
this container is ~0 by construction and any bench gain would be fake
(see bench.py's synthetic-acceptance mode, never a headline).

Reference anchor: the N1 CTranslate2 decode loop this accelerates
(final_optimized_transcriber.py:326).

Both implementations are deterministic and unit-tested
(tests/test_drafter.py): a numpy host reference and a jit-friendly jax
version (fixed shapes, no data-dependent control flow) for use inside
the decode loop without host syncs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def ngram_draft_np(tokens: np.ndarray, pos: int, n_draft: int,
                   ngram: int = 2, fallback: int = -1) -> np.ndarray:
    """Host reference. ``tokens`` (L,) int; history is tokens[:pos].

    Finds the LATEST i < pos - ngram with
    tokens[i : i + ngram] == tokens[pos - ngram : pos] and proposes
    tokens[i + ngram : i + ngram + n_draft] (clipped to history; missing
    positions fill with ``fallback``). No match -> all-fallback."""
    out = np.full(n_draft, fallback, dtype=tokens.dtype)
    if pos < ngram + 1:
        return out
    key = tokens[pos - ngram:pos]
    for i in range(pos - ngram - 1, -1, -1):
        if np.array_equal(tokens[i:i + ngram], key):
            src = tokens[i + ngram:min(i + ngram + n_draft, pos)]
            out[:len(src)] = src
            return out
    return out


def _ngram_draft_impl(tokens: jax.Array, pos: jax.Array, n_draft: int,
                      ngram: int, fallback: int) -> jax.Array:
    B, L = tokens.shape
    idx = jnp.arange(L, dtype=jnp.int32)
    # window-compare every start position i against the query n-gram
    key = jax.vmap(
        lambda t: jax.lax.dynamic_slice(t, (pos - ngram,), (ngram,))
    )(tokens)                                             # (B, ngram)
    match = jnp.ones((B, L), bool)
    for k in range(ngram):
        shifted = jnp.roll(tokens, -k, axis=1)            # t[i+k] at col i
        match = match & (shifted == key[:, k:k + 1])
    # valid starts: the whole n-gram inside the history, strictly before
    # the query's own occurrence
    valid = (idx[None, :] + ngram <= pos) & (idx[None, :] < pos - ngram)
    match = match & valid
    # latest match index (or -1)
    best = jnp.max(jnp.where(match, idx[None, :], -1), axis=1)   # (B,)
    has = best >= 0
    gather = best[:, None] + ngram + jnp.arange(n_draft)[None, :]
    in_hist = gather < pos
    draft = jnp.take_along_axis(
        tokens, jnp.clip(gather, 0, L - 1).astype(jnp.int32), axis=1)
    return jnp.where(has[:, None] & in_hist, draft,
                     jnp.int32(fallback)).astype(jnp.int32)


def ngram_draft(tokens: jax.Array, pos: jax.Array, n_draft: int,
                ngram: int = 2, fallback: int = -1) -> jax.Array:
    """jit-friendly batched drafter: ``tokens`` (B, L) int32, ``pos``
    scalar int32 (same decode position for every row — the batched
    engine's windows step in lockstep). Returns (B, n_draft) int32 with
    ``fallback`` marking unusable slots. Matches ``ngram_draft_np`` row
    by row (unit-tested)."""
    return _ngram_draft_impl(tokens, jnp.asarray(pos, jnp.int32),
                             int(n_draft), int(ngram), int(fallback))


_ngram_draft_impl = jax.jit(_ngram_draft_impl, static_argnums=(2, 3, 4))


def acceptance_len(draft: jnp.ndarray, verified: jnp.ndarray
                   ) -> jnp.ndarray:
    """(B,) number of ACCEPTED draft tokens: the longest prefix where
    draft[s] == verified argmax at position s-1's output... concretely:
    verified[:, s] is the model's token AFTER consuming draft[:, s]
    context; acceptance stops at the first s with draft[s] != the
    model's choice given the previous accepted tokens, i.e. the longest
    prefix with draft[:, s] == verified[:, s - 1] (s >= 1), and draft
    [:, 0] is always "accepted input" by construction of the caller
    (it was sampled from the model's previous step). Speculative greedy
    semantics (Leviathan 2022, greedy case)."""
    B, S = draft.shape
    ok = draft[:, 1:] == verified[:, :-1]                  # (B, S-1)
    run = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    return 1 + jnp.sum(run, axis=1)                        # in [1, S]
