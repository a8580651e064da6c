"""Prompt-lookup / n-gram drafter (decoding/drafter.py) — deterministic
unit tests + np/jax implementation equivalence."""

import numpy as np

import jax.numpy as jnp

from whisper_aries_tpu.decoding.drafter import (
    acceptance_len,
    ngram_draft,
    ngram_draft_np,
)


def test_np_basic_repeat():
    #            0  1  2  3  4  5  6  7
    t = np.array([5, 6, 7, 8, 9, 5, 6, 0], np.int32)
    # history = t[:7]; last bigram (5, 6) occurred at 0 -> propose 7, 8, 9
    d = ngram_draft_np(t, pos=7, n_draft=3, ngram=2)
    assert d.tolist() == [7, 8, 9]


def test_np_latest_match_wins():
    t = np.array([1, 2, 3, 1, 2, 4, 9, 1, 2, 0, 0], np.int32)
    # bigram (1,2) at 0 (-> 3) and at 3 (-> 4); latest match (3) wins
    d = ngram_draft_np(t, pos=9, n_draft=2, ngram=2)
    assert d.tolist() == [4, 9]


def test_np_no_match_fallback():
    t = np.array([1, 2, 3, 4, 5], np.int32)
    d = ngram_draft_np(t, pos=5, n_draft=3, ngram=2, fallback=-1)
    assert d.tolist() == [-1, -1, -1]


def test_np_short_history():
    t = np.array([1, 2], np.int32)
    assert ngram_draft_np(t, pos=2, n_draft=2, ngram=2).tolist() == [-1, -1]


def test_np_draft_clipped_to_history():
    t = np.array([7, 8, 1, 7, 8, 0], np.int32)
    # match at 0 -> following tokens are 1, 7, 8... but only within
    # history (pos=5): 1, 7, 8 all < pos, then clipped
    d = ngram_draft_np(t, pos=5, n_draft=4, ngram=2)
    assert d.tolist() == [1, 7, 8, -1]


def test_jax_matches_np_random():
    rng = np.random.default_rng(0)
    B, L = 8, 64
    # small alphabet -> plenty of repeated n-grams
    toks = rng.integers(0, 6, (B, L)).astype(np.int32)
    for pos in (5, 17, 40, 63):
        for ngram in (2, 3):
            got = np.asarray(ngram_draft(jnp.asarray(toks), pos,
                                         n_draft=4, ngram=ngram))
            want = np.stack([
                ngram_draft_np(toks[b], pos, 4, ngram=ngram)
                for b in range(B)
            ])
            np.testing.assert_array_equal(got, want)


def test_acceptance_len():
    draft = jnp.asarray([[10, 11, 12, 13],
                         [10, 11, 99, 13],
                         [10, 99, 12, 13]], jnp.int32)
    # model's verified outputs AFTER consuming each draft token
    verified = jnp.asarray([[11, 12, 13, 14],
                            [11, 98, 13, 14],
                            [55, 12, 13, 14]], jnp.int32)
    # row 0: full accept (4); row 1: draft[2]=99 != verified[1]=98 -> 2;
    # row 2: draft[1]=99 != verified[0]=55 -> 1
    assert np.asarray(acceptance_len(draft, verified)).tolist() == [4, 2, 1]
