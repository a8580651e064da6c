"""Parity tests for the fused beam-expansion tail kernel
(ops/pallas_beam_tail.py) against expand()'s verbatim XLA math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.ops.pallas_beam_tail import beam_tail

V = 1000
IDS = G.DecodeSpecialIds(
    eot=800, sot=801, no_speech=806, no_timestamps=807,
    timestamp_begin=808, blank=220, n_vocab=V,
    max_initial_timestamp_index=50,
)


def xla_tail(logits_flat, sum_lp, last, pen, mts, suppress, is_first,
             B, K, with_timestamps=True, suppress_blank=True):
    """expand()'s logits->selection segment, verbatim semantics."""
    f = G._apply_filters(
        logits_flat, IDS, suppress, is_first,
        last.reshape(-1), pen.reshape(-1), mts.reshape(-1),
        with_timestamps, suppress_blank,
    )
    logprobs = jax.nn.log_softmax(f, axis=-1).reshape(B, K, V)
    total = sum_lp[:, :, None] + logprobs
    eot_scores = total[:, :, IDS.eot]
    flat = total.at[:, :, IDS.eot].set(G.NEG_INF).reshape(B, K * V)
    live_score, top_idx = G._top_k_unrolled(flat, K)
    return live_score, top_idx, eot_scores


def run_kernel(logits_flat, sum_lp, last, pen, mts, suppress, is_first,
               K, with_timestamps=True, suppress_blank=True):
    return beam_tail(
        logits_flat, sum_lp, last, pen, mts, suppress,
        jnp.asarray(is_first), K=K, tsb=IDS.timestamp_begin, eot=IDS.eot,
        blank=IDS.blank, no_ts=IDS.no_timestamps,
        init_cap=IDS.timestamp_begin + IDS.max_initial_timestamp_index,
        with_timestamps=with_timestamps, suppress_blank=suppress_blank,
        interpret=jax.default_backend() != "tpu",
    )


def _mk_state(rng, B, K, ts_mix=True):
    """Beam state hitting every grammar branch: fresh rows, open-pair
    rows (last=ts), closed-pair rows (last+penult=ts), rows with a
    monotonic floor, and dead beams (NEG_INF scores)."""
    tsb = IDS.timestamp_begin
    logits = jnp.asarray(
        rng.standard_normal((B * K, V)).astype(np.float32)) * 3.0
    sum_lp = jnp.asarray(
        np.where(rng.random((B, K)) < 0.2, G.NEG_INF,
                 rng.standard_normal((B, K)) * 2.0).astype(np.float32))
    if ts_mix:
        last = jnp.asarray(rng.choice(
            [100, 221, tsb + 3, tsb + 40], (B, K)).astype(np.int32))
        pen = jnp.asarray(rng.choice(
            [-1, 50, tsb + 2, tsb + 39], (B, K)).astype(np.int32))
        mts = jnp.asarray(rng.choice(
            [-1, tsb + 5, tsb + 90], (B, K)).astype(np.int32))
    else:
        last = jnp.full((B, K), 100, jnp.int32)
        pen = jnp.full((B, K), -1, jnp.int32)
        mts = jnp.full((B, K), -1, jnp.int32)
    return logits, sum_lp, last, pen, mts


@pytest.mark.parametrize("with_timestamps", [True, False])
@pytest.mark.parametrize("is_first", [False, True])
def test_beam_tail_kernel_matches_xla(with_timestamps, is_first):
    B, K = 3, 4
    rng = np.random.default_rng(11)
    logits, sum_lp, last, pen, mts = _mk_state(rng, B, K)
    suppress = jnp.asarray(
        np.where(rng.random(V) < 0.01, G.NEG_INF, 0.0).astype(np.float32))
    ref = xla_tail(logits, sum_lp, last, pen, mts, suppress,
                   jnp.bool_(is_first), B, K, with_timestamps)
    got = run_kernel(logits, sum_lp, last, pen, mts, suppress,
                     is_first, K, with_timestamps)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-6, atol=1e-6)


def test_beam_tail_kernel_no_suppress_blank():
    B, K = 2, 5
    rng = np.random.default_rng(3)
    logits, sum_lp, last, pen, mts = _mk_state(rng, B, K, ts_mix=False)
    suppress = jnp.zeros((V,), jnp.float32)
    ref = xla_tail(logits, sum_lp, last, pen, mts, suppress,
                   jnp.bool_(True), B, K, True, suppress_blank=False)
    got = run_kernel(logits, sum_lp, last, pen, mts, suppress,
                     True, K, True, suppress_blank=False)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)


def test_beam_tail_tie_resolution():
    """Duplicate maxima must resolve to the LOWEST flat k*V+v index,
    matching _top_k_unrolled's argmax-first semantics."""
    B, K = 1, 3
    logits = jnp.zeros((B * K, V), jnp.float32)  # all ties
    sum_lp = jnp.zeros((B, K), jnp.float32)
    last = jnp.full((B, K), 100, jnp.int32)
    pen = jnp.full((B, K), -1, jnp.int32)
    mts = jnp.full((B, K), -1, jnp.int32)
    suppress = jnp.zeros((V,), jnp.float32)
    ref = xla_tail(logits, sum_lp, last, pen, mts, suppress,
                   jnp.bool_(False), B, K, False)
    got = run_kernel(logits, sum_lp, last, pen, mts, suppress,
                     False, K, False)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
