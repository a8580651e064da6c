#!/usr/bin/env python
"""Optimized q-attention micro candidates vs the shipped one.

Variants (same resident-VMEM harness as probe_qa_micro.py):

  base    — the micro as shipped (iota mask, full softmax, PV as
            pr x v -> (H, bq, dh), identity transpose, O GEMM)
  vmajor  — PV dot as v x pr -> (H, dh, bq) DIRECTLY (operands swapped,
            contracting the Tp minor of both) — kills the identity
            transpose AND its reshape
  rowmask — vmajor + additive (8, Tp) row mask broadcast instead of the
            (H, bq, Tp) iota build
  latediv — rowmask + softmax normalization moved AFTER the PV dot
            (divide the (H, dh, bq) att by the (H, 1, bq)-aligned sum
            instead of the (H, bq, Tp) probs)
  nolng   — latediv without max-subtraction (exp(lg) raw; unsafe for
            real logits unless bounded — measurement only)

Usage: python scripts/probe_qa_opt.py [reps]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
H, dh, bq, Tp, T, d = 20, 64, 128, 1536, 1500, 1280
NEGF = float(np.finfo(np.float32).min)
dt = jnp.bfloat16


def build(variant):
    def kernel(q_ref, k_ref, v_ref, wo_ref, rmask_ref, o_ref):
        def body(i, c):
            q3 = q_ref[:]                    # (H, dh, bq)
            lg = jax.lax.dot_general(
                q3, k_ref[:],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (H, bq, Tp)
            if variant == "base":
                ci = jax.lax.broadcasted_iota(jnp.int32, (H, bq, Tp), 2)
                lg = jnp.where(ci < T, lg, NEGF)
            else:
                lg = lg + rmask_ref[0:1, :][None]     # (1, 1, Tp) bcast
            if variant == "nolng":
                ex = jnp.exp(lg)
            else:
                mx = jnp.max(lg, -1, keepdims=True)
                ex = jnp.exp(lg - mx)
            sm = jnp.sum(ex, -1, keepdims=True)       # (H, bq, 1)
            if variant in ("latediv", "nolng"):
                pr = ex.astype(dt)
            else:
                pr = (ex / sm).astype(dt)
            if variant == "base":
                att = jax.lax.dot_general(
                    pr, v_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, bq, dh)
                i_b = (jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
                       ).astype(dt)
                attT = jax.lax.dot_general(
                    att.astype(dt), i_b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (H, dh, bq)
            else:
                attT = jax.lax.dot_general(
                    v_ref[:], pr,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, dh, bq)
                if variant in ("latediv", "nolng"):
                    # sm is (H, bq, 1); need (H, 1, bq) to divide attT
                    attT = attT / sm.reshape(H, 1, bq)
            attr = attT.astype(dt).reshape(d, bq)
            of = jax.lax.dot_general(
                wo_ref[:].astype(dt), attr,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (d, bq)
            return c + of[:8, :128] * (i % 3 + 1)

        o_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((8, 128), jnp.float32))

    return kernel


rng = np.random.default_rng(0)
q = jnp.asarray(0.1 * rng.standard_normal((H, dh, bq)), dt)
k = jnp.asarray(0.1 * rng.standard_normal((H, dh, Tp)), dt)
v = jnp.asarray(0.1 * rng.standard_normal((H, dh, Tp)), dt)
wo = jnp.asarray(rng.integers(-127, 127, (d, d)), jnp.int8)
rmask = np.zeros((8, Tp), np.float32)
rmask[:, T:] = NEGF
rmask = jnp.asarray(rmask)

print(f"backend={jax.default_backend()} reps={REPS}", flush=True)
ref = None
for variant in ("base", "vmajor", "rowmask", "latediv", "nolng"):
    f = jax.jit(pl.pallas_call(
        build(variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    ))
    try:
        out = np.asarray(f(q, k, v, wo, rmask))
    except Exception as e:
        print(f"{variant:8}: FAILED {type(e).__name__} {str(e)[:200]}",
              flush=True)
        continue
    if ref is None:
        ref = out
    rel = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(q, k, v, wo, rmask))
        ts.append(time.time() - t0)
    dt_ = min(ts)
    print(f"{variant:8}: {dt_/REPS*1e6:7.1f} us/iter  rel_vs_base={rel:.2e}",
          flush=True)
