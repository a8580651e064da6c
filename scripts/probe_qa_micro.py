#!/usr/bin/env python
"""What makes the encoder megakernel's q-attention micro cost 93.7 us?

Replicates the qa micro's shapes (large-v3: H=20, dh=64, bq=128,
Tp=1536) on resident VMEM operands and times variants:

  full    — the micro as written (QK dot, iota mask, softmax, PV dot,
            identity transpose, O GEMM)
  nomask  — softmax without the iota mask build (additive row mask)
  nosm    — dots only (lg -> bf16 straight to PV; no mask/softmax)
  smonly  — mask+softmax only on a resident f32 buffer (no dots)
  qk      — QK dot only
  perhead — full, but QK/PV as H unrolled 2D dots instead of batched 3D

Usage: python scripts/probe_qa_micro.py [reps]
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
from whisper_aries_tpu.ops.pallas_decode_layers import _erf_as  # noqa

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
H, dh, bq, Tp, T, d = 20, 64, 128, 1536, 1500, 1280
NEGF = float(np.finfo(np.float32).min)
dt = jnp.bfloat16


def build(variant):
    def kernel(q_ref, k_ref, v_ref, wo_ref, lgbuf, o_ref):
        def body(i, c):
            q3 = q_ref[:]                    # (H, dh, bq)
            if variant in ("smonly",):
                lg = lgbuf[:]
            else:
                if variant == "perhead":
                    lgs = []
                    for h in range(H):
                        lgs.append(jax.lax.dot_general(
                            q3[h], k_ref[h],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    lg = jnp.stack(lgs)       # (H, bq, Tp)
                else:
                    lg = jax.lax.dot_general(
                        q3, k_ref[:],
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
            if variant == "qk":
                return c + lg[:1, :8, :128].reshape(8, 128) * (i % 3 + 1)
            if variant == "nosm":
                pr = (lg * 1e-3).astype(dt)
            else:
                if variant == "nomask":
                    lg = lg + jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (8, Tp), 1)
                        < T, 0.0, NEGF)[:1]  # (1, Tp) row broadcast
                else:
                    ci = jax.lax.broadcasted_iota(
                        jnp.int32, (H, bq, Tp), 2)
                    lg = jnp.where(ci < T, lg, NEGF)
                mx = jnp.max(lg, -1, keepdims=True)
                ex = jnp.exp(lg - mx)
                pr = (ex / jnp.sum(ex, -1, keepdims=True)).astype(dt)
            if variant == "smonly":
                return c + pr[:1, :8, :128].reshape(8, 128).astype(
                    jnp.float32) * (i % 3 + 1)
            att = jax.lax.dot_general(
                pr, v_ref[:],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (H, bq, dh)
            i_b = (jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
                   ).astype(dt)
            attT = jax.lax.dot_general(
                att.astype(dt), i_b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (H, dh, bq)
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
lgb = jnp.asarray(rng.standard_normal((H, bq, Tp)), jnp.float32)

print(f"backend={jax.default_backend()} reps={REPS}", flush=True)
for variant in ("full", "nomask", "nosm", "smonly", "qk", "perhead"):
    f = jax.jit(pl.pallas_call(
        build(variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    ))
    try:
        np.asarray(f(q, k, v, wo, lgb))
    except Exception as e:
        print(f"{variant:8}: FAILED {type(e).__name__} {str(e)[:200]}",
              flush=True)
        continue
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(q, k, v, wo, lgb))
        ts.append(time.time() - t0)
    dt_ = min(ts)
    print(f"{variant:8}: {dt_/REPS*1e6:7.1f} us/iter", flush=True)
