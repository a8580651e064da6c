#!/usr/bin/env python
"""Bisect the Mosaic SIGABRT in the optimized qa micro.

The phase profiler crashed in ApplyVectorLayoutPass (vector_extract_slice
inside scf.if, 'limits 16 vs dim 1') after the qa micro gained (a) a
computed (8,Tp)-iota row mask sliced to (1,1,Tp), and (b) the late
divide att*(1/sm). Variants isolate each inside a pl.when (the micro
runs inside one in the real kernel — the scf.if in the crash):

  iotamask — computed iota mask add, in-probs divide (isolates (a))
  refmask  — mask add from a VMEM ref slice (decode's cmask pattern)
  latediv  — original iota where-mask + att*(1/sm) (isolates (b))
  latediv2 — original iota where-mask + att/sm (divide form)
  target   — refmask + latediv (what the kernel wants)

Usage: python scripts/probe_qa_bisect.py [reps]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
H, dh, bq, Tp, T, d = 20, 64, 128, 1536, 1500, 1280
NEGF = float(np.finfo(np.float32).min)
dt = jnp.bfloat16


def build(variant):
    def kernel(q_ref, k_ref, v_ref, wo_ref, rmask_ref, o_ref):
        o_ref[:] = jnp.zeros((8, 128), jnp.float32)

        def body(i, c):
            @pl.when(i >= 0)   # force an scf.if region like the micro's
            def _():
                q3 = q_ref[:]                    # (H, dh, bq)
                lg = jax.lax.dot_general(
                    q3, k_ref[:],
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # (H, bq, Tp)
                if variant == "iotamask":
                    rm = jnp.where(
                        jax.lax.broadcasted_iota(
                            jnp.int32, (8, Tp), 1) < T, 0.0, NEGF)
                    lg = lg + rm[0:1, :][None]
                elif variant in ("refmask", "target"):
                    lg = lg + rmask_ref[0:1, :][None]
                else:
                    ci = jax.lax.broadcasted_iota(jnp.int32, (H, bq, Tp), 2)
                    lg = jnp.where(ci < T, lg, NEGF)
                mx = jnp.max(lg, -1, keepdims=True)
                ex = jnp.exp(lg - mx)
                sm = jnp.sum(ex, -1, keepdims=True)
                if variant in ("latediv", "latediv2", "target"):
                    pr = ex.astype(dt)
                else:
                    pr = (ex / sm).astype(dt)
                att = jax.lax.dot_general(
                    pr, v_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, bq, dh)
                if variant in ("latediv", "target"):
                    att = att * (1.0 / sm)
                elif variant == "latediv2":
                    att = att / sm
                i_b = (jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
                       ).astype(dt)
                attT = jax.lax.dot_general(
                    att.astype(dt), i_b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (H, dh, bq)
                attr = attT.astype(dt).reshape(d, bq)
                of = jax.lax.dot_general(
                    wo_ref[:].astype(dt), attr,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (d, bq)
                o_ref[:] = o_ref[:] + of[:8, :128] * (i % 3 + 1)

            return c

        jax.lax.fori_loop(0, REPS, body, 0)

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
for variant in ("base", "iotamask", "refmask", "latediv", "latediv2",
                "target"):
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
        print(f"{variant:9}: FAILED {type(e).__name__} {str(e)[:120]}",
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
    print(f"{variant:9}: {dt_/REPS*1e6:7.1f} us/iter rel_vs_base={rel:.2e}",
          flush=True)
