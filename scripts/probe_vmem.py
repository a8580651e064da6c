#!/usr/bin/env python
"""Probe: does the axon tunnel accept a raised Pallas VMEM limit?

CLAUDE.md records a 16 MB scoped-VMEM limit on Pallas kernels. If that
is just the compiler DEFAULT (raisable per-kernel via
pltpu.CompilerParams(vmem_limit_bytes=...)) rather than a hard tunnel
policy, the megakernel can hold much larger streaming buffers (whole
cross-KV windows, packed full-M self slabs) and cut its DMA count by
another ~3x. Tries scratch sizes 8/24/48/96 MB.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_size(mb: int) -> None:
    rows = mb * 1024 * 1024 // (8192 * 2)
    src = jnp.ones((rows, 8192), jnp.bfloat16)

    def kernel(src_ref, out_ref, big, sem):
        dma = pltpu.make_async_copy(src_ref, big, sem)
        dma.start()
        dma.wait()
        out_ref[:] = jnp.sum(big[0:1, 0:128].astype(jnp.float32),
                             axis=1, keepdims=True)

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, 8192), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )
    t0 = time.time()
    try:
        out = np.asarray(jax.jit(fn)(src))
        print(f"{mb:4d} MB scratch: OK ({time.time()-t0:.0f}s, "
              f"sum={out[0,0]:.0f})", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{mb:4d} MB scratch: FAIL ({time.time()-t0:.0f}s) {msg}",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    for mb in (8, 24, 48, 96):
        try_size(mb)
