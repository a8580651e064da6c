"""Pallas beam-search cache reorder: pure DMA row permutation.

Beam search reorders the self-attention KV cache every step a beam forks:
row ``b*K + o`` of every (L, B*K, H, dh, T) cache buffer must become row
``b*K + live_src[b, o]``. The XLA implementations both pay badly on TPU:

  * ``jnp.take`` (gather) over the row axis measured 53 ms/step (round 2);
  * the round-2 fix — a (B*K, B*K) one-hot PERMUTATION MATMUL — runs the
    bytes through the MXU, but a 120x120 one-hot against the full cache is
    ~150 GFLOP of multiply-by-zero per step, measured 14.2 ms
    (scripts/profile_beam_parts.py) against a ~4 ms HBM roofline for the
    ~5 GB it actually moves.

The permutation is BLOCK-DIAGONAL (beams only ever fork within their own
window — ``live_src`` indexes [0, K)), and a permutation is data movement,
not arithmetic. This kernel does exactly the movement: grid (L, B), each
program DMAs one window's K-row slab into VMEM and writes the rows back in
``live_src`` order — no MXU, no flops, HBM-roofline traffic.

Used by decoding/generate.py's beam_search_decode on TPU (the XLA one-hot
path remains for CPU tests / A-B probes). CTranslate2's decoder does the
same reorder as a batched gather on GPU (reference requirements.txt:9 —
its beam search reorders decoder state per step); this is the TPU-native
equivalent.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("interpret",))
def _permute_leaf(x: jax.Array, src: jax.Array, interpret: bool = False
                  ) -> jax.Array:
    """Reorder rows of one cache leaf.

    x:   (L, B*K, ...) — 3 to 5 trailing dims supported (the row axis is
         axis 1); bf16/f32/int8 all work (no arithmetic is performed).
    src: (B, K) int32, values in [0, K) — out row (b, o) = in row (b, src).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = x.shape[0]
    B, K = src.shape
    assert x.shape[1] == B * K, (x.shape, src.shape)
    rest = x.shape[2:]

    xb = x.reshape((L, B, K) + rest)
    block = (1, 1, K) + rest

    def kernel(src_ref, in_ref, out_ref):
        b = pl.program_id(1)
        for o in range(K):
            out_ref[0, 0, o] = in_ref[0, 0, src_ref[b, o]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[
            # index_map receives the scalar-prefetch ref as a trailing arg
            pl.BlockSpec(block, lambda l, b, src: (l, b, 0) + (0,) * len(rest)),
        ],
        out_specs=pl.BlockSpec(
            block, lambda l, b, src: (l, b, 0) + (0,) * len(rest)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xb.shape, x.dtype),
        interpret=interpret,
    )(src.astype(jnp.int32), xb)
    return out.reshape(x.shape)


def permute_cache_rows(cache: Dict[str, jax.Array], src: jax.Array,
                       interpret: bool = False) -> Dict[str, jax.Array]:
    """Permute every cache buffer's row axis by the per-window map ``src``.

    cache: pytree dict of (L, B*K, ...) buffers (bf16 k/v or the int8
    quantize-on-write quad with f32 scales); src: (B, K) int32 in [0, K).
    """
    return {k: _permute_leaf(v, src, interpret=interpret)
            for k, v in cache.items()}
