"""Whisper fine-tuning: loss, sharded train step.

The reference is inference-only, but a production framework needs the
training loop for domain adaptation (Arabic meeting vocabulary etc.).
Data-parallel by default: params replicated, batch sharded on the mesh's
``data`` axis; XLA inserts the gradient all-reduce over ICI. The same
jit-with-shardings pattern extends to tensor axes if a future model
outgrows one chip.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_aries_tpu.models import whisper as W


def cross_entropy_loss(
    params: Dict[str, Any],
    mel: jax.Array,          # (B, n_mels, T)
    tokens_in: jax.Array,    # (B, T_txt) decoder input
    tokens_tgt: jax.Array,   # (B, T_txt) shifted targets
    mask: jax.Array,         # (B, T_txt) 1.0 on real positions
    dims: W.WhisperDims,
) -> jax.Array:
    xa = W.encode(params, mel, dims)
    logits = W.decoder_forward(params, tokens_in, xa, dims)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt_lp = jnp.take_along_axis(logprobs, tokens_tgt[..., None], axis=-1)[..., 0]
    return -(tgt_lp * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(
    dims: W.WhisperDims,
    mesh: Mesh,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
):
    """Build (init_opt_state, train_step) with shardings bound to ``mesh``.

    train_step(params, opt_state, batch) -> (params, opt_state, loss);
    batch = {mel, tokens_in, tokens_tgt, mask} sharded on dim 0.
    """
    import optax

    tx = optax.adamw(learning_rate, weight_decay=weight_decay)

    repl = NamedSharding(mesh, P())

    def data_sharding(ndim):
        return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))

    def init_opt_state(params):
        return jax.jit(tx.init, out_shardings=repl)(params)

    @functools.partial(
        jax.jit,
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(
            params, batch["mel"], batch["tokens_in"], batch["tokens_tgt"],
            batch["mask"], dims,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(batch: Dict[str, np.ndarray]):
        return {
            k: jax.device_put(v, data_sharding(np.asarray(v).ndim))
            for k, v in batch.items()
        }

    return init_opt_state, train_step, shard_batch
