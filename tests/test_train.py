"""Training-step + checkpointing tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.parallel.mesh import make_mesh, replicate_params
from whisper_aries_tpu.pipeline.train import cross_entropy_loss, make_train_step


@pytest.fixture  # function-scoped: train_step donates (consumes) params
def tiny_setup():
    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    mesh = make_mesh()
    params = replicate_params(W.init_params(dims), mesh)
    rng = np.random.default_rng(0)
    B = 2 * int(np.prod(mesh.devices.shape))
    batch = {
        "mel": rng.standard_normal((B, 80, 96)).astype(np.float32),
        "tokens_in": rng.integers(0, 128, (B, 8)).astype(np.int32),
        "tokens_tgt": rng.integers(0, 128, (B, 8)).astype(np.int32),
        "mask": np.ones((B, 8), np.float32),
    }
    return dims, mesh, params, batch


@pytest.mark.slow
def test_train_step_reduces_loss(tiny_setup):
    dims, mesh, params, batch = tiny_setup
    init_opt, train_step, shard = make_train_step(dims, mesh,
                                                  learning_rate=1e-3)
    opt_state = init_opt(params)
    sharded = shard(batch)
    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(params, opt_state, sharded)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_loss_masking(tiny_setup):
    dims, mesh, params, batch = tiny_setup
    full = float(cross_entropy_loss(
        params, jnp.asarray(batch["mel"]), jnp.asarray(batch["tokens_in"]),
        jnp.asarray(batch["tokens_tgt"]), jnp.asarray(batch["mask"]), dims,
    ))
    # zero mask on half the positions changes the mean
    m2 = batch["mask"].copy()
    m2[:, 4:] = 0.0
    half = float(cross_entropy_loss(
        params, jnp.asarray(batch["mel"]), jnp.asarray(batch["tokens_in"]),
        jnp.asarray(batch["tokens_tgt"]), jnp.asarray(m2), dims,
    ))
    assert full != half
    assert np.isfinite(half)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    from whisper_aries_tpu.pipeline.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    dims, mesh, params, _ = tiny_setup
    path = save_train_state(str(tmp_path), 42, params)
    assert "step_00000042" in path
    step, state = restore_train_state(str(tmp_path))
    assert step == 42
    orig = jax.tree.leaves(params)
    rest = jax.tree.leaves(state["params"])
    assert len(orig) == len(rest)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_safetensors(tmp_path, tiny_setup):
    from safetensors.numpy import load_file

    from whisper_aries_tpu.pipeline.checkpoint import export_params_safetensors

    dims, mesh, params, _ = tiny_setup
    p = str(tmp_path / "model.safetensors")
    export_params_safetensors(jax.device_get(params), p)
    flat = load_file(p)
    assert "decoder.tok_emb" in flat
    assert any(k.startswith("encoder.blocks.") for k in flat)


def test_auto_windows_per_device():
    from whisper_aries_tpu.parallel.mesh import auto_windows_per_device

    # XLA-step regime (mega=False; also the CPU-backend default): 16GB at
    # beam 5 / 100 tokens -> around the measured batch-24 throughput knee
    # (honest-bench sweep; above 24 the XLA schedule flips and halves)
    n = auto_windows_per_device("large-v3", beam_size=5, sample_len=100,
                                hbm_bytes=16 * 1024**3, mega=False)
    assert 20 <= n <= 28 and n % 4 == 0
    # the full 224-token budget costs more cache -> fewer windows
    n224 = auto_windows_per_device("large-v3", beam_size=5,
                                   hbm_bytes=16 * 1024**3, mega=False)
    assert 10 <= n224 < n
    # megakernel regime: no row-tile cliff — sized to the measured int8
    # self-cache capacity (48 @ beam 5 / 100 tokens in 16 GB)
    nm = auto_windows_per_device("large-v3", beam_size=5, sample_len=100,
                                 hbm_bytes=16 * 1024**3, mega=True)
    assert nm == 48
    # 224-token budget -> bigger cache minor -> fewer windows; bf16
    # self-cache -> fewer still
    nm224 = auto_windows_per_device("large-v3", beam_size=5,
                                    hbm_bytes=16 * 1024**3, mega=True)
    assert 28 <= nm224 < nm
    nmb = auto_windows_per_device("large-v3", beam_size=5, sample_len=100,
                                  hbm_bytes=16 * 1024**3, mega=True,
                                  self_kv_int8=False)
    assert nmb < nm
    # tiny model fits far more (clamped at 56)
    assert auto_windows_per_device("tiny", 1, hbm_bytes=16 * 1024**3) == 56
    # small memory -> clamped at 1
    assert auto_windows_per_device("large-v3", 5, hbm_bytes=6 * 1024**3) >= 1
