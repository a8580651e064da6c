"""Whisper model parity tests against HuggingFace transformers (torch CPU).

Strategy: random-initialise a *tiny* torch WhisperForConditionalGeneration,
convert its state dict with convert_hf_state_dict, and require logits parity.
This validates the whole JAX architecture (convs, pos embeddings, attention,
layer norms, weight tying) without needing downloaded checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_aries_tpu.models import whisper as W


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=207,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=120,  # short audio ctx for fast tests
        max_target_positions=48,
        pad_token_id=0,  # defaults point at 50256 which exceeds the tiny vocab
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg).eval()
    dims = W.dims_from_hf_config(cfg)
    params = W.convert_hf_state_dict(model.state_dict(), dims)
    return model, dims, params


@pytest.fixture(scope="module")
def mel_and_tokens(tiny_pair):
    _, dims, _ = tiny_pair
    rng = np.random.default_rng(1)
    # encoder downsamples 2x: input frames = 2 * n_audio_ctx
    mel = rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)).astype(np.float32)
    toks = rng.integers(0, dims.n_vocab, size=(2, 7)).astype(np.int32)
    return mel, toks


def test_encoder_parity(tiny_pair, mel_and_tokens):
    import torch

    model, dims, params = tiny_pair
    mel, _ = mel_and_tokens
    with torch.no_grad():
        want = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(W.encode(params, jnp.asarray(mel), dims))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_decoder_logits_parity(tiny_pair, mel_and_tokens):
    import torch

    model, dims, params = tiny_pair
    mel, toks = mel_and_tokens
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks.astype(np.int64)),
        )
        want = out.logits.numpy()
    xa = W.encode(params, jnp.asarray(mel), dims)
    got = np.asarray(W.decoder_forward(params, jnp.asarray(toks), xa, dims))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-3)
    # argmax agreement everywhere (the decisive property for decoding)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.99


def test_incremental_decode_matches_full_forward(tiny_pair, mel_and_tokens):
    """KV-cached stepping must reproduce the teacher-forced logits."""
    _, dims, params = tiny_pair
    mel, toks = mel_and_tokens
    xa = W.encode(params, jnp.asarray(mel), dims)
    full = np.asarray(W.decoder_forward(params, jnp.asarray(toks), xa, dims))

    cross_kv = W.precompute_cross_kv(params, xa, dims)
    cache = W.init_kv_cache(dims, batch=2)
    step_logits = []
    for t in range(toks.shape[1]):
        logits, cache = W.decoder_step(
            params, jnp.asarray(toks[:, t : t + 1]), jnp.int32(t), cache,
            cross_kv, dims,
        )
        step_logits.append(np.asarray(logits)[:, 0])
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, full, atol=8e-3, rtol=2e-3)


def test_prompt_chunk_then_step(tiny_pair, mel_and_tokens):
    """Multi-token prefill followed by single-token steps must agree with
    teacher forcing (this is the path beam search uses)."""
    _, dims, params = tiny_pair
    mel, toks = mel_and_tokens
    xa = W.encode(params, jnp.asarray(mel), dims)
    full = np.asarray(W.decoder_forward(params, jnp.asarray(toks), xa, dims))

    cross_kv = W.precompute_cross_kv(params, xa, dims)
    cache = W.init_kv_cache(dims, batch=2)
    k = 4  # prefill length
    logits_p, cache = W.decoder_step(
        params, jnp.asarray(toks[:, :k]), jnp.int32(0), cache, cross_kv, dims
    )
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :k], atol=8e-3, rtol=2e-3)
    for t in range(k, toks.shape[1]):
        logits, cache = W.decoder_step(
            params, jnp.asarray(toks[:, t : t + 1]), jnp.int32(t), cache,
            cross_kv, dims,
        )
        np.testing.assert_allclose(
            np.asarray(logits)[:, 0], full[:, t], atol=8e-3, rtol=2e-3
        )


def test_cross_qk_shapes(tiny_pair, mel_and_tokens):
    _, dims, params = tiny_pair
    mel, toks = mel_and_tokens
    xa = W.encode(params, jnp.asarray(mel), dims)
    logits, cqk = W.decoder_forward(
        params, jnp.asarray(toks), xa, dims, return_cross_qk=True
    )
    assert logits.shape == (2, toks.shape[1], dims.n_vocab)
    assert cqk.shape == (
        dims.n_text_layer, 2, dims.n_text_head, toks.shape[1], dims.n_audio_ctx
    )


def test_init_params_shapes():
    dims = W.PRESETS["tiny"]
    params = W.init_params(dims)
    assert params["decoder"]["tok_emb"].shape == (51865, 384)
    assert params["encoder"]["blocks"]["attn"]["q"]["w"].shape == (4, 384, 384)
    assert params["encoder"]["conv1"]["w"].shape == (384, 80, 3)


def test_presets_sanity():
    assert W.PRESETS["large-v3"].n_mels == 128
    assert W.PRESETS["large-v3"].n_vocab == 51866
    assert W.PRESETS["large-v3-turbo"].n_text_layer == 4
    assert W.PRESETS["small"].n_audio_state == 768


@pytest.mark.slow
def test_fused_decoder_qkv_bit_exact():
    """fuse_decoder_qkv concatenates the decoder self-attention q/k/v into
    one GEMM; decode steps and teacher-forced logits must match the
    unfused tree exactly (same dot products, regrouped)."""
    import jax
    import jax.numpy as jnp

    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=96, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = W.init_params(dims, key=jax.random.PRNGKey(3), dtype=jnp.float32)
    fused = W.fuse_decoder_qkv(params)
    assert "qkv" in fused["decoder"]["blocks"]["attn"]
    assert "q" not in fused["decoder"]["blocks"]["attn"]

    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32))
    xa = W.encode(params, mel, dims)
    tokens = jnp.asarray(rng.integers(0, 90, (2, 7)).astype(np.int32))

    lf = W.decoder_forward(params, tokens, xa, dims)
    lg = W.decoder_forward(fused, tokens, xa, dims)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lg),
                               rtol=1e-6, atol=1e-6)

    ckv = W.precompute_cross_kv(params, xa, dims)
    cache = W.init_kv_cache(dims, 2, dtype=jnp.float32, max_len=10)
    l1, c1 = W.decoder_step(params, tokens[:, :3], jnp.int32(0), cache, ckv, dims)
    l2, c2 = W.decoder_step(fused, tokens[:, :3], jnp.int32(0), cache, ckv, dims)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(c1), jax.tree_util.tree_leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
