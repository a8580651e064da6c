"""int8 quantization tests: scale math, matmul accuracy, Pallas kernel
equivalence (interpret mode on CPU), model-tree conversion, logits parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.models.layers import dense
from whisper_aries_tpu.ops.quant import (
    _quant_matmul_pallas,
    _quant_matmul_xla,
    dequantize_int8,
    quant_matmul,
    quantize_int8,
    quantize_model_params,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (128,)
    back = np.asarray(dequantize_int8(q, s))
    # per-channel absmax scaling: error bounded by scale/2 per element
    col_max = np.abs(w).max(axis=0)
    assert (np.abs(back - w) <= col_max[None, :] / 127.0 * 0.51 + 1e-7).all()


def test_quantize_stacked_layers():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 64, 32)).astype(np.float32) * \
        np.array([1.0, 10.0, 0.1])[:, None, None]
    q, s = quantize_int8(w)
    assert q.shape == (3, 64, 32) and s.shape == (3, 32)
    back = np.asarray(dequantize_int8(q, s))
    rel = np.abs(back - w).max(axis=(1,)) / (np.abs(w).max(axis=(1,)) + 1e-9)
    assert rel.max() < 0.01


def test_quant_matmul_close_to_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    w = rng.standard_normal((256, 128)).astype(np.float32)
    q, s = quantize_int8(w)
    got = np.asarray(quant_matmul(x, q, s))
    want = np.asarray(x) @ w
    denom = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / denom < 0.02


def test_pallas_kernel_matches_xla_fallback():
    rng = np.random.default_rng(3)
    # deliberately awkward sizes to exercise padding
    x = jnp.asarray(rng.standard_normal((5, 300)).astype(np.float32))
    w = rng.standard_normal((300, 130)).astype(np.float32)
    q, s = quantize_int8(w)
    # the kernel computes in bf16 (full-rate MXU path) — compare against the
    # same-precision reference
    wq = (q.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    want = np.asarray(jnp.dot(x.astype(jnp.bfloat16), wq,
                              preferred_element_type=jnp.float32))
    got = np.asarray(_quant_matmul_pallas(x, q, s, block_n=128, block_k=128,
                                          interpret=True))
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.02
    # and both stay close to the f32 ideal
    ideal = np.asarray(_quant_matmul_xla(x, q, s))
    assert np.abs(got - ideal).max() / scale < 0.03


def test_outscale_matches_weight_side_dequant():
    """(x @ q) * s == x @ (q * s) up to bf16 GEMM rounding — the output-
    side dequant (default impl) must agree with the weight-side reference
    AND beat/match its distance to the f32 ideal (int8 values are exact in
    bf16, so outscale sees the unrounded quantized weight)."""
    from whisper_aries_tpu.ops.quant import _quant_matmul_outscale

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((6, 320)).astype(np.float32))
    w = rng.standard_normal((320, 144)).astype(np.float32) * \
        np.exp(rng.standard_normal(144))[None, :]  # wide per-channel range
    q, s = quantize_int8(w)
    got = np.asarray(_quant_matmul_outscale(x, q, s))
    ideal = np.asarray(x) @ np.asarray(dequantize_int8(q, s))
    denom = np.abs(ideal).max(axis=0, keepdims=True) + 1e-9
    # bf16 activation rounding only (~2^-8 relative per element)
    assert (np.abs(got - ideal) / denom).max() < 0.02
    # env-selected default path goes through outscale and matches
    got2 = np.asarray(quant_matmul(x, q, s))
    assert np.allclose(got2, got.astype(np.float32), atol=np.abs(ideal).max() * 0.02)


def test_dense_dispatches_on_quantized_params():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    w = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    q, s = quantize_int8(w)
    full = np.asarray(dense({"w": jnp.asarray(w), "b": jnp.asarray(b)}, x))
    quant = np.asarray(dense({"q": q, "s": s, "b": jnp.asarray(b)}, x))
    assert np.abs(full - quant).max() / (np.abs(full).max() + 1e-9) < 0.02


@pytest.mark.slow
def test_model_quantization_logits_parity():
    """int8-quantized Whisper must produce near-identical logits/argmax."""
    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = W.init_params(dims, key=jax.random.PRNGKey(5))
    qparams = quantize_model_params(params)
    # quantized blocks have int8 leaves
    assert qparams["decoder"]["blocks"]["attn"]["q"]["q"].dtype == jnp.int8
    assert qparams["decoder"]["blocks"]["mlp"]["fc1"]["q"].shape[0] == 2
    # embeddings stay float
    assert qparams["decoder"]["tok_emb"].dtype == params["decoder"]["tok_emb"].dtype

    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.standard_normal((1, 80, 120)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 128, (1, 6)).astype(np.int32))
    full = np.asarray(W.decoder_forward(params, toks, W.encode(params, mel, dims), dims))
    quant = np.asarray(W.decoder_forward(qparams, toks, W.encode(qparams, mel, dims), dims))
    assert full.shape == quant.shape
    scale = np.abs(full).max()
    assert np.abs(full - quant).max() / scale < 0.05
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.8


def test_quantized_decode_runs():
    """KV-cached decode must work with quantized params end to end."""
    from whisper_aries_tpu.decoding import generate as G

    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    qparams = quantize_model_params(W.init_params(dims))
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32))
    xa = W.encode(qparams, mel, dims)
    ids = G.DecodeSpecialIds(
        eot=1, sot=2, no_speech=3, no_timestamps=4, timestamp_begin=120,
        blank=5, n_vocab=128, max_initial_timestamp_index=5,
    )
    out = G.greedy_decode(
        qparams, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), sample_len=6,
    )
    assert np.asarray(out["tokens"]).shape == (2, 7)


# ---------------------------------------------------------------------------
# int8 cross-attention K/V
# ---------------------------------------------------------------------------


def test_kv_quantization_roundtrip():
    from whisper_aries_tpu.ops.pallas_cross_attn import quantize_kv_per_position

    rng = np.random.default_rng(8)
    k = jnp.asarray(rng.standard_normal((2, 3, 50, 16)).astype(np.float32))
    k8, ks = quantize_kv_per_position(k)
    assert k8.shape == (2, 3, 50, 16) and k8.dtype == jnp.int8
    assert ks.shape == (2, 3, 1, 50)
    back = np.asarray(k8, np.float32) * np.swapaxes(np.asarray(ks), -1, -2)
    rel = np.abs(back - np.asarray(k)).max() / np.abs(np.asarray(k)).max()
    assert rel < 0.01


def test_cross_attention_q8_reference_close_to_exact():
    from whisper_aries_tpu.ops.pallas_cross_attn import (
        cross_attention_q8_reference,
        quantize_kv_per_position,
    )

    rng = np.random.default_rng(9)
    B, H, G, T, dh = 2, 4, 5, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, G, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    # exact attention
    logits = np.einsum("bhgd,bhtd->bhgt", np.asarray(q), np.asarray(k)) / np.sqrt(dh)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhgt,bhtd->bhgd", p, np.asarray(v))

    k8, ks = quantize_kv_per_position(k)
    v8, vs = quantize_kv_per_position(v)
    got = np.asarray(cross_attention_q8_reference(
        q, jnp.swapaxes(k8, -1, -2), ks / np.sqrt(dh),
        jnp.swapaxes(v8, -1, -2), vs
    ))
    assert np.abs(got - want).max() / np.abs(want).max() < 0.03


def test_cross_attention_q8_kernel_matches_reference():
    from whisper_aries_tpu.ops.pallas_cross_attn import (
        cross_attention_q8,
        cross_attention_q8_reference,
        quantize_kv_per_position,
    )

    rng = np.random.default_rng(10)
    B, H, G, T, dh = 2, 3, 5, 96, 64
    q = jnp.asarray(rng.standard_normal((B, H, G, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    k8, ks = quantize_kv_per_position(k)
    v8, vs = quantize_kv_per_position(v)
    k8, v8 = jnp.swapaxes(k8, -1, -2), jnp.swapaxes(v8, -1, -2)
    ks = ks / np.sqrt(dh)
    want = np.asarray(cross_attention_q8_reference(q, k8, ks, v8, vs))
    got = np.asarray(cross_attention_q8(q, k8, ks, v8, vs, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_decode_with_kv_int8_close_to_bf16():
    """Full greedy decode with int8 cross-KV: same tokens on a tiny model."""
    from whisper_aries_tpu.decoding import generate as G

    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = W.init_params(dims, key=jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32))
    xa = W.encode(params, mel, dims)
    ids = G.DecodeSpecialIds(
        eot=1, sot=2, no_speech=3, no_timestamps=4, timestamp_begin=120,
        blank=5, n_vocab=128, max_initial_timestamp_index=5,
    )
    kwargs = dict(sample_len=8, with_timestamps=False, suppress_blank=False)
    full = G.greedy_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), **kwargs,
    )
    q8 = G.greedy_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), kv_int8=True, **kwargs,
    )
    assert np.asarray(full["tokens"]).tolist() == np.asarray(q8["tokens"]).tolist()

    beam = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), beam_size=3, kv_int8=True,
        sample_len=8, with_timestamps=False, suppress_blank=False,
    )
    assert np.asarray(beam["tokens"]).shape == (2, 9)


@pytest.mark.slow
def test_decode_with_self_kv_int8_close_to_bf16():
    """Full decode with the int8 SELF-attention cache (quantize-on-write,
    ops/pallas_self_attn.py — the HBM-capacity escape hatch, split from the
    cross-KV knob): same greedy tokens as the bf16 cache on a tiny model."""
    from whisper_aries_tpu.decoding import generate as G

    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=60, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = W.init_params(dims, key=jax.random.PRNGKey(13))
    rng = np.random.default_rng(13)
    mel = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32))
    xa = W.encode(params, mel, dims)
    ids = G.DecodeSpecialIds(
        eot=1, sot=2, no_speech=3, no_timestamps=4, timestamp_begin=120,
        blank=5, n_vocab=128, max_initial_timestamp_index=5,
    )
    kwargs = dict(sample_len=8, with_timestamps=False, suppress_blank=False)
    full = G.greedy_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), **kwargs,
    )
    q8 = G.greedy_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), jnp.float32(0.0),
        jax.random.PRNGKey(0), self_kv_int8=True, **kwargs,
    )
    assert np.asarray(full["tokens"]).tolist() == np.asarray(q8["tokens"]).tolist()

    beam = G.beam_search_decode(
        params, xa, jnp.full((2, 1), 2, jnp.int32), dims, ids,
        jnp.zeros((128,)), jnp.int32(0), beam_size=3, kv_int8=True,
        self_kv_int8=True, sample_len=8, with_timestamps=False,
        suppress_blank=False,
    )
    assert np.asarray(beam["tokens"]).shape == (2, 9)


def test_cross_attention_q8_blocked_matches_reference():
    """Row-blocked kernel (the TPU default after the per-(B,H)-program grid
    measured ~300 us/layer of call overhead) against the XLA reference."""
    from whisper_aries_tpu.ops.pallas_cross_attn import (
        cross_attention_q8_blocked,
        cross_attention_q8_reference,
        quantize_kv_per_position,
    )

    rng = np.random.default_rng(12)
    B, H, G, T, dh = 2, 3, 5, 96, 64
    q = jnp.asarray(rng.standard_normal((B, H, G, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    k8, ks = quantize_kv_per_position(k)
    v8, vs = quantize_kv_per_position(v)
    k8, v8 = jnp.swapaxes(k8, -1, -2), jnp.swapaxes(v8, -1, -2)
    ks = ks / np.sqrt(dh)
    want = np.asarray(cross_attention_q8_reference(q, k8, ks, v8, vs))
    got = np.asarray(cross_attention_q8_blocked(q, k8, ks, v8, vs,
                                                interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_self_attention_q8_blocked_matches_reference():
    """Row-blocked int8 self-attention decode-step kernel vs XLA reference
    (masked, per-position scales)."""
    from whisper_aries_tpu.ops.pallas_self_attn import (
        self_attention_q8_step,
        self_attention_q8_reference,
    )
    from whisper_aries_tpu.ops.pallas_cross_attn import (
        quantize_kv_per_position,
    )

    rng = np.random.default_rng(13)
    B, H, T, dh = 4, 2, 48, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32))
    k8, ks = quantize_kv_per_position(k)
    v8, vs = quantize_kv_per_position(v)
    k8, v8 = jnp.swapaxes(k8, -1, -2), jnp.swapaxes(v8, -1, -2)
    ks = ks / np.sqrt(dh)
    mask = jnp.where(jnp.arange(T) < 30, 0.0, float(np.finfo(np.float32).min)
                     ).reshape(1, 1, 1, T).astype(np.float32)
    want = np.asarray(self_attention_q8_reference(q, k8, ks, v8, vs, mask))
    got = np.asarray(self_attention_q8_step(q, k8, ks, v8, vs, mask,
                                            interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
