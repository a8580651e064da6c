"""Parity tests for the fused all-layers encoder megakernel.

Anchors (same scheme as the decode megakernel's tests in test_decode.py):
  * the jnp reference `fused_encoder_layers_reference` documents the
    kernel math exactly, so kernel-in-interpret-mode vs reference is an
    EXACT comparison;
  * the reference (int8 weights) vs the bf16 XLA encoder
    (models/whisper.encode) is a loose comparison bounded by int8
    quantization error — the same contract CTranslate2's int8 encoder
    has with its fp checkpoint (reference README.md:178, SURVEY.md N1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.ops.pallas_encoder_layers import (
    enc_micro_counts,
    encode_post,
    encode_pre,
    fused_encoder_layers,
    fused_encoder_layers_reference,
    pack_encoder_weights,
)

# tiny config — dh MUST be 64 (the pack folds whisper's universal
# dh**-0.5 q scaling with dh=64, like every published checkpoint)
D, H, LE, FF = 128, 2, 2, 512
NE, TP, T = 2, 256, 200


@pytest.fixture(scope="module")
def enc_setup():
    key = jax.random.PRNGKey(7)
    blocks = W._blocks_init(key, LE, D, jnp.bfloat16, cross=False)
    pack = pack_encoder_weights(blocks)
    kx = jax.random.PRNGKey(3)
    xeT = (0.5 * jax.random.normal(kx, (NE, D, TP))).astype(jnp.bfloat16)
    # pad frames must be zero on input (kernel writes them back through
    # the residual; values there are don't-care but keep them finite)
    xeT = xeT.at[:, :, T:].set(0)
    return blocks, pack, xeT


def _xla_mid_layers(blocks, xeT):
    """The bf16 XLA encoder mid-section (pre-LN blocks, no stem/ln_post)
    on the transposed-layout input, via models/whisper's own block math."""
    from whisper_aries_tpu.models.layers import dense, gelu, layer_norm

    x = xeT[:, :, :T].transpose(0, 2, 1)  # (Ne, T, d)

    def block(x, p):
        h = layer_norm(p["ln1"], x)
        q = W._split_heads(dense(p["attn"]["q"], h), H)
        k = W._split_heads(dense(p["attn"]["k"], h), H)
        v = W._split_heads(dense(p["attn"]["v"], h), H)
        att = W._attention_xla(q, k, v)
        x = x + dense(p["attn"]["o"], W._merge_heads(att).astype(x.dtype))
        h = layer_norm(p["ln2"], x)
        x = x + dense(p["mlp"]["fc2"], gelu(dense(p["mlp"]["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(block, x, blocks)
    return x  # (Ne, T, d)


def test_pack_shapes(enc_setup):
    _, pack, _ = enc_setup
    assert pack["wqkvo8"].shape == (LE, D, 4 * D)
    assert pack["wqkvo8"].dtype == jnp.int8
    assert pack["wf18"].shape == (LE, D, FF)
    assert pack["wf28"].shape == (LE, FF, D)
    assert pack["vecsT"].shape == (LE, FF, 128)


def test_reference_vs_xla_encoder(enc_setup):
    """int8 reference vs bf16 XLA mid-section: bounded by quant error."""
    blocks, pack, xeT = enc_setup
    ref = fused_encoder_layers_reference(xeT, pack, H, T)
    ref_rows = np.asarray(ref[:, :, :T].transpose(0, 2, 1), np.float32)
    xla_rows = np.asarray(_xla_mid_layers(blocks, xeT), np.float32)
    scale = max(1.0, float(np.abs(xla_rows).max()))
    err = np.abs(ref_rows - xla_rows).max() / scale
    assert err < 0.08, f"relative error {err}"


def _assert_bitexact_mod_ulp(got, want, min_exact=0.99):
    """Bit-equal except for 1-bf16-ulp-at-tensor-scale flips.

    XLA CPU computes exp/reciprocal by different codepaths inside the
    one big traced interpret program than in the eager op-by-op
    reference, shifting f32 values by ~1 ulp before the bf16 rounding.
    The late-divide softmax (normalisation AFTER the PV dot) broadcasts
    one row's exp-sum rounding to all dh outputs, so flips are ~0.7% of
    elements (they were 1 in 51200 with the in-probs divide) — and the
    residual add can cancel, so RELATIVE error at near-zero outputs is
    unbounded while ABSOLUTE error stays <= 1 bf16 ulp at tensor scale.
    Anything structural (mask, block schedule, stale slab) errs at full
    tensor scale across whole blocks, which this still catches."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    exact = np.mean(g == w)
    assert exact >= min_exact, f"only {exact:.4%} bit-equal"
    scale = max(1.0, float(np.abs(w).max()))
    np.testing.assert_allclose(g, w, atol=2 ** -7 * scale)


def test_kernel_interpret_exact_vs_reference(enc_setup):
    _, pack, xeT = enc_setup
    want = fused_encoder_layers_reference(xeT, pack, H, T)
    got = fused_encoder_layers(xeT, pack, H, T, interpret=True)
    # pad columns [T:] are garbage in both (residual of don't-care
    # inputs) — compare the real frames only
    _assert_bitexact_mod_ulp(got[:, :, :T], want[:, :, :T])


def test_kernel_cursor_split(enc_setup):
    """Two calls split at a window-layer boundary == one full call."""
    _, pack, xeT = enc_setup
    per_wl, n_micros = enc_micro_counts(NE, LE, TP)
    full = fused_encoder_layers(xeT, pack, H, T, interpret=True)
    cut = 3 * per_wl
    assert 0 < cut < n_micros
    part = fused_encoder_layers(xeT, pack, H, T, c0=0, c1=cut,
                                interpret=True)
    done = fused_encoder_layers(part, pack, H, T, c0=cut,
                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(done[:, :, :T], np.float32),
        np.asarray(full[:, :, :T], np.float32))


def test_encode_pre_kernel_post_vs_full_encode():
    """Full pipeline (stem -> kernel -> ln_post) vs models/whisper.encode
    on a tiny random model: int8-bounded agreement."""
    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=128, n_audio_state=D, n_audio_head=H,
        n_audio_layer=LE, n_vocab=384, n_text_ctx=32, n_text_state=D,
        n_text_head=H, n_text_layer=1)
    params = W.init_params(dims, jax.random.PRNGKey(11),
                           dtype=jnp.bfloat16)
    pack = pack_encoder_weights(params["encoder"]["blocks"])
    rng = np.random.default_rng(5)
    mel = jnp.asarray(
        0.3 * rng.standard_normal((NE, 80, 2 * dims.n_audio_ctx)),
        jnp.bfloat16)

    want = np.asarray(W.encode(params, mel, dims), np.float32)

    Tn = dims.n_audio_ctx
    xeT = encode_pre(params, mel, dims)
    assert xeT.shape == (NE, D, Tn)  # 128 is already x128
    out = fused_encoder_layers(xeT, pack, H, Tn, interpret=True)
    got = np.asarray(encode_post(params, out, Tn), np.float32)

    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max() / scale
    assert err < 0.08, f"relative error {err}"
