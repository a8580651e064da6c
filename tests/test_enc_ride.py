"""Parity tests for the encode-while-decode RIDER.

The decode megakernel (ops/pallas_decode_layers.py) can carry the NEXT
batch's encoder forward: one encoder micro-op per (layer, cross-window)
site, advancing a cursor into the encoder megakernel's micro schedule
(ops/pallas_encoder_layers.py). Contracts tested here (interpret mode):

  * riding NEVER changes the decode outputs (x, appended cache, scales);
  * the ridden encoder state is exactly what the standalone encoder
    kernel produces for the same cursor range;
  * per-call cursor deltas land on window-layer boundaries, and chained
    rider calls + a standalone finish reproduce the full encode.

Reference anchor: the reference pipeline's encode and decode run
serially on one device (faster-whisper's model.generate inside
final_optimized_transcriber.py workers); the rider overlaps them on the
decode step's DMA slack instead — a TPU-native pipelining the CUDA
stack gets from concurrent streams.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.ops.pallas_decode_layers import (
    fused_decoder_layers,
    pack_layer_weights,
)
from whisper_aries_tpu.ops.pallas_encoder_layers import (
    enc_micro_counts,
    fused_encoder_layers,
    pack_encoder_weights,
)

# encoder geometry (dh must be 64: the pack folds dh**-0.5 with dh=64)
ED, EH, ELE, ENE, ETP, ET = 128, 2, 2, 2, 128, 100


@pytest.fixture(scope="module")
def ride_setup():
    """A tiny decode-step call plus a tiny rideable encoder batch."""
    dims = W.WhisperDims(80, 192, 384, 6, 2, 1000, 64, 384, 6, 2)
    rng = np.random.default_rng(11)
    params = W.fuse_decoder_qkv(W.init_params(dims, dtype=jnp.float32))
    wpack = pack_layer_weights(params["decoder"]["blocks"])
    Bw, K = 4, 4
    H = dims.n_text_head
    L = dims.n_text_layer
    M = 256
    xa = jnp.asarray(
        rng.standard_normal((Bw, dims.n_audio_ctx, 384)), jnp.float32
    ) * 0.1
    cm = W.precompute_cross_kv_int8_packed(params, xa, dims)
    pos = 9
    ckv = jnp.asarray(
        rng.integers(-127, 128, (L, Bw, 2 * H, 64, M)), jnp.int8)
    HP = 8
    ksc = jnp.asarray(0.01 + rng.random((L, Bw, 2 * HP, M)), jnp.float32)
    anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                   (Bw, 1, 40))
    amask = W.ancestry_mask(anc, jnp.int32(pos), jnp.int32(0), 40,
                            include_own=True, minor=M)
    x = jnp.asarray(0.1 * rng.standard_normal((Bw * K, 384)), jnp.float32)
    dec = dict(x=x, wpack=wpack, ckv=ckv, kv8=cm["kv8"], sc=cm["sc"],
               cmask=cm["cmask"], amask=amask, pos=pos, H=H, K=K, ksc=ksc,
               L=L, Bw=Bw)

    eblocks = W._blocks_init(jax.random.PRNGKey(5), ELE, ED, jnp.float32,
                             cross=False)
    epack = pack_encoder_weights(eblocks)
    xeT = (0.3 * jax.random.normal(jax.random.PRNGKey(9),
                                   (ENE, ED, ETP))).astype(jnp.float32)
    xeT = xeT.at[:, :, ET:].set(0)
    enc = dict(xeT=xeT, **epack)
    return dec, enc


def _dec_call(dec, **kw):
    return fused_decoder_layers(
        dec["x"], dec["wpack"], dec["ckv"], dec["kv8"], dec["sc"],
        dec["cmask"], dec["amask"], jnp.int32(dec["pos"]), dec["H"],
        dec["K"], ksc=dec["ksc"], interpret=True, **kw)


def test_ride_decode_outputs_unchanged(ride_setup):
    dec, enc = ride_setup
    x0, ckv0, ksc0 = _dec_call(dec)
    x1, ckv1, ksc1, xeT1, c1 = _dec_call(
        dec, enc=enc, enc_c0=0, enc_n_head=EH, enc_T=ET, enc_stride=1)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(ckv0), np.asarray(ckv1))
    np.testing.assert_array_equal(np.asarray(ksc0), np.asarray(ksc1))


def test_ride_cursor_and_encoder_state(ride_setup):
    dec, enc = ride_setup
    per_wl, n_mic = enc_micro_counts(ENE, ELE, ETP)
    sites = dec["L"] * dec["Bw"]                 # 8 sites at stride 1
    b48 = (sites // per_wl) * per_wl
    assert b48 == per_wl * 2                     # tiny geometry: 2 wl
    _, _, _, xeT1, c1 = _dec_call(
        dec, enc=enc, enc_c0=0, enc_n_head=EH, enc_T=ET, enc_stride=1)
    assert int(c1) == min(b48, n_mic)
    want = fused_encoder_layers(enc["xeT"], enc, EH, ET, c0=0,
                                c1=int(c1), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(xeT1[:, :, :ET]), np.asarray(want[:, :, :ET]))


def test_ride_chain_plus_finish_equals_full_encode(ride_setup):
    dec, enc = ride_setup
    per_wl, n_mic = enc_micro_counts(ENE, ELE, ETP)
    full = fused_encoder_layers(enc["xeT"], enc, EH, ET, interpret=True)

    xeT, c = enc["xeT"], 0
    e = dict(enc, xeT=xeT)
    _, _, _, xeT, c = _dec_call(
        dec, enc=e, enc_c0=c, enc_n_head=EH, enc_T=ET, enc_stride=1)
    assert int(c) % per_wl == 0
    assert 0 < int(c) < n_mic                    # leftovers exist
    done = fused_encoder_layers(xeT, enc, EH, ET, c0=int(c),
                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(done[:, :, :ET]), np.asarray(full[:, :, :ET]))


def test_ride_through_beam_search(ride_setup):
    """End-to-end: beam_search_decode with enc_ride produces identical
    decode results to the plain mega path, and its ridden encoder state
    + a standalone finish equals the full standalone encode."""
    from whisper_aries_tpu.decoding import generate as G
    from whisper_aries_tpu.decoding.generate import DecodeSpecialIds

    _, enc = ride_setup
    dims = W.WhisperDims(80, 64, 128, 2, 2, 384, 32, 128, 2, 2)
    params = W.init_params(dims, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(
        0.3 * rng.standard_normal((2, 80, 2 * dims.n_audio_ctx)),
        jnp.float32)
    xa = W.encode(params, mel, dims)
    ids = DecodeSpecialIds(
        n_vocab=dims.n_vocab, sot=1, eot=2, blank=4, no_speech=5,
        no_timestamps=6, timestamp_begin=300,
        max_initial_timestamp_index=50)
    prompt = jnp.full((2, 1), 1, jnp.int32)
    common = dict(beam_size=4, sample_len=6, with_timestamps=False,
                  length_penalty=0.0, suppress_blank=False, kv_int8=True,
                  self_kv_int8=True)
    base = G.beam_search_decode(
        params, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="mega", **common)
    ride = G.beam_search_decode(
        params, xa, prompt, dims, ids,
        jnp.zeros((dims.n_vocab,), jnp.float32), jnp.int32(0),
        beam_reorder="mega", enc_ride=enc, enc_meta=(EH, ET, 1),
        **common)
    np.testing.assert_array_equal(
        np.asarray(base["tokens"]), np.asarray(ride["tokens"]))
    np.testing.assert_array_equal(
        np.asarray(base["sum_logprob"]), np.asarray(ride["sum_logprob"]))

    per_wl, n_mic = enc_micro_counts(ENE, ELE, ETP)
    c = int(ride["enc_c"])
    assert c % per_wl == 0 and c > 0
    done = fused_encoder_layers(ride["enc_x"], enc, EH, ET, c0=c,
                                interpret=True)
    full = fused_encoder_layers(enc["xeT"], enc, EH, ET, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(done[:, :, :ET]), np.asarray(full[:, :, :ET]))


def test_ride_stride_spreads_and_clamps(ride_setup):
    dec, enc = ride_setup
    per_wl, n_mic = enc_micro_counts(ENE, ELE, ETP)
    # stride 2 -> ceil(8/2)=4 sites-worth -> b48 = 1 window-layer
    _, _, _, xeT1, c1 = _dec_call(
        dec, enc=enc, enc_c0=0, enc_n_head=EH, enc_T=ET, enc_stride=2)
    assert int(c1) == per_wl
    want = fused_encoder_layers(enc["xeT"], enc, EH, ET, c0=0,
                                c1=per_wl, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(xeT1[:, :, :ET]), np.asarray(want[:, :, :ET]))
    # cursor at the end clamps to n_mic and stays there
    _, _, _, _, c2 = _dec_call(
        dec, enc=enc, enc_c0=n_mic, enc_n_head=EH, enc_T=ET,
        enc_stride=1)
    assert int(c2) == n_mic
