#!/usr/bin/env python
"""SYNTHETIC-ACCEPTANCE speculative-decode bench — NEVER a headline number.

Measures the S-token verify megakernel step (W.decoder_step_fused_multi:
score S drafted tokens per window in one kernel launch over the grouped
K-minor cache) against the 1-token grouped greedy mega step, at a FIXED
synthetic acceptance count. Real acceptance is a property of real speech
+ real weights (prompt-lookup n-gram reuse — decoding/drafter.py); on
random weights it is ~0 by construction, so this bench ADVANCES BY A
SYNTHETIC COUNT (ARIES_SPEC_ACCEPT, default 3 of S=4) purely to measure
the MECHANICS: verified-tokens-per-second if acceptance were that rate.
The drafter still runs every step (its cost is included); its output is
ignored for advancement.

Interpretation: tokens/s(speculative, accept=a) / tokens/s(baseline) is
the speedup IF real-weight acceptance averaged `a` — the deployment
decision needs the acceptance measurement on real checkpoints (ROADMAP:
probe says the step mechanics amortize ~perfectly, 1.09x at S=4).

Env: ARIES_SPEC_S (draft len, default 4), ARIES_SPEC_ACCEPT (default 3),
ARIES_SPEC_BATCH (default 16), ARIES_SPEC_GROUP (default 2),
ARIES_SPEC_STEPS (default 24).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from whisper_aries_tpu.decoding.drafter import ngram_draft
    from whisper_aries_tpu.models import whisper as W
    from whisper_aries_tpu.ops.pallas_decode_layers import pack_layer_weights
    from whisper_aries_tpu.ops.quant import quantize_model_params

    backend = jax.default_backend()
    S = int(os.environ.get("ARIES_SPEC_S", "4"))
    ACC = int(os.environ.get("ARIES_SPEC_ACCEPT", "3"))
    B = int(os.environ.get("ARIES_SPEC_BATCH", "16"))
    Kg = int(os.environ.get("ARIES_SPEC_GROUP", "2"))
    steps = int(os.environ.get("ARIES_SPEC_STEPS", "24"))
    assert 1 <= ACC <= S and B % Kg == 0

    if backend == "cpu":
        dims = W.WhisperDims(80, 192, 384, 6, 2, 1000, 64, 384, 6, 2)
        B, steps = min(B, 4), min(steps, 4)
    else:
        dims = W.PRESETS["large-v3"]
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    params = W.fuse_decoder_qkv(
        quantize_model_params(W.init_params(dims, dtype=dtype)))
    wpack = pack_layer_weights(params["decoder"]["blocks"])
    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        0.1 * rng.standard_normal((B, dims.n_audio_ctx, dims.n_audio_state)),
        dtype)

    P = 3
    Lmax = 256
    interp = backend != "tpu"
    prompt = jnp.asarray(rng.integers(3, 200, (B, P)), jnp.int32)

    cross_mega = W.precompute_cross_kv_int8_packed(params, xa, dims)
    cross_g = W.group_cross_mega(cross_mega, Kg)
    cache0 = W.init_kv_cache(dims, B, dtype=xa.dtype, max_len=P)
    _, cache0 = W.decoder_step(
        params, prompt, jnp.int32(0), cache0,
        W.cross_views_from_packed(cross_mega, dims.n_text_head,
                                  xa.shape[1]), dims)
    packed0 = W.pack_greedy_prefill_cache(cache0, Kg, max_len=Lmax,
                                          int8=True,
                                          n_head=dims.n_text_head)

    toks0 = jnp.concatenate(
        [prompt, jnp.zeros((B, Lmax - P), jnp.int32)], axis=1)

    # params/wpack/cross are ARGUMENTS, never jit closure constants
    # (closure capture bakes 3 GB into the lowering -> 10-25 min compiles,
    # CLAUDE.md trap; caught by the captured-constants warning first try)
    @jax.jit
    def spec_chain(params, wpack, cross_g, cache, tokens):
        """`steps` fixed-shape S-token verify steps, advancing pos by the
        SYNTHETIC acceptance; returns the final pos'd state."""
        def body(carry, _):
            cache, tokens, pos = carry
            draft = ngram_draft(tokens, pos, S, ngram=2, fallback=0)
            draft = jnp.where(draft < 0, 0, draft)
            logits, cache = W.decoder_step_fused_multi(
                params, wpack, draft, pos, cache, cross_g, dims,
                group=Kg, interpret=interp)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)   # (B, S)
            # synthetic acceptance: write ACC verified tokens
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, :ACC], (0, pos))
            return (cache, tokens, pos + ACC), logits[0, 0, 0]
        (cache, tokens, pos), probe = jax.lax.scan(
            body, (cache, tokens, jnp.int32(P)), None, length=steps)
        return tokens, probe

    @jax.jit
    def base_chain(params, wpack, cross_g, cache, tokens):
        """`steps*ACC` 1-token grouped mega steps (same verified-token
        count as the speculative chain)."""
        from whisper_aries_tpu.models.whisper import decoder_step_fused

        anc_id = jnp.broadcast_to(
            jnp.arange(Kg, dtype=jnp.int32)[None, :, None],
            (B // Kg, Kg, Lmax))

        def body(carry, _):
            cache, tokens, pos = carry
            tok = jax.lax.dynamic_slice(tokens, (0, pos - 1), (B, 1))
            logits, cache = decoder_step_fused(
                params, wpack, tok, pos - 1, cache, cross_g, dims,
                beam_anc=anc_id, beam_k=Kg, interpret=interp)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None], (0, pos))
            return (cache, tokens, pos + 1), logits[0, 0, 0]
        (cache, tokens, pos), probe = jax.lax.scan(
            body, (cache, tokens, jnp.int32(P + 1)), None,
            length=steps * ACC)
        return tokens, probe

    def run(fn, cache, tokens):
        t0 = time.time()
        out, probe = fn(params, wpack, cross_g, cache, tokens)
        np.asarray(probe)  # host fetch forces completion (axon no-block)
        return time.time() - t0

    log(f"spec bench: backend={backend} S={S} accept={ACC} B={B} "
        f"group={Kg} steps={steps}")
    run(spec_chain, packed0, toks0)       # warmup/compile
    t_spec = run(spec_chain, packed0, toks0)
    run(base_chain, packed0, toks0)
    t_base = run(base_chain, packed0, toks0)
    verified = steps * ACC * B
    out = {
        "metric": "SYNTHETIC-ACCEPTANCE speculative verify mechanics "
                  "(NOT a real-speech speedup; acceptance is forced)",
        "s_draft": S, "synthetic_accept": ACC, "batch": B, "group": Kg,
        "spec_s_per_step": t_spec / steps,
        "base_s_per_token": t_base / (steps * ACC),
        "verified_tokens_per_s_spec": verified / t_spec,
        "verified_tokens_per_s_base": verified / t_base,
        "speedup_if_acceptance_held": t_base / t_spec,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
