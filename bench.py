#!/usr/bin/env python
"""Headline benchmark: Whisper large-v3 transcription throughput per chip.

Measures steady-state RTFx — audio-seconds transcribed per wall-second —
for the full compute path (log-mel -> encoder -> KV-cached beam-search
decode, beam=5) on a batch of 30 s windows, matching the BASELINE.json
metric "audio-hours/hour/chip (RTFx) at large-v3 beam=5".

Decode length is fixed at 100 tokens/window (typical dense speech: ~2.5
words/s x 30 s x ~1.3 tokens/word) so the number is comparable across runs
and does not depend on what random/real weights emit. Weights come from a
local checkpoint when available, else random init — identical FLOPs either
way.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the reference's best claimed speed
(~10x real-time on its RTX-3050-class GPU setup, reference README.md:122).

Env knobs: ARIES_BENCH_BATCH (windows per step, default 48 on TPU — the
measured int8-self-cache capacity/throughput peak), ARIES_BENCH_TOKENS
(decode length, default 100), ARIES_BENCH_BEAM (default 5),
ARIES_BENCH_MODEL (default large-v3; "tiny-cpu" runs a scaled model for
CPU smoke runs), ARIES_BENCH_REPS (timed reps, default 3),
ARIES_BENCH_MODE=engine (full AriesTranscriber.transcribe_file product path
on a synthetic 36-minute WAV — includes VAD planning, host parse, outputs),
ARIES_BENCH_KV=int8, ARIES_BENCH_COMPUTE=int8, ARIES_BENCH_SELFKV=bf16
(opt out of the TPU-default int8 self-cache), ARIES_BEAM_TAIL=xla (opt out
of the fused beam-tail kernel), ARIES_GREEDY_MEGA=0 / ARIES_MEGA_GROUP=N
(beam=1: opt out of / size the grouped-windows greedy megakernel).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_engine() -> dict:
    """Product-path benchmark: AriesTranscriber.transcribe_file end to end
    (VAD -> window plan -> mel/encode/decode -> host parse/merge), random
    large-v3 weights, synthetic 12-minute WAV. Returns the metric dict."""
    import numpy as np

    from whisper_aries_tpu.pipeline.engine import AriesTranscriber

    model_name = os.environ.get("ARIES_BENCH_MODEL", "large-v3")
    n_tokens = int(os.environ.get("ARIES_BENCH_TOKENS", "100"))
    beam = int(os.environ.get("ARIES_BENCH_BEAM", "5"))
    reps = int(os.environ.get("ARIES_BENCH_REPS", "2"))
    # 36 min = THREE full auto-sized batches at large-v3 beam 5 (24 windows
    # each, parallel/mesh.py) — a single batch would leave the engine's
    # double-buffered loop nothing to overlap, so the measured RTF would be
    # one batch's fixed host overhead (audio read, upload, parse) in full,
    # not the steady state a long file actually sees.
    minutes = float(os.environ.get("ARIES_BENCH_MINUTES", "36"))
    import jax

    backend = jax.default_backend()
    if backend == "cpu" and "ARIES_BENCH_MODEL" not in os.environ:
        model_name, n_tokens, beam, minutes = "tiny", 8, 1, 1.0

    import tempfile

    from whisper_aries_tpu.audio.decode import write_wav

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(int(minutes * 60 * sr)) / sr
    # dense amplitude-modulated "speech": keeps energy VAD fully on
    x = (0.25 * np.sin(2 * np.pi * 220 * t)
         * (0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t))).astype(np.float32)
    x += 0.01 * rng.standard_normal(len(t)).astype(np.float32)
    wav = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
    write_wav(wav.name, x, sr)

    eng = AriesTranscriber(model_size=model_name, allow_random=True)
    duration = minutes * 60.0
    log(f"[engine] model={model_name} backend={backend} beam={beam} "
        f"tokens={n_tokens} audio={duration:.0f}s batch={eng.batch_size}")

    def run():
        return eng.transcribe_file(
            wav.name, language="en", beam_size=beam,
            max_new_tokens=n_tokens, output_formats=(), vad_filter=False,
            temperature=(0.0,),
        )

    t0 = time.time()
    res = run()
    log(f"[engine] warmup (incl. compile): {time.time() - t0:.1f}s "
        f"({res['num_windows']} windows)")
    times = []
    for i in range(reps):
        t0 = time.time()
        res = run()
        dt = time.time() - t0
        times.append(dt)
        log(f"[engine] rep {i}: {dt:.3f}s -> {duration / dt:.1f}x realtime")
    rtfx = duration / min(times)
    return {
        "metric": (
            f"whisper-{model_name}(random-weights) ENGINE-path transcription "
            f"throughput per chip (transcribe_file, beam={beam}, "
            f"{n_tokens} tokens/window, backend={backend})"
        ),
        "value": round(rtfx, 2),
        "unit": "x realtime (audio-sec/wall-sec)",
        "vs_baseline": round(rtfx / 10.0, 2),
    }


def engine_mode() -> int:
    print(json.dumps(measure_engine()))
    return 0


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.decoding import generate as G
    from whisper_aries_tpu.models import whisper as W
    from whisper_aries_tpu.models.loader import resolve_model_dir, load_model

    backend = jax.default_backend()
    model_name = os.environ.get("ARIES_BENCH_MODEL", "large-v3")
    # 48 is the measured int8-self-cache HBM capacity (and the throughput
    # peak: 24->352x, 36->361x, 48->366x, 56 OOMs — the megakernel has no
    # row-tile cliff; parallel/mesh.py auto-sizing uses the same anchor)
    batch = int(os.environ.get("ARIES_BENCH_BATCH", "48"))
    n_tokens = int(os.environ.get("ARIES_BENCH_TOKENS", "100"))
    beam = int(os.environ.get("ARIES_BENCH_BEAM", "5"))
    reps = int(os.environ.get("ARIES_BENCH_REPS", "3"))

    if model_name == "tiny-cpu" or (backend == "cpu" and
                                    "ARIES_BENCH_MODEL" not in os.environ):
        dims = W.WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4)
        batch = min(batch, 2)
        n_tokens = min(n_tokens, 16)
        dtype = jnp.float32
        params = W.init_params(dims, dtype=dtype)
        label = "tiny-cpu-smoke"
        log(f"CPU smoke mode: dims=tiny batch={batch} tokens={n_tokens}")
    else:
        dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
        if resolve_model_dir(model_name) is not None:
            params, dims, _ = load_model(model_name, dtype=dtype)
            label = model_name
        else:
            dims = W.PRESETS[model_name]
            params = W.init_params(dims, dtype=dtype)
            label = f"{model_name}(random-weights)"
        log(f"model={label} backend={backend} batch={batch} "
            f"beam={beam} tokens={n_tokens} dtype={dtype.__name__}")

    compute = os.environ.get("ARIES_BENCH_COMPUTE", "bf16")
    if compute == "int8":
        from whisper_aries_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params)
        label += "-int8"
        log("quantized dense layers to int8")
    # fused decoder qkv GEMM (bit-exact; engine does the same)
    params = W.fuse_decoder_qkv(params)

    # Whisper large-v3-layout special ids (values only gate masks; the
    # timestamp grammar costs the same either way).
    sp_langs = max(1, dims.n_vocab - 51766)
    base = dims.n_vocab - sp_langs - 1509
    ids = G.DecodeSpecialIds(
        eot=base, sot=base + 1, no_speech=base + sp_langs + 6,
        no_timestamps=base + sp_langs + 7,
        timestamp_begin=base + sp_langs + 8, blank=220, n_vocab=dims.n_vocab,
    )
    suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
    prompt = np.asarray(
        [[ids.sot, ids.sot + 1, base + sp_langs + 3]], np.int32
    ).repeat(batch, axis=0)  # sot, lang, transcribe

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((batch, 480_000))).astype(np.float32)
    audio_j = jnp.asarray(audio)
    prompt_j = jnp.asarray(prompt)

    # int8 cross-KV is the engine's TPU default (kv_cache_dtype="auto");
    # XLA fuses the dequant into the attention dots (ops/pallas_cross_attn
    # dispatch notes). Batch 24 measured as the throughput knee.
    kv_default = "int8" if backend == "tpu" else "bf16"
    kv_int8 = os.environ.get("ARIES_BENCH_KV", kv_default) == "int8"
    if kv_int8:
        log("cross-attention K/V quantized to int8")
    # self-attention cache: int8 by default on TPU (the megakernel
    # quantizes appended K/V in-kernel at zero measured latency cost and
    # the halved cache enables batch 48); ARIES_BENCH_SELFKV=bf16 opts out
    selfkv_default = "int8" if backend == "tpu" else "bf16"
    self_kv_int8 = os.environ.get(
        "ARIES_BENCH_SELFKV", selfkv_default) == "int8"
    if self_kv_int8:
        log("self-attention KV cache quantized to int8 (in-kernel append)")

    def step():
        mel = log_mel_spectrogram(audio_j, n_mels=dims.n_mels)
        xa = W.encode(params, mel.astype(dtype), dims)
        if beam > 1:
            out = G.beam_search_decode(
                params, xa, prompt_j, dims, ids, suppress, jnp.int32(0),
                beam_size=beam, sample_len=n_tokens, with_timestamps=True,
                kv_int8=kv_int8, self_kv_int8=self_kv_int8,
                # match the engine's static-arg cache key so the companion
                # engine metric reuses this compiled beam program
                beam_reorder=os.environ.get("ARIES_BEAM_REORDER", "default"),
                beam_group=int(
                    os.environ.get("ARIES_BEAM_GROUP", "2") or 1),
            )
        else:
            import jax as _jax

            # grouped-windows greedy megakernel (engine TPU default;
            # ARIES_GREEDY_MEGA=0 opts out, ARIES_MEGA_GROUP sets Kg)
            mg = None
            if (backend == "tpu" and kv_int8
                    and os.environ.get("ARIES_GREEDY_MEGA", "1") != "0"):
                mg = int(os.environ.get("ARIES_MEGA_GROUP", "4"))
                if mg <= 1 or xa.shape[0] % mg != 0:
                    mg = None
            out = G.greedy_decode(
                params, xa, prompt_j, dims, ids, suppress, jnp.int32(0),
                jnp.float32(0.0), _jax.random.PRNGKey(0),
                sample_len=n_tokens, with_timestamps=True, kv_int8=kv_int8,
                self_kv_int8=self_kv_int8, mega_group=mg,
            )
        return out["tokens"]

    def run_once():
        # the axon remote backend's block_until_ready does NOT block — force
        # completion with a host fetch of the (small) token buffer
        return np.asarray(step())

    log("compiling + warmup...")
    while True:
        try:
            t0 = time.time()
            run_once()
            log(f"warmup (incl. compile): {time.time() - t0:.1f}s")
            break
        except Exception as e:
            from whisper_aries_tpu.utils.memory import is_oom_error

            if not is_oom_error(e) or batch <= 2:
                raise
            batch = max(2, batch // 2)
            log(f"HBM OOM — retrying with batch={batch}")
            audio_j = jnp.asarray(audio[:batch])
            prompt_j = jnp.asarray(prompt[:batch])

    times = []
    for i in range(reps):
        t0 = time.time()
        run_once()
        dt = time.time() - t0
        times.append(dt)
        log(f"rep {i}: {dt:.3f}s -> {batch * 30.0 / dt:.1f}x realtime")

    best = min(times)
    rtfx = batch * 30.0 / best
    baseline_rtfx = 10.0  # reference's best claim (README.md:122, GPU mode)

    result = {
        "metric": (
            f"whisper-{label} transcription throughput per chip "
            f"(30s windows, beam={beam}, {n_tokens} tokens/window, "
            f"batch={batch}, backend={backend})"
        ),
        "value": round(rtfx, 2),
        "unit": "x realtime (audio-sec/wall-sec)",
        "vs_baseline": round(rtfx / baseline_rtfx, 2),
    }

    # Product-path companion metric: transcribe_file end to end on the same
    # chip, recorded in the SAME JSON artifact (the reference measures its
    # RTF on the product path, final_optimized_transcriber.py:506-511).
    # Default-on for TPU driver runs; ARIES_BENCH_ENGINE=0 skips.
    want_engine = os.environ.get(
        "ARIES_BENCH_ENGINE", "1" if backend == "tpu" else "0"
    ) == "1"
    if want_engine:
        try:
            # drop the core loop's device buffers FIRST: the engine builds
            # its own param tree, and keeping the core's ~3.5 GB (params +
            # audio + encoder output) live alongside it measured the
            # engine at 178x vs 265x standalone (HBM pressure degrades the
            # schedule well before the OOM ladder trips)
            import gc

            del params, audio_j, prompt_j, suppress
            gc.collect()
            eng = measure_engine()
            result["engine_metric"] = eng["metric"]
            result["engine_value"] = eng["value"]
            result["engine_vs_baseline"] = eng["vs_baseline"]
        except Exception as e:  # engine companion must never kill the bench
            log(f"[engine] companion measurement failed: {e}")
            result["engine_error"] = str(e)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if os.environ.get("ARIES_BENCH_MODE") == "engine":
        raise SystemExit(engine_mode())
    raise SystemExit(main())
