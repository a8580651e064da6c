"""``verify_setup.py`` — environment verification.

The reference README references this file (README.md:64,237) but it does
not exist there; the closest equivalent is the env checker inside the
legacy engine (complete_fixed_whisper.py:26-91). This is the real thing:
checks the JAX backend/devices, the native audio runtime, optional deps,
model/tokenizer availability, and runs a tiny end-to-end smoke test
(the reference smoke-tests models on 0.5 s of noise,
final_optimized_transcriber.py:188-191).
"""

from __future__ import annotations

import argparse
import importlib
from typing import Optional, Sequence


def check(name: str, fn) -> bool:
    try:
        detail = fn()
        print(f"  [ok] {name}" + (f": {detail}" if detail else ""))
        return True
    except Exception as e:
        print(f"  [FAIL] {name}: {type(e).__name__}: {e}")
        return False


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="verify_setup")
    p.add_argument("--model", default="large-v3")
    p.add_argument("--model-cache", default="./models")
    p.add_argument("--smoke-test", action="store_true",
                   help="run a tiny random-weight end-to-end decode")
    args = p.parse_args(argv)

    ok = True
    print("Core stack:")

    def _jax():
        import jax

        devs = jax.devices()
        return f"{jax.__version__}, backend={jax.default_backend()}, " \
               f"devices={[str(d) for d in devs]}"

    ok &= check("jax", _jax)
    for mod in ("numpy", "scipy", "einops"):
        ok &= check(mod, lambda m=mod: importlib.import_module(m).__version__)

    print("Optional:")
    for mod in ("aiohttp", "pydantic", "requests", "transformers", "torch"):
        check(mod, lambda m=mod: importlib.import_module(m).__version__)

    print("Native runtime:")

    def _native():
        from whisper_aries_tpu.audio._native import native_available

        if not native_available():
            raise RuntimeError(
                "libariesaudio.so not built (run `make -C native`); "
                "numpy fallbacks will be used"
            )
        return "libariesaudio.so loaded"

    check("ariesaudio", _native)

    def _ffmpeg():
        import shutil

        path = shutil.which("ffmpeg")
        if not path:
            raise RuntimeError("not found (video/compressed input disabled)")
        return path

    check("ffmpeg", _ffmpeg)

    print("Model:")

    def _model():
        from whisper_aries_tpu.models.loader import resolve_model_dir

        d = resolve_model_dir(args.model, args.model_cache)
        if d is None:
            raise RuntimeError(
                f"no local checkpoint for {args.model!r} under "
                f"{args.model_cache} (download config.json + "
                "model.safetensors + tokenizer files)"
            )
        return str(d)

    model_ok = check(f"checkpoint {args.model}", _model)

    if args.smoke_test:
        print("Smoke test (tiny random weights):")

        def _smoke():
            import numpy as np
            import jax.numpy as jnp

            from whisper_aries_tpu.audio.mel import log_mel_spectrogram
            from whisper_aries_tpu.models import whisper as W

            dims = W.WhisperDims(
                n_mels=80, n_audio_ctx=1500, n_audio_state=64,
                n_audio_head=2, n_audio_layer=1, n_vocab=1521,
                n_text_ctx=448, n_text_state=64, n_text_head=2,
                n_text_layer=1,
            )
            params = W.init_params(dims)
            audio = jnp.asarray(
                np.random.default_rng(0).standard_normal((1, 480_000)),
                jnp.float32,
            ) * 0.1
            mel = log_mel_spectrogram(audio, n_mels=80)
            xa = W.encode(params, mel, dims)
            return f"encoded {tuple(xa.shape)}"

        ok &= check("mel+encoder", _smoke)

    print("\nSetup " + ("OK" if ok else "INCOMPLETE") +
          ("" if model_ok else " (no model checkpoint — only random-weight "
                              "benchmarks will run)"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
