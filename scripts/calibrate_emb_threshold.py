#!/usr/bin/env python
"""Calibrate the AHC cosine-distance threshold to the SHIPPED (or staged)
embedding weights.

DiarizationPipeline.NEURAL_THRESHOLD is the agglomerative-clustering
stopping distance (diarize/pipeline.py). It is a property of the
embedding net's cosine geometry, so a retrain can move it. This script
recomputes it the way the original 0.53 was derived: same/different-
speaker utterance pairs from the synthetic val battery
(training/diarize_train.py::_emb_val_metrics geometry), swept over
thresholds for pair-classification accuracy. Calibrating on this val set
— NOT on eval/diarize_battery.py — keeps the battery an untouched test
set.

Usage: python scripts/calibrate_emb_threshold.py [weights_dir]
       (default: the shipped whisper_aries_tpu/weights/)
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models.diarize_nets import (
        EmbDims, embedding_forward, init_embedding)
    from whisper_aries_tpu.training import synth
    from whisper_aries_tpu.utils.params_io import load_params_into

    wdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "whisper_aries_tpu", "weights")
    params = load_params_into(init_embedding(EmbDims()),
                              os.path.join(wdir, "embedding.safetensors"))

    # several disjoint val scenes for a stable estimate
    n_spk, n_utt = 10, 6
    sims_all, same_all = [], []
    for seed in (30_000, 31_000, 32_000, 33_000):
        rng = np.random.default_rng(seed)
        audio, _ = synth.embedding_batch(rng, n_spk, n_utt)
        emb = np.asarray(embedding_forward(
            params, log_mel_spectrogram(jnp.asarray(audio)))
        ).reshape(n_spk * n_utt, -1)
        sims = emb @ emb.T
        same = np.kron(np.eye(n_spk, dtype=bool),
                       np.ones((n_utt, n_utt), bool))
        iu = np.triu_indices(n_spk * n_utt, k=1)
        sims_all.append(sims[iu])
        same_all.append(same[iu])
    sim = np.concatenate(sims_all)
    same = np.concatenate(same_all)
    dist = 1.0 - sim

    best_t, best_acc = 0.0, 0.0
    for t in np.arange(0.05, 1.51, 0.01):
        acc = float(((dist < t) == same).mean())
        if acc > best_acc:
            best_t, best_acc = float(t), acc
    same_cos = float(sim[same].mean())
    diff_cos = float(sim[~same].mean())
    print(f"weights={wdir}")
    print(f"same_cos={same_cos:.4f} diff_cos={diff_cos:.4f} "
          f"margin={same_cos - diff_cos:.4f}")
    print(f"calibrated threshold (cosine DISTANCE) = {best_t:.2f} "
          f"pair accuracy = {best_acc:.4f}")
    print(f"midpoint estimate = {1.0 - 0.5 * (same_cos + diff_cos):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
