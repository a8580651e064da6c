"""Training loops for the VAD / speaker-segmentation / speaker-embedding nets.

Produces the checkpoints that replace Silero VAD and pyannote 3.1 in this
framework (SURVEY §2.3 N3/N4; reference loads them at
final_optimized_transcriber.py:440 and conversation_transcriber.py:85-98).
Zero-egress training: the corpus is formant-synthesised speech
(training/synth.py) with disjoint train/validation speaker draws.

Models + losses:
  * VAD (models/vad_net.py): per-frame BCE on noisy mixtures.
  * SegmentationNet (models/diarize_nets.py): powerset cross-entropy with
    permutation-invariant training (min over the 6 local-speaker
    permutations — pyannote 3.1's PIT objective on its powerset classes).
  * EmbeddingNet: GE2E-style softmax contrastive loss over
    (speaker, utterance) batches with exclusive centroids.

Run:  JAX_PLATFORMS=cpu python -m whisper_aries_tpu.training.diarize_train \
          [--target vad|segmentation|embedding|all] [--steps N] [--out DIR]

Run on CPU (JAX_PLATFORMS=cpu), not the axon-tunnel TPU: these nets are
tiny (the tunnel RTT dominates a TPU step — CPU measured FASTER, 0.7 vs
1.0 s/step for VAD), and fetching trained params back through the tunnel
has returned corrupted buffers twice (round 2: one stale leaf; round 4:
~95% of bytes wrong on some leaves, deterministic across retries —
_save_verified caught both, functional check in /tmp/check_staged_vad
confirmed the corruption was real, acc 0.55 vs 0.89). On CPU the params
never cross the tunnel and the verified save passes first try.

Checkpoints land as flat safetensors (utils/params_io.py) in
whisper_aries_tpu/weights/ by default — the directory the engine and
DiarizationPipeline load at startup.
"""

from __future__ import annotations

import argparse
import itertools
import logging
import time
from typing import Any, Dict, List, Tuple

import numpy as np

from whisper_aries_tpu.training import synth
from whisper_aries_tpu.utils.params_io import default_weights_dir, save_params

log = logging.getLogger(__name__)

# powerset class index for every (a0, a1, a2) activity triple (<=2 active)
_POWERSET_LOOKUP = np.zeros((2, 2, 2), np.int32)


def _init_lookup():
    from whisper_aries_tpu.models.diarize_nets import POWERSET

    for ci, members in enumerate(POWERSET):
        a = [0, 0, 0]
        for m in members:
            a[m] = 1
        _POWERSET_LOOKUP[a[0], a[1], a[2]] = ci


_init_lookup()

_PERMS = list(itertools.permutations(range(3)))  # 6 local-speaker perms


def _maybe_augment(rng: np.random.Generator, audio: np.ndarray,
                   p_aug: float) -> np.ndarray:
    """Recording-chain augmentation (training/augment.py) on a fraction
    ``p_aug`` of examples at full strength — reverb/band-limit/codec/level
    are label-preserving, so activity targets pass through unchanged. The
    clean majority keeps the original corpus distribution (the trained-
    weight gates in tests/test_training.py are drawn from it)."""
    if p_aug <= 0.0 or rng.uniform() >= p_aug:
        return audio
    from whisper_aries_tpu.training.augment import augment

    return augment(rng, audio, strength=1.0)


def _dataset_vad(rng: np.random.Generator, n: int, p_aug: float = 0.0,
                 p_realism: float = 0.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """``p_realism``: fraction of examples with a MUSIC bed mixed in at
    2-20 dB SNR (label-preserving: music is not speech — the battery
    showed music beds as a top VAD failure mode). 0.0 reproduces the
    original distribution draw-for-draw."""
    xs, ys = [], []
    for _ in range(n):
        a, l = synth.vad_example(rng)
        if p_realism > 0.0 and rng.uniform() < p_realism:
            snr_db = rng.uniform(2.0, 20.0)
            mus = synth.synth_noise(rng, len(a), "music")
            a = (a + (max(a.std(), 1e-4) / 10 ** (snr_db / 20.0)) * mus
                 ).astype(np.float32)
        xs.append(_maybe_augment(rng, a, p_aug))
        ys.append(l)
    return np.stack(xs), np.stack(ys)


def _dataset_seg(rng: np.random.Generator, n: int, p_aug: float = 0.0,
                 p_realism: float = 0.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """``p_realism``: fraction of windows drawn from the REALISM mix —
    boosted turn-start overlap + in-turn back-channel interjections
    (explicit overlap supervision, round-4 review #4), and a third of
    those additionally degraded with a music bed or far-field reverb.
    0.0 reproduces the original distribution draw-for-draw."""
    xs, ys = [], []
    for _ in range(n):
        if p_realism > 0.0 and rng.uniform() < p_realism:
            a, act = synth.diarization_window(
                rng, overlap_p=0.5, backchannel_p=0.35)
            deg = rng.uniform()
            if deg < 0.18:
                a = (a + 0.06 * synth.synth_noise(rng, len(a), "music")
                     ).astype(np.float32)
            elif deg < 0.33:
                a = synth.apply_far_field(rng, a)
        else:
            a, act = synth.diarization_window(rng)
        xs.append(_maybe_augment(rng, a, p_aug))
        ys.append(act)
    return np.stack(xs), np.stack(ys)


# ---------------------------------------------------------------------------
# VAD
# ---------------------------------------------------------------------------


def train_vad(steps: int = 600, batch: int = 32, lr: float = 1e-3,
              seed: int = 0, n_train: int = 768, n_val: int = 128,
              log_every: int = 50, p_aug: float = 0.0,
              p_realism: float = 0.0
              ) -> Tuple[Dict[str, Any], Dict[str, float]]:
    import jax
    import jax.numpy as jnp
    import optax

    from whisper_aries_tpu.models.vad_net import VadDims, init_vad, vad_forward

    rng = np.random.default_rng(seed)
    rng_val = np.random.default_rng(10_000 + seed)
    log.info("VAD: generating %d train / %d val examples (p_aug=%.2f, "
             "p_realism=%.2f)...", n_train, n_val, p_aug, p_realism)
    X, Y = _dataset_vad(rng, n_train, p_aug=p_aug, p_realism=p_realism)
    Xv, Yv = _dataset_vad(rng_val, n_val)  # gate val stays clean
    Xa, Ya = _dataset_vad(np.random.default_rng(40_000 + seed), n_val,
                          p_aug=1.0)  # augmented robustness battery
    # music-bed validation draw (fixed seed, p_realism-independent)
    Xm, Ym = _dataset_vad(np.random.default_rng(70_000 + seed), n_val,
                          p_realism=1.0)

    dims = VadDims()
    params = init_vad(dims)
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(p, audio, labels):
        probs = vad_forward(p, audio, dims)
        probs = jnp.clip(probs, 1e-6, 1 - 1e-6)
        bce = -(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs))
        return bce.mean()

    @jax.jit
    def step_fn(p, o, audio, labels):
        l, g = jax.value_and_grad(loss_fn)(p, audio, labels)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    for s in range(steps):
        idx = rng.integers(0, n_train, batch)
        params, opt, l = step_fn(params, opt, jnp.asarray(X[idx]),
                                 jnp.asarray(Y[idx]))
        if s % log_every == 0 or s == steps - 1:
            log.info("vad step %d loss %.4f (%.1fs)", s, float(l),
                     time.time() - t0)

    # validation: frame accuracy vs the classical energy scorer
    from whisper_aries_tpu.vad.energy import get_speech_probs

    probs = np.asarray(vad_forward(params, jnp.asarray(Xv), dims))
    acc_nn = float((((probs > 0.5) == (Yv > 0.5))).mean())
    acc_energy = float(np.mean([
        ((get_speech_probs(Xv[i]) > 0.5) == (Yv[i] > 0.5)).mean()
        for i in range(n_val)
    ]))
    probs_a = np.asarray(vad_forward(params, jnp.asarray(Xa), dims))
    acc_aug = float((((probs_a > 0.5) == (Ya > 0.5))).mean())
    probs_m = np.asarray(vad_forward(params, jnp.asarray(Xm), dims))
    acc_mus = float((((probs_m > 0.5) == (Ym > 0.5))).mean())
    metrics = {"val_acc": acc_nn, "val_acc_energy_baseline": acc_energy,
               "val_acc_augmented": acc_aug, "val_acc_music": acc_mus,
               "p_aug": p_aug, "p_realism": p_realism}
    log.info("VAD val acc: nn=%.4f energy=%.4f augmented=%.4f music=%.4f",
             acc_nn, acc_energy, acc_aug, acc_mus)
    return params, metrics


# ---------------------------------------------------------------------------
# Segmentation (powerset + PIT)
# ---------------------------------------------------------------------------


def train_segmentation(steps: int = 2500, batch: int = 16, lr: float = 3e-4,
                       seed: int = 1, n_train: int = 1536, n_val: int = 96,
                       log_every: int = 100, p_aug: float = 0.0,
                       p_realism: float = 0.0
                       ) -> Tuple[Dict[str, Any], Dict[str, float]]:
    import jax
    import jax.numpy as jnp
    import optax

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models.diarize_nets import (
        SegDims,
        init_segmentation,
        segmentation_forward,
    )

    rng = np.random.default_rng(seed)
    rng_val = np.random.default_rng(20_000 + seed)
    log.info("SEG: generating %d train / %d val windows (p_aug=%.2f, "
             "p_realism=%.2f)...", n_train, n_val, p_aug, p_realism)
    X, Y = _dataset_seg(rng, n_train, p_aug=p_aug, p_realism=p_realism)
    Xv, Yv = _dataset_seg(rng_val, n_val)      # gate val stays clean
    Xa, Ya = _dataset_seg(np.random.default_rng(50_000 + seed), n_val,
                          p_aug=1.0)           # augmented robustness battery
    # overlap-heavy validation draw (fixed seed, independent of p_realism
    # so retrains are comparable): measures the overlap supervision
    Xo, Yo = _dataset_seg(np.random.default_rng(60_000 + seed), n_val,
                          p_realism=1.0)

    dims = SegDims()
    params = init_segmentation(dims)
    tx = optax.adamw(lr, weight_decay=1e-4)
    opt = tx.init(params)
    lookup = jnp.asarray(_POWERSET_LOOKUP)
    perms = jnp.asarray(_PERMS)  # (6, 3)
    hop = 320  # samples per 20 ms label frame

    def augment(key, audio, act):
        """On-device augmentation against memorising the fixed corpus:
        random gain, extra noise, and label-aligned circular 20 ms shifts."""
        kg, kn, ks, kr = jax.random.split(key, 4)
        B = audio.shape[0]
        gain = jax.random.uniform(kg, (B, 1), minval=0.5, maxval=1.6)
        noise = jax.random.uniform(kn, (B, 1), minval=0.0, maxval=0.015)
        audio = audio * gain + noise * jax.random.normal(ks, audio.shape)
        shift = jax.random.randint(kr, (B,), 0, act.shape[1])  # frames
        audio = jax.vmap(lambda a, k: jnp.roll(a, k * hop))(audio, shift)
        act = jax.vmap(lambda y, k: jnp.roll(y, k, axis=0))(act, shift)
        return audio, act

    def pit_loss(p, key, audio, act):
        audio, act = augment(key, audio, act)
        mel = log_mel_spectrogram(audio)          # (B, 80, 1000)
        logp = segmentation_forward(p, mel, dims)  # (B, 500, 7)
        a = act.astype(jnp.int32)                  # (B, F, 3)

        def perm_ce(perm):
            ap = a[:, :, perm]                     # (B, F, 3)
            cls = lookup[ap[..., 0], ap[..., 1], ap[..., 2]]  # (B, F)
            ce = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
            return ce.mean(axis=1)                 # (B,)

        ces = jax.vmap(perm_ce)(perms)             # (6, B)
        return jnp.min(ces, axis=0).mean()

    @jax.jit
    def step_fn(p, o, key, audio, act):
        l, g = jax.value_and_grad(pit_loss, argnums=0)(p, key, audio, act)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    key = jax.random.PRNGKey(seed)
    for s in range(steps):
        idx = rng.integers(0, n_train, batch)
        key, sub = jax.random.split(key)
        params, opt, l = step_fn(params, opt, sub, jnp.asarray(X[idx]),
                                 jnp.asarray(Y[idx]))
        if s % log_every == 0 or s == steps - 1:
            log.info("seg step %d loss %.4f (%.1fs)", s, float(l),
                     time.time() - t0)

    metrics = _seg_val_metrics(params, Xv, Yv, dims)
    aug = _seg_val_metrics(params, Xa, Ya, dims)
    over = _seg_val_metrics(params, Xo, Yo, dims)
    metrics["val_frame_acc_augmented"] = aug["val_frame_acc"]
    metrics["val_f1_augmented"] = aug["val_f1"]
    metrics["val_frame_acc_overlap"] = over["val_frame_acc"]
    metrics["val_f1_overlap"] = over["val_f1"]
    metrics["p_aug"] = p_aug
    metrics["p_realism"] = p_realism
    log.info("SEG val best-perm frame acc: %.4f  active-frame F1: %.4f  "
             "(augmented: acc %.4f F1 %.4f; overlap: acc %.4f F1 %.4f)",
             metrics["val_frame_acc"], metrics["val_f1"],
             aug["val_frame_acc"], aug["val_f1"],
             over["val_frame_acc"], over["val_f1"])
    return params, metrics


def _seg_val_metrics(params, Xv, Yv, dims) -> Dict[str, float]:
    """Best-permutation frame accuracy AND active-frame F1.

    Plain frame accuracy is dominated by empty slots (a net that predicts
    'speaker 0 always on' still scores ~0.85 — observed in an early
    collapsed run); F1 over active frames catches that failure mode.
    """
    import jax.numpy as jnp

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models.diarize_nets import (
        powerset_to_multilabel,
        segmentation_forward,
    )

    accs, f1s = [], []
    for i in range(0, len(Xv), 16):
        mel = log_mel_spectrogram(jnp.asarray(Xv[i : i + 16]))
        ml = powerset_to_multilabel(
            np.asarray(segmentation_forward(params, mel, dims))
        ) > 0.5
        want = Yv[i : i + 16] > 0.5
        for b in range(ml.shape[0]):
            best_acc, best_f1 = 0.0, 0.0
            for p in _PERMS:
                pred = ml[b][:, list(p)]
                acc = (pred == want[b]).mean()
                tp = (pred & want[b]).sum()
                denom = pred.sum() + want[b].sum()
                f1 = (2.0 * tp / denom) if denom else 1.0
                if acc > best_acc:
                    best_acc, best_f1 = acc, f1
            accs.append(best_acc)
            f1s.append(best_f1)
    return {"val_frame_acc": float(np.mean(accs)),
            "val_f1": float(np.mean(f1s))}


# ---------------------------------------------------------------------------
# Embedding (GE2E-style)
# ---------------------------------------------------------------------------


def train_embedding(steps: int = 700, n_spk: int = 12, n_utt: int = 4,
                    lr: float = 3e-4, seed: int = 2, log_every: int = 50,
                    n_batches: int = 48, p_aug: float = 0.0
                    ) -> Tuple[Dict[str, Any], Dict[str, float]]:
    import jax
    import jax.numpy as jnp
    import optax

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models.diarize_nets import (
        EmbDims,
        embedding_forward,
        init_embedding,
    )

    rng = np.random.default_rng(seed)
    log.info("EMB: generating %d contrastive batches (%dx%d utts)...",
             n_batches, n_spk, n_utt)
    # vary_duration=True (loop-tiled short utterances, matching _embed's
    # serve-time crops) was tried and REGRESSED pipeline separability
    # (region pair accuracy 0.93 -> 0.73): tiled sub-second clips teach
    # shortcut features. Fixed 2 s utterances + tiny-cluster absorption in
    # the pipeline is the better operating point.
    # channel augmentation applies PER UTTERANCE (each row its own random
    # chain): the GE2E objective then demands channel-invariant speaker
    # features — same-speaker rows under different chains must still beat
    # different-speaker rows under the same chain.
    batches = []
    for _ in range(n_batches):
        rows = synth.embedding_batch(rng, n_spk, n_utt)[0]
        if p_aug > 0.0:
            rows = np.stack([_maybe_augment(rng, r, p_aug) for r in rows])
        batches.append(rows)

    dims = EmbDims()
    params = init_embedding(dims)
    tx = optax.adam(lr)
    opt = tx.init(params)
    scale, bias = 10.0, -5.0  # GE2E init, kept fixed (stable for small nets)

    def ge2e_loss(p, audio):
        mel = log_mel_spectrogram(audio)             # (S*U, 80, T)
        emb = embedding_forward(p, mel)              # (S*U, D) L2-normed
        e = emb.reshape(n_spk, n_utt, -1)
        cent = e.mean(axis=1)                        # (S, D) inclusive
        cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
        # exclusive centroid for the own-speaker column
        excl = (e.sum(axis=1, keepdims=True) - e) / (n_utt - 1)
        excl = excl / jnp.linalg.norm(excl, axis=-1, keepdims=True)
        sim = jnp.einsum("sud,kd->suk", e, cent)     # (S, U, S)
        own = jnp.einsum("sud,sud->su", e, excl)     # (S, U)
        s_idx = jnp.arange(n_spk)
        sim = sim.at[s_idx, :, s_idx].set(own)
        logits = scale * sim + bias
        labels = jnp.tile(s_idx[:, None], (1, n_utt))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[..., None], axis=-1).mean()

    @jax.jit
    def step_fn(p, o, audio):
        l, g = jax.value_and_grad(ge2e_loss)(p, audio)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    for s in range(steps):
        audio = batches[int(rng.integers(0, len(batches)))]
        params, opt, l = step_fn(params, opt, jnp.asarray(audio))
        if s % log_every == 0 or s == steps - 1:
            log.info("emb step %d loss %.4f (%.1fs)", s, float(l),
                     time.time() - t0)

    metrics = _emb_val_metrics(params, seed=30_000 + seed)
    log.info("EMB val: same=%.3f diff=%.3f margin=%.3f",
             metrics["same_cos"], metrics["diff_cos"], metrics["margin"])
    return params, metrics


def _emb_val_metrics(params, seed: int, n_spk: int = 10, n_utt: int = 6
                     ) -> Dict[str, float]:
    import jax.numpy as jnp

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models.diarize_nets import embedding_forward

    rng = np.random.default_rng(seed)
    audio, _ = synth.embedding_batch(rng, n_spk, n_utt)
    emb = np.asarray(
        embedding_forward(params, log_mel_spectrogram(jnp.asarray(audio)))
    ).reshape(n_spk, n_utt, -1)
    sims = emb.reshape(n_spk * n_utt, -1) @ emb.reshape(n_spk * n_utt, -1).T
    same_mask = np.kron(np.eye(n_spk, dtype=bool), np.ones((n_utt, n_utt), bool))
    np.fill_diagonal(sims, np.nan)
    same = np.nanmean(np.where(same_mask, sims, np.nan))
    diff = np.nanmean(np.where(~same_mask, sims, np.nan))
    return {"same_cos": float(same), "diff_cos": float(diff),
            "margin": float(same - diff)}


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _save_verified(path: str, params) -> None:
    """save_params + byte-level read-back check.

    Guards against the failure that corrupted the round-2 shipped weights:
    saving TPU-resident params through the axon remote tunnel fetched a
    STALE buffer for some leaves (head.w came back at its init value while
    every other leaf was trained), so the checkpoint silently diverged from
    the validated in-memory model.

    Hard-won axon specifics (two 20-minute retrains died here in round 4):
      * np.asarray(remote_array) can return a ZERO-COPY view into a
        host-side staging buffer the client later reuses — two such
        fetches byte-compare equal, then the bytes CHANGE under the
        safetensors writer. Force a deep copy (np.array(..., copy=True)).
      * the verification must read back HOST-side (flat numpy):
        jnp.asarray round-trips every leaf over the tunnel, which is the
        flaky path being guarded (a finished retrain died on that false
        alarm).
      * retry the fetch+save rather than raise on first mismatch — losing
        the in-memory model over one bad fetch costs the whole train run.
    """
    import jax

    from safetensors.numpy import load_file

    from whisper_aries_tpu.utils.params_io import flatten_params

    last_err = "unknown"
    for attempt in range(3):
        host = jax.tree_util.tree_map(
            # order="C" as well as copy=True: axon fetches can be
            # F-ordered, and safetensors writes raw memory order (a
            # non-contiguous leaf round-trips scrambled — the round-4
            # seg-retrain save failure)
            lambda a: np.array(a, copy=True, order="C"), params)
        save_params(path, host)
        flat_host = flatten_params(host)
        back = load_file(str(path))
        if set(back.keys()) != set(flat_host.keys()):
            last_err = "key mismatch"
            continue
        ok = True
        for k, a in flat_host.items():
            b = back[k]
            # byte compare, not array_equal: NaN != NaN would false-alarm
            if a.dtype != b.dtype or a.shape != b.shape \
                    or a.tobytes() != b.tobytes():
                nbad = (np.frombuffer(a.tobytes(), np.uint8)
                        != np.frombuffer(b.tobytes(), np.uint8)).sum() \
                    if a.dtype == b.dtype and a.shape == b.shape else -1
                last_err = (f"{k}: dtype {a.dtype}/{b.dtype} shape "
                            f"{a.shape}/{b.shape} bad_bytes={nbad}")
                log.warning("checkpoint read-back mismatch (attempt %d) "
                            "for %s — %s; retrying", attempt, path, last_err)
                ok = False
                break
        if ok:
            return
    raise RuntimeError(
        f"checkpoint read-back mismatch for {path} after 3 attempts: "
        f"{last_err}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Train the VAD / diarization nets on synthetic speech"
    )
    p.add_argument("--target", default="all",
                   choices=["vad", "segmentation", "embedding", "all"])
    p.add_argument("--steps", type=int, default=None,
                   help="override per-model default step counts")
    p.add_argument("--out", default=None,
                   help="output dir (default: whisper_aries_tpu/weights/)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--augment", type=float, default=0.0, metavar="P",
                   help="fraction of train examples passed through the "
                        "recording-chain augmentation (training/augment.py)")
    p.add_argument("--realism", type=float, default=0.0, metavar="P",
                   help="fraction of train examples from the realism mix "
                        "(seg: overlap/backchannel/music/far-field; vad: "
                        "music beds)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    # Enforce the train-on-CPU rule IN CODE: the axon sitecustomize
    # registers the TPU platform at interpreter start, so JAX_PLATFORMS=cpu
    # in the environment is silently ignored (same trap tests/conftest.py
    # documents). Training on the tunnel is both slower (RTT > step) and
    # has twice returned corrupted parameter fetches; nothing here needs
    # a TPU. ARIES_TRAIN_PLATFORM overrides for hardware experiments.
    import os as _os

    import jax

    jax.config.update("jax_platforms",
                      _os.environ.get("ARIES_TRAIN_PLATFORM", "cpu"))
    log.info("training platform: %s", jax.default_backend())

    out = args.out or str(default_weights_dir())

    import json
    from pathlib import Path

    all_metrics: Dict[str, Dict[str, float]] = {}
    if args.target in ("vad", "all"):
        params, m = train_vad(steps=args.steps or 600, seed=args.seed,
                              p_aug=args.augment,
                              p_realism=args.realism)
        _save_verified(f"{out}/vad.safetensors", params)
        all_metrics["vad"] = m
    if args.target in ("segmentation", "all"):
        params, m = train_segmentation(steps=args.steps or 800,
                                       seed=args.seed + 1,
                                       p_aug=args.augment,
                                       p_realism=args.realism)
        _save_verified(f"{out}/segmentation.safetensors", params)
        all_metrics["segmentation"] = m
    if args.target in ("embedding", "all"):
        params, m = train_embedding(steps=args.steps or 700,
                                    seed=args.seed + 2,
                                    p_aug=args.augment)
        _save_verified(f"{out}/embedding.safetensors", params)
        all_metrics["embedding"] = m

    mpath = Path(out) / "TRAINING.json"
    existing = {}
    if mpath.exists():
        existing = json.loads(mpath.read_text())
    existing.update(all_metrics)
    mpath.write_text(json.dumps(existing, indent=2))
    print(json.dumps(all_metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
