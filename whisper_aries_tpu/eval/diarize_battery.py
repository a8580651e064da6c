"""Synthetic DER battery for the diarization stack (VERDICT r2 item 7).

Generates multi-speaker conversation scenes with exact reference turns
(training/synth.py voices, disjoint from any training draw by seed
offset), optionally passes the AUDIO through the recording-chain
augmentation (training/augment.py — reverb, band-limiting, codec, level;
all label-preserving), runs the full DiarizationPipeline, and scores DER
(eval/der.py). This is the robustness measurement the gate metrics
(frame accuracy / F1 on clean synth) cannot provide: the pyannote-3.1
parity bar is a DER on degraded real-world-like audio, not clean-corpus
accuracy.

Run:  python -m whisper_aries_tpu.eval.diarize_battery \
          [--scenes N] [--strength 1.0] [--seed 7000] [--collar 0.25]
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from whisper_aries_tpu.eval.der import diarization_error_rate
from whisper_aries_tpu.training import synth

SR = synth.SR


def conversation_scene(
    rng: np.random.Generator,
    dur_s: float = 45.0,
    n_speakers: Optional[int] = None,
) -> Tuple[np.ndarray, List[Dict[str, Any]]]:
    """(audio, reference turns) — a turn-taking conversation with known
    speaker times. Turn/overlap statistics mirror training's
    diarization_window but at scene scale; adjacent same-speaker turns are
    merged in the reference (matching the pipeline's min_duration_off
    bridging semantics)."""
    if n_speakers is None:
        n_speakers = int(rng.integers(2, 4))
    voices = [synth.random_voice(rng) for _ in range(n_speakers)]
    n = int(dur_s * SR)
    audio = np.zeros(n, np.float32)
    turns: List[Dict[str, Any]] = []

    t = float(rng.uniform(0.2, 1.5))
    cur = int(rng.integers(0, n_speakers))
    while t < dur_s - 1.0:
        turn = float(rng.uniform(1.2, 6.0))
        i0, i1 = int(t * SR), min(n, int((t + turn) * SR))
        if i1 - i0 > SR // 5:
            seg, _ = synth.synth_utterance(rng, voices[cur],
                                           (i1 - i0) / SR + 1e-4)
            audio[i0:i1] += seg[: i1 - i0]
            turns.append({"start": round(i0 / SR, 3),
                          "end": round(i1 / SR, 3),
                          "speaker": f"REF_{cur}"})
        if n_speakers > 1 and rng.uniform() < 0.25:
            t = t + turn * float(rng.uniform(0.7, 0.95))  # overlap
        else:
            t = t + turn + float(rng.uniform(0.2, 1.2))
        if n_speakers > 1:
            nxt = int(rng.integers(0, n_speakers))
            cur = nxt if nxt != cur else (nxt + 1) % n_speakers

    noise_level = float(np.exp(rng.uniform(np.log(0.002), np.log(0.05))))
    audio += noise_level * synth.synth_noise(rng, n)

    # merge adjacent same-speaker turns separated by < 0.2 s
    turns.sort(key=lambda d: d["start"])
    merged: List[Dict[str, Any]] = []
    for t_ in turns:
        if (merged and merged[-1]["speaker"] == t_["speaker"]
                and t_["start"] - merged[-1]["end"] < 0.2):
            merged[-1]["end"] = max(merged[-1]["end"], t_["end"])
        else:
            merged.append(dict(t_))
    return audio.astype(np.float32), merged


def run_battery(
    pipeline,
    n_scenes: int = 8,
    seed: int = 7000,
    strength: float = 1.0,
    collar_s: float = 0.25,
    dur_s: float = 45.0,
) -> Dict[str, Any]:
    """Score ``pipeline`` on n_scenes clean AND augmented scenes.

    Same scenes (same seeds) in both conditions, so the augmented-minus-
    clean DER delta isolates robustness to the recording chain. Returns
    per-scene reports and clean/augmented mean DER.
    """
    from whisper_aries_tpu.training.augment import augment

    reports: List[Dict[str, Any]] = []
    for k in range(n_scenes):
        rng = np.random.default_rng(seed + k)
        audio, ref = conversation_scene(rng, dur_s=dur_s)
        row: Dict[str, Any] = {"scene": k, "n_ref_speakers":
                               len({t['speaker'] for t in ref})}
        for cond, wav in (
            ("clean", audio),
            ("augmented", augment(np.random.default_rng(90_000 + k),
                                  audio, strength=strength)),
        ):
            hyp = pipeline(wav)
            m = diarization_error_rate(ref, hyp, collar_s=collar_s)
            m["n_hyp_speakers"] = len({t["speaker"] for t in hyp})
            row[cond] = m
        reports.append(row)
    return {
        "scenes": reports,
        "clean_der": float(np.mean([r["clean"]["der"] for r in reports])),
        "augmented_der": float(np.mean(
            [r["augmented"]["der"] for r in reports])),
        "collar_s": collar_s,
        "strength": strength,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--strength", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=7000)
    ap.add_argument("--collar", type=float, default=0.25)
    ap.add_argument("--duration", type=float, default=45.0)
    ap.add_argument("--weights", default=None,
                    help="checkpoint dir (default: shipped weights) — lets "
                         "a retrain be battery-scored before shipping")
    args = ap.parse_args(argv)

    from whisper_aries_tpu.diarize.pipeline import DiarizationPipeline

    pipeline = DiarizationPipeline(model_dir=args.weights)
    rep = run_battery(pipeline, n_scenes=args.scenes, seed=args.seed,
                      strength=args.strength, collar_s=args.collar,
                      dur_s=args.duration)
    print(json.dumps(rep, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
