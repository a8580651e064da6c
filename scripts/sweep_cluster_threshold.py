#!/usr/bin/env python
"""Sweep the AHC clustering threshold on a DEV scene set.

The diarize battery (eval/diarize_battery.py, seed 7000) is the TEST
set — tuning on it would overfit the reported number. This sweep builds
an independent DEV set from the same conversation_scene generator at a
disjoint seed range and scores DiarizationPipeline at several stopping
thresholds, for a given weights dir. The chosen threshold is then
validated ONCE on the battery.

Usage: python scripts/sweep_cluster_threshold.py [weights_dir] \
          [t1,t2,...] [n_scenes]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    from whisper_aries_tpu.diarize.pipeline import DiarizationPipeline
    from whisper_aries_tpu.eval.diarize_battery import run_battery

    wdir = sys.argv[1] if len(sys.argv) > 1 else None
    ts = [float(t) for t in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else ["0.53", "0.60", "0.67", "0.74"])]
    n_scenes = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    out = {}
    for t in ts:
        pipeline = DiarizationPipeline(model_dir=wdir,
                                       clustering_threshold=t)
        rep = run_battery(pipeline, n_scenes=n_scenes, seed=5000)
        out[t] = {"clean": rep["clean_der"], "aug": rep["augmented_der"],
                  "hyp_clean": [s["clean"]["n_hyp_speakers"]
                                for s in rep["scenes"]],
                  "ref": [s["n_ref_speakers"] for s in rep["scenes"]]}
        print(f"t={t:.2f}: clean={rep['clean_der']:.3f} "
              f"aug={rep['augmented_der']:.3f} "
              f"hyp={out[t]['hyp_clean']} ref={out[t]['ref']}",
              flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
