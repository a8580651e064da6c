#!/usr/bin/env python
"""Decompose the engine path's wall time (transcribe_file) on TPU.

The core bench loop runs at 351.9x but the product path measures 178.5x
— this wraps the engine's stage methods with timers and runs warm reps
on the same synthetic 36-minute WAV bench.py uses, printing where the
non-device seconds go (preload, plan, upload, per-batch dispatch, host
token parse, the blocking device fetch, output merge).

Usage: python scripts/profile_engine.py [minutes] [reps]
"""
import os
import sys
import time
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 36.0
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from whisper_aries_tpu.audio.decode import write_wav
from whisper_aries_tpu.pipeline import engine as E

sr = 16000
rng = np.random.default_rng(0)
t = np.arange(int(minutes * 60 * sr)) / sr
x = (0.25 * np.sin(2 * np.pi * 220 * t)
     * (0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t))).astype(np.float32)
x += 0.01 * rng.standard_normal(len(t)).astype(np.float32)
wav = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
write_wav(wav.name, x, sr)

eng = E.AriesTranscriber(model_size="large-v3", allow_random=True)

times = defaultdict(float)
counts = defaultdict(int)


def wrap(obj, name):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        times[name] += time.time() - t0
        counts[name] += 1
        return out

    setattr(obj, name, timed)


for m in ("_make_uploader", "_gather_span", "_plan", "_decode_batch", "_parse_one",
          "_mel", "_encode_batch", "_gather_windows",
          "_window_starts_lengths"):
    wrap(eng, m)

# AudioPreloader is constructed inside transcribe_file — wrap the class
orig_pre = E.AudioPreloader


class TimedPre(orig_pre):
    def __init__(self, *a, **k):
        t0 = time.time()
        super().__init__(*a, **k)
        times["AudioPreloader"] += time.time() - t0
        counts["AudioPreloader"] += 1


E.AudioPreloader = TimedPre

# np.asarray fetch wait inside _transcribe_windows: wrap numpy? too
# broad — attribute it as (total - sum(stages)) instead.


def run():
    return eng.transcribe_file(
        wav.name, language="en", beam_size=5, max_new_tokens=100,
        output_formats=(), vad_filter=False, temperature=(0.0,),
    )


t0 = time.time()
res = run()
print(f"warmup (incl compile): {time.time()-t0:.1f}s "
      f"({res['num_windows']} windows)", flush=True)

for r in range(reps):
    times.clear()
    counts.clear()
    t0 = time.time()
    res = run()
    total = time.time() - t0
    dur = minutes * 60.0
    print(f"\nrep {r}: {total:.3f}s -> {dur/total:.1f}x realtime", flush=True)
    acc = 0.0
    for name, tv in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {name:26s} {tv:7.3f}s  x{counts[name]}", flush=True)
        acc += tv
    print(f"  {'(unattributed: fetch-wait etc)':26s} {total-acc:7.3f}s",
          flush=True)
