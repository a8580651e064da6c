#!/usr/bin/env python
"""Generate examples/sample_audio.wav — a small synthetic two-voice clip
used by demo.py, quick_api_test.py, and the benchmarks. Deterministic, so
the checked-in artifact is reproducible."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_aries_tpu.audio.decode import write_wav  # noqa: E402

SR = 16000


def voice(f0, formant, spans, total_s, seed):
    rng = np.random.default_rng(seed)
    n = int(total_s * SR)
    t = np.arange(n) / SR
    x = 0.002 * rng.standard_normal(n).astype(np.float32)
    for s, e in spans:
        m = (t >= s) & (t < e)
        tm = t[m]
        v = sum(
            (1.0 / (1 + abs(k * f0 - formant) / 300.0))
            * np.sin(2 * np.pi * k * f0 * tm + k)
            for k in range(1, 12)
        )
        env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * tm + seed)
        x[m] += (0.22 * v / 3.0 * env).astype(np.float32)
    return x


def main():
    out = Path(__file__).resolve().parents[1] / "examples" / "sample_audio.wav"
    out.parent.mkdir(exist_ok=True)
    a = voice(115, 550, [(0.5, 3.5), (7.0, 9.5)], 12.0, seed=1)
    b = voice(265, 2300, [(4.0, 6.5), (10.0, 11.5)], 12.0, seed=2)
    write_wav(str(out), a + b, SR)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
