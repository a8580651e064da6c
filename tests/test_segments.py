"""Unit tests for segment math (overlap, alignment, chunk reconciliation)."""

import numpy as np
import pytest

from whisper_aries_tpu.utils.segments import (
    align_segments,
    merge_overlapping_segments,
    remove_overlaps_drop,
    segment_overlap,
)


def test_segment_overlap_basic():
    assert segment_overlap((0.0, 2.0), (1.0, 3.0)) == pytest.approx(1.0)
    assert segment_overlap((0.0, 1.0), (2.0, 3.0)) == 0.0
    assert segment_overlap((0.0, 5.0), (1.0, 2.0)) == pytest.approx(1.0)
    assert segment_overlap((1.0, 1.0), (0.0, 5.0)) == 0.0


def test_align_majority_overlap():
    trans = [{"text": "hello", "start": 0.0, "end": 4.0}]
    diar = [
        {"start": 0.0, "end": 3.0, "speaker": "SPEAKER_00"},
        {"start": 3.0, "end": 4.0, "speaker": "SPEAKER_01"},
    ]
    out = align_segments(trans, diar, confidence_threshold=0.5)
    assert len(out) == 1
    assert out[0]["speaker"] == "SPEAKER_00"
    assert out[0]["confidence"] == pytest.approx(0.75)
    assert set(out[0]) == {"text", "start", "end", "speaker", "confidence"}


def test_align_below_threshold_gives_none():
    trans = [{"text": "x", "start": 0.0, "end": 2.0}]
    diar = [
        {"start": 0.0, "end": 1.0, "speaker": "A"},
        {"start": 1.0, "end": 2.0, "speaker": "B"},
    ]
    out = align_segments(trans, diar, confidence_threshold=0.7)
    assert out[0]["speaker"] is None
    assert out[0]["confidence"] == pytest.approx(0.5)


def test_align_no_overlap():
    trans = [{"text": "x", "start": 10.0, "end": 12.0}]
    diar = [{"start": 0.0, "end": 1.0, "speaker": "A"}]
    out = align_segments(trans, diar)
    assert out[0]["speaker"] is None
    assert out[0]["confidence"] == 0.0


def test_align_empty_diarization():
    trans = [{"text": "x", "start": 0.0, "end": 1.0}]
    assert align_segments(trans, [])[0]["speaker"] is None
    assert align_segments([], []) == []


def test_align_speaker_split_across_turns():
    # Same speaker in several short turns must accumulate.
    trans = [{"text": "x", "start": 0.0, "end": 3.0}]
    diar = [
        {"start": 0.0, "end": 1.0, "speaker": "A"},
        {"start": 1.0, "end": 2.4, "speaker": "B"},
        {"start": 2.4, "end": 3.0, "speaker": "A"},
    ]
    out = align_segments(trans, diar, confidence_threshold=0.5)
    assert out[0]["speaker"] == "A"
    assert out[0]["confidence"] == pytest.approx(1.6 / 3.0)


def test_align_matches_naive_reference_semantics(rng):
    """Property test: vectorised alignment == straightforward per-segment
    loop implementing the reference's scoring rule (utils.py:46-68)."""

    def naive(trans, diar, thr):
        out = []
        for t in trans:
            scores = {}
            for d in diar:
                ov = segment_overlap((t["start"], t["end"]), (d["start"], d["end"]))
                if ov > 0:
                    scores[d["speaker"]] = scores.get(d["speaker"], 0.0) + ov
            if scores:
                total = sum(scores.values())
                best = max(scores, key=scores.get)
                conf = scores[best] / total
                spk = best if conf >= thr else None
            else:
                conf, spk = 0.0, None
            out.append({**{k: t[k] for k in ("text", "start", "end")},
                        "speaker": spk, "confidence": conf})
        return out

    for trial in range(5):
        nt, nd = int(rng.integers(1, 60)), int(rng.integers(1, 80))
        starts = np.sort(rng.uniform(0, 100, nt))
        trans = [
            {"text": f"t{i}", "start": float(s), "end": float(s + rng.uniform(0.1, 8))}
            for i, s in enumerate(starts)
        ]
        dstarts = np.sort(rng.uniform(0, 100, nd))
        diar = [
            {
                "start": float(s),
                "end": float(s + rng.uniform(0.1, 6)),
                "speaker": f"SPEAKER_{int(rng.integers(0, 4)):02d}",
            }
            for s in dstarts
        ]
        got = align_segments(trans, diar, 0.5)
        want = naive(trans, diar, 0.5)
        for g, w, t in zip(got, want, trans):
            assert g["confidence"] == pytest.approx(w["confidence"], abs=1e-9)
            # On exact score ties the winner depends on iteration order in the
            # reference (dict insertion), which is not a meaningful contract —
            # only compare the chosen speaker when the max is unique.
            scores = {}
            for d in diar:
                ov = segment_overlap((t["start"], t["end"]), (d["start"], d["end"]))
                if ov > 0:
                    scores[d["speaker"]] = scores.get(d["speaker"], 0.0) + ov
            if scores and sorted(scores.values())[-2:-1] != [max(scores.values())]:
                assert g["speaker"] == w["speaker"]


def test_remove_overlaps_drop():
    segs = [
        {"text": "a", "start": 0.0, "end": 170.0, "chunk_id": 0},
        {"text": "dup", "start": 168.0, "end": 172.0, "chunk_id": 1},  # >1s inside
        {"text": "b", "start": 169.5, "end": 175.0, "chunk_id": 1},  # within 1s tol
    ]
    out = remove_overlaps_drop(segs)
    assert [s["text"] for s in out] == ["a", "b"]


def test_merge_overlapping_segments():
    segs = [
        {"text": "hello world", "start": 0.0, "end": 5.0},
        {"text": "world again", "start": 4.0, "end": 8.0},
        {"text": "separate", "start": 9.0, "end": 10.0},
    ]
    out = merge_overlapping_segments(segs)
    assert len(out) == 2
    assert out[0]["end"] == 8.0
    assert "hello world" in out[0]["text"] and "world again" in out[0]["text"]
    # exact-duplicate text is not repeated
    segs2 = [
        {"text": "same text", "start": 0.0, "end": 5.0},
        {"text": "same text", "start": 4.0, "end": 6.0},
    ]
    out2 = merge_overlapping_segments(segs2)
    assert len(out2) == 1 and out2[0]["text"] == "same text"
