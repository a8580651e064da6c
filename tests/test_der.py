"""DER metric, recording-chain augmentation, and DER-battery tests."""

import numpy as np
import pytest

from whisper_aries_tpu.eval.der import diarization_error_rate
from whisper_aries_tpu.eval.diarize_battery import (
    conversation_scene,
    run_battery,
)
from whisper_aries_tpu.training import augment as A


def _turns(*triples):
    return [{"start": s, "end": e, "speaker": spk} for s, e, spk in triples]


class TestDER:
    def test_perfect_match_is_zero(self):
        ref = _turns((0, 5, "a"), (5, 9, "b"))
        m = diarization_error_rate(ref, ref)
        assert m["der"] == 0.0 and m["ref_speech_s"] == pytest.approx(9.0)

    def test_speaker_names_dont_matter(self):
        """The optimal mapping must absorb arbitrary hypothesis labels."""
        ref = _turns((0, 5, "a"), (5, 9, "b"), (9, 12, "c"))
        hyp = _turns((0, 5, "SPEAKER_2"), (5, 9, "x"), (9, 12, "y"))
        assert diarization_error_rate(ref, hyp)["der"] == 0.0

    def test_empty_hypothesis_is_all_miss(self):
        ref = _turns((0, 10, "a"))
        m = diarization_error_rate(ref, [])
        assert m["der"] == pytest.approx(1.0, abs=0.02)
        assert m["miss"] == pytest.approx(1.0, abs=0.02)
        assert m["false_alarm"] == 0.0 and m["confusion"] == 0.0

    def test_false_alarm(self):
        ref = _turns((0, 10, "a"))
        hyp = _turns((0, 10, "a"), (10, 15, "b"))
        m = diarization_error_rate(ref, hyp)
        assert m["false_alarm"] == pytest.approx(0.5, abs=0.02)
        assert m["miss"] == 0.0

    def test_confusion_from_swapped_half(self):
        """One ref speaker covered by two hyp speakers: the unmapped half
        scores as confusion, not miss (speech WAS detected)."""
        ref = _turns((0, 10, "a"))
        hyp = _turns((0, 6, "x"), (6, 10, "y"))
        m = diarization_error_rate(ref, hyp)
        assert m["confusion"] == pytest.approx(0.4, abs=0.02)
        assert m["miss"] == 0.0 and m["false_alarm"] == 0.0

    def test_overlap_counting(self):
        """Two simultaneous ref speakers, hyp hears only one: half the
        speech time (one of two channels) is missed."""
        ref = _turns((0, 10, "a"), (0, 10, "b"))
        hyp = _turns((0, 10, "a"))
        m = diarization_error_rate(ref, hyp)
        assert m["der"] == pytest.approx(0.5, abs=0.02)

    def test_collar_forgives_boundary_jitter(self):
        ref = _turns((0, 5, "a"), (5, 10, "b"))
        hyp = _turns((0, 5.2, "a"), (5.2, 10, "b"))
        strict = diarization_error_rate(ref, hyp, collar_s=0.0)
        forgiven = diarization_error_rate(ref, hyp, collar_s=0.25)
        assert strict["der"] > 0.0
        assert forgiven["der"] == 0.0

    def test_many_speakers_greedy_path(self):
        ref = _turns(*[(i * 2, i * 2 + 2, f"r{i}") for i in range(9)])
        hyp = _turns(*[(i * 2, i * 2 + 2, f"h{i}") for i in range(9)])
        assert diarization_error_rate(ref, hyp)["der"] == 0.0


class TestAugment:
    def _speechy(self, n=32000):
        rng = np.random.default_rng(0)
        t = np.arange(n) / 16000.0
        x = 0.2 * np.sin(2 * np.pi * 180 * t) * (
            0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        return (x + 0.01 * rng.standard_normal(n)).astype(np.float32)

    def test_zero_strength_is_identity(self):
        x = self._speechy()
        y = A.augment(np.random.default_rng(1), x, strength=0.0)
        assert np.array_equal(x, y)

    def test_length_and_level_preserved(self):
        x = self._speechy()
        for seed in range(5):
            y = A.augment(np.random.default_rng(seed), x, strength=1.0)
            assert y.shape == x.shape and y.dtype == np.float32
            assert np.abs(y).max() == pytest.approx(np.abs(x).max(), rel=0.05)
            assert np.isfinite(y).all()

    def test_deterministic_given_seed(self):
        x = self._speechy()
        y1 = A.augment(np.random.default_rng(42), x)
        y2 = A.augment(np.random.default_rng(42), x)
        assert np.array_equal(y1, y2)

    def test_transforms_change_signal(self):
        x = self._speechy()
        rng = np.random.default_rng(3)
        for fn in (A.apply_reverb, A.band_limit, A.channel_eq,
                   A.resample_roundtrip, A.clip_distort, A.gain_drift):
            y = fn(rng, x)
            assert y.shape == x.shape
            assert not np.array_equal(y, x)
        y = A.mu_law_roundtrip(x)
        assert y.shape == x.shape and not np.array_equal(y, x)
        # mu-law on near-silence must not blow up
        z = A.mu_law_roundtrip(np.zeros(100, np.float32))
        assert np.array_equal(z, np.zeros(100, np.float32))

    def test_reverb_smears_energy_forward(self):
        """A click grows a decaying tail (the transform actually reverbs)."""
        x = np.zeros(16000, np.float32)
        x[1000] = 1.0
        y = A.apply_reverb(np.random.default_rng(5), x, wet=1.0)
        assert np.abs(y[1200:4000]).max() > 1e-3


class TestShippedWeightsDER:
    @pytest.mark.slow
    def test_der_battery_gate(self):
        """Shipped diarization weights through the full pipeline on two
        held-out synthetic scenes, clean + augmented (recording-chain).
        Bounds are generous vs the measured means (clean 0.18, augmented
        0.35 pre-augmentation-training) — this is a regression gate, not
        a target; eval/diarize_battery.py is the measurement tool."""
        from pathlib import Path

        from whisper_aries_tpu.diarize.pipeline import DiarizationPipeline
        from whisper_aries_tpu.utils.params_io import default_weights_dir

        wd = Path(default_weights_dir())
        if not ((wd / "segmentation.safetensors").exists()
                and (wd / "embedding.safetensors").exists()):
            pytest.skip("no shipped diarization weights")
        # seed-7000 30 s scenes are the characterised operating point
        # (clean 0.16 / augmented 0.25 over scenes 0-2 with the r2 weights;
        # 20 s scenes measured far harder and noisier — clean 0.43)
        rep = run_battery(DiarizationPipeline(), n_scenes=3, seed=7000,
                          dur_s=30.0, collar_s=0.25)
        assert rep["clean_der"] < 0.45, rep
        assert rep["augmented_der"] < 0.75, rep


class TestBattery:
    def test_scene_reference_is_consistent(self):
        rng = np.random.default_rng(11)
        audio, ref = conversation_scene(rng, dur_s=20.0)
        assert len(audio) == 20 * 16000
        assert ref, "scene produced no turns"
        for t in ref:
            assert 0 <= t["start"] < t["end"] <= 20.0
            i0, i1 = int(t["start"] * 16000), int(t["end"] * 16000)
            seg = audio[i0:i1]
            assert np.abs(seg).std() > 1e-4  # audio actually present
        # at most modest overlap of >2 speakers
        spk = {t["speaker"] for t in ref}
        assert 2 <= len(spk) <= 3

    def test_run_battery_with_oracle_pipeline(self):
        """An oracle that returns the (renamed) reference must score ~0 DER
        in BOTH conditions — proves the harness plumbs scenes, augmentation
        and scoring correctly without depending on trained weights."""
        store = {}

        def oracle(wav):
            return store["ref"]

        # monkey-build: run_battery generates scenes internally, so patch
        # conversation_scene to record the reference for the oracle
        import whisper_aries_tpu.eval.diarize_battery as B
        orig = B.conversation_scene

        def recording_scene(rng, dur_s=45.0, n_speakers=None, **kw):
            audio, ref = orig(rng, dur_s=dur_s, n_speakers=n_speakers, **kw)
            store["ref"] = [dict(t, speaker="HYP_" + t["speaker"])
                            for t in ref]
            return audio, ref

        B.conversation_scene = recording_scene
        try:
            rep = run_battery(oracle, n_scenes=2, dur_s=15.0, collar_s=0.0)
        finally:
            B.conversation_scene = orig
        assert rep["clean_der"] == 0.0
        assert rep["augmented_der"] == 0.0
        assert len(rep["scenes"]) == 2
