"""Training subsystem: synthetic corpus generators, param IO, short training
runs that must actually learn (loss decreases / beats baseline)."""

import numpy as np
import pytest

from whisper_aries_tpu.training import synth
from whisper_aries_tpu.utils.params_io import (
    flatten_params,
    load_params_into,
    save_params,
    unflatten_into,
)


def test_synth_vad_example_shapes():
    rng = np.random.default_rng(0)
    audio, labels = synth.vad_example(rng)
    assert len(audio) == len(labels) * synth.VAD_FRAME
    assert 0.0 <= labels.mean() <= 1.0
    assert np.isfinite(audio).all()


def test_synth_diarization_window_constraints():
    rng = np.random.default_rng(1)
    for _ in range(5):
        audio, act = synth.diarization_window(rng)
        assert act.shape == (500, 3)
        # powerset constraint: <= 2 simultaneously active
        assert (act.sum(axis=1) <= 2).all()
        assert np.isfinite(audio).all()


def test_synth_speakers_are_distinct():
    """Mel statistics of two different voices differ more than two
    utterances of the same voice (the property the embedding net learns)."""
    from whisper_aries_tpu.audio.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(2)
    va, vb = synth.random_voice(rng), synth.random_voice(rng)

    def stats(v):
        a, _ = synth.synth_utterance(rng, v, 3.0)
        m = log_mel_spectrogram_np(a)
        return m.mean(axis=1)

    a1, a2, b1 = stats(va), stats(va), stats(vb)
    assert np.linalg.norm(a1 - a2) < np.linalg.norm(a1 - b1)


def test_params_io_roundtrip(tmp_path):
    params = {
        "stem": [{"w": np.ones((2, 3)), "b": np.zeros(2)}],
        "head": {"w": np.full((3, 1), 2.0)},
    }
    flat = flatten_params(params)
    assert set(flat) == {"stem.0.w", "stem.0.b", "head.w"}
    path = str(tmp_path / "p.safetensors")
    save_params(path, params)
    template = {
        "stem": [{"w": np.zeros((2, 3)), "b": np.ones(2)}],
        "head": {"w": np.zeros((3, 1))},
    }
    loaded = load_params_into(template, path)
    np.testing.assert_array_equal(np.asarray(loaded["head"]["w"]), params["head"]["w"])
    np.testing.assert_array_equal(np.asarray(loaded["stem"][0]["b"]), params["stem"][0]["b"])


def test_params_io_missing_key_raises(tmp_path):
    path = str(tmp_path / "p.safetensors")
    save_params(path, {"a": np.ones(2)})
    with pytest.raises(ValueError):
        load_params_into({"a": np.zeros(2), "b": np.zeros(3)}, path)


@pytest.mark.slow
def test_vad_training_learns():
    from whisper_aries_tpu.training.diarize_train import train_vad

    params, m = train_vad(steps=40, batch=8, n_train=48, n_val=24,
                          log_every=1000)
    assert m["val_acc"] > m["val_acc_energy_baseline"]


@pytest.mark.slow
def test_shipped_vad_weights_beat_energy_scorer():
    """The committed vad.safetensors must beat the energy detector on a
    fresh synthetic validation draw (Silero-replacement quality gate)."""
    import jax.numpy as jnp

    from whisper_aries_tpu.models.vad_net import (
        init_vad,
        make_nn_speech_scorer,
        vad_forward,
    )
    from whisper_aries_tpu.utils.params_io import (
        default_weights_dir,
        load_params_into,
    )
    from whisper_aries_tpu.vad.energy import get_speech_probs

    path = default_weights_dir() / "vad.safetensors"
    if not path.exists():
        pytest.skip("no shipped VAD weights")
    params = load_params_into(init_vad(), str(path))
    rng = np.random.default_rng(777)
    acc_nn, acc_en = [], []
    for _ in range(12):
        audio, labels = synth.vad_example(rng)
        probs = np.asarray(vad_forward(params, jnp.asarray(audio[None])))[0]
        acc_nn.append(((probs > 0.5) == (labels > 0.5)).mean())
        acc_en.append(((get_speech_probs(audio) > 0.5) == (labels > 0.5)).mean())
    assert np.mean(acc_nn) > np.mean(acc_en) + 0.05
    # the engine-facing scorer adapter returns per-frame probs
    scorer = make_nn_speech_scorer(params)
    p = scorer(audio)
    assert p.shape == (len(audio) // synth.VAD_FRAME,)


@pytest.mark.slow
def test_shipped_diarization_weights_beat_melstats():
    """Neural diarization (shipped checkpoints) must label a held-out
    synthetic 2-speaker conversation better than the mel-stats fallback."""
    from whisper_aries_tpu.diarize.pipeline import DiarizationPipeline
    from whisper_aries_tpu.utils.params_io import default_weights_dir

    wd = default_weights_dir()
    if not ((wd / "segmentation.safetensors").exists()
            and (wd / "embedding.safetensors").exists()):
        pytest.skip("no shipped diarization weights")

    rng = np.random.default_rng(4242)
    voices = [synth.random_voice(rng) for _ in range(2)]
    # alternating clean turns (no overlap) so ground truth is unambiguous
    n = 24 * synth.SR
    audio = np.zeros(n, np.float32)
    truth = []  # (start, end, spk)
    t = 0.5
    spk = 0
    while t < 22.0:
        dur = float(rng.uniform(1.5, 3.0))
        i0, i1 = int(t * synth.SR), min(n, int((t + dur) * synth.SR))
        seg, _ = synth.synth_utterance(rng, voices[spk], (i1 - i0) / synth.SR + 1e-4)
        audio[i0:i1] += seg[: i1 - i0]
        truth.append((t, t + dur, spk))
        t += dur + float(rng.uniform(0.4, 0.8))
        spk = 1 - spk

    def label_accuracy(turns):
        if not turns:
            return 0.0
        # score both speaker-name assignments, take the best (labels are
        # arbitrary); accuracy = fraction of truth time covered by the
        # correct speaker
        best = 0.0
        for flip in (False, True):
            good = total = 0.0
            for (s, e, spk) in truth:
                total += e - s
                want = f"SPEAKER_{(1 - spk if flip else spk):02d}"
                for turn in turns:
                    if turn["speaker"] != want:
                        continue
                    good += max(0.0, min(e, turn["end"]) - max(s, turn["start"]))
            best = max(best, good / max(total, 1e-9))
        return best

    neural = DiarizationPipeline()  # default: shipped weights
    assert neural.seg_params is not None and neural.emb_params is not None
    classical = DiarizationPipeline(model_dir="/nonexistent")
    acc_n = label_accuracy(neural(audio, num_speakers=2))
    acc_c = label_accuracy(classical(audio, num_speakers=2))
    assert acc_n >= acc_c - 0.05  # at minimum not worse
    assert acc_n > 0.7, (acc_n, acc_c)
