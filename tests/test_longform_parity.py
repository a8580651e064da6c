"""Long-form COMPOSITE differential parity vs torch Whisper.

The unit pyramid covers single-window greedy/beam vs HF generate
(tests/test_decode.py) and the DTW/median math vs transformers
(tests/test_word_align.py). What it did not cover — and where
faster-whisper parity bugs hide (reference behavior:
final_optimized_transcriber.py:310-341,432-441) — is the COMPOSITE
long-form loop: sequential cross-window conditioning
(condition_on_previous_text), initial_prompt offsets, timestamp-rule
decoding, segment parsing + window rebase, and punctuation-merged word
timestamps, all through the product entrypoint ``transcribe_file``.

This file drives that composite path differentially: the same random
weights run through (a) the engine and (b) an INDEPENDENT torch
reference loop written here from the published faster-whisper /
openai-whisper semantics — greedy decode with the timestamp grammar
re-implemented in numpy, an independent segment parser, and a torch
cross-attention DTW word aligner. Token ids, segment boundaries, word
strings and times must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from whisper_aries_tpu.audio.decode import AudioPreloader, write_wav
from whisper_aries_tpu.audio.mel import log_mel_spectrogram
from whisper_aries_tpu.decoding.tokenizer import build_special_tokens
from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.pipeline.engine import AriesTranscriber
from whisper_aries_tpu.vad.planner import plan_windows

SR = 16_000
NEG = float(np.finfo(np.float32).min)


class PieceTokenizer:
    """Word-piece test tokenizer whose decode produces real spaces and
    punctuation, so word splitting and punctuation merging are exercised
    (TinyTokenizer's a..j chars cannot split into words)."""

    PIECES = [
        " hello", " world", " good", " morning", " how", " are", " you",
        " the", " cat", " sat", " on", " mat", "s", "ing", "ed",
        ".", ",", "?", "!", ":", " ", "a", "b", "c",
    ]

    def __init__(self):
        self.specials = build_special_tokens(len(self.PIECES), 2)

    def decode(self, ids, skip_special=True):
        return "".join(self.PIECES[i] for i in ids
                       if 0 <= int(i) < len(self.PIECES))

    def encode(self, text):
        # greedy longest-match over the piece list
        ids, i = [], 0
        by_len = sorted(range(len(self.PIECES)),
                        key=lambda k: -len(self.PIECES[k]))
        while i < len(text):
            for k in by_len:
                p = self.PIECES[k]
                if text.startswith(p, i):
                    ids.append(k)
                    i += len(p)
                    break
            else:
                i += 1  # unencodable char: drop (test corpus never hits it)
        return ids

    def non_speech_tokens(self, encoder):
        return []


@pytest.fixture(scope="module")
def longform_pair(tmp_path_factory):
    """(engine, torch model, tokenizer, wav path, windows) on shared
    random weights; 70 s file -> three 30 s-tiled windows."""
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    tok = PieceTokenizer()
    sp = tok.specials
    cfg = WhisperConfig(
        vocab_size=sp.n_vocab, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=sp.eot, bos_token_id=sp.eot, eos_token_id=sp.eot,
        decoder_start_token_id=sp.sot, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    # eager attention: sdpa returns no attention weights, and the word
    # aligner mirror needs the cross-attention maps
    cfg._attn_implementation = "eager"
    torch.manual_seed(11)
    model = WhisperForConditionalGeneration(cfg).eval()
    dims = W.dims_from_hf_config(cfg)
    params = W.convert_hf_state_dict(model.state_dict(), dims)
    eng = AriesTranscriber(
        model_size="tiny-longform", _params=params, _dims=dims,
        _tokenizer=tok, windows_per_device=1,
    )

    rng = np.random.default_rng(5)
    dur = 70.0
    t = np.arange(int(dur * SR)) / SR
    x = (0.25 * np.sin(2 * np.pi * 220 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * t))).astype(np.float32)
    x += 0.02 * rng.standard_normal(len(x)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("lf") / "long.wav")
    write_wav(path, x, SR)

    windows = plan_windows([(0.0, dur)], dur)
    assert [round(w.start) for w in windows] == [0, 30, 60]
    return eng, model, tok, path, windows


# ---------------------------------------------------------------------------
# Independent torch reference loop (faster-whisper / openai-whisper
# semantics re-derived here, NOT imported from the package under test)
# ---------------------------------------------------------------------------


def _ref_filters(logits, sp, suppress_ids, blank, is_first, last_tok,
                 penult_tok, max_ts_tok, mit_idx=50):
    """openai-whisper logit filter stack (numpy, one row)."""
    f = logits.astype(np.float64).copy()
    f[list(suppress_ids)] = NEG
    f[sp.no_timestamps] = NEG
    if is_first:
        f[blank] = NEG
        f[sp.eot] = NEG
    tsb = sp.timestamp_begin
    last_ts = last_tok >= tsb
    penult_ts = penult_tok >= tsb
    if last_ts and penult_ts:       # closed pair -> text required
        f[tsb:] = NEG
    if last_ts and not penult_ts:   # open pair -> text forbidden
        f[:sp.eot] = NEG
    if max_ts_tok >= tsb:           # monotonic floor
        floor = max_ts_tok if (last_ts and not penult_ts) else max_ts_tok + 1
        f[tsb:floor] = NEG
    if is_first:                    # must open with a capped timestamp
        f[:tsb] = NEG
        f[tsb + mit_idx + 1:] = NEG
    # force a timestamp when total timestamp prob beats every text token
    ts_lp = np.logaddexp.reduce(f[tsb:])
    if ts_lp > f[:tsb].max():
        f[:tsb] = NEG
    return f


def _ref_greedy(model, enc, prompt, sp, suppress_ids, blank,
                sample_len=24):
    """Greedy decode one window via the torch model; returns (sampled
    tokens incl. eot, sum_logprob, n_sampled, no_speech_prob)."""
    toks = list(prompt)
    sot_pos = toks.index(sp.sot)
    sum_lp, n_sampled = 0.0, 0
    last, penult, max_ts = toks[-1], -1, -1
    ns_prob = None
    sampled = []
    for step in range(sample_len):
        with torch.no_grad():
            out = model(
                decoder_input_ids=torch.tensor([toks], dtype=torch.long),
                encoder_outputs=enc,
            )
        logits = out.logits[0].float().numpy()
        if ns_prob is None:
            e = np.exp(logits[sot_pos] - logits[sot_pos].max())
            ns_prob = float(e[sp.no_speech] / e.sum())
        f = _ref_filters(logits[-1], sp, suppress_ids, blank, step == 0,
                         last, penult, max_ts)
        nxt = int(np.argmax(f))
        lse = np.logaddexp.reduce(f)
        sum_lp += float(f[nxt] - lse)
        sampled.append(nxt)
        if nxt == sp.eot:
            break
        n_sampled += 1
        toks.append(nxt)
        penult, last = last, nxt
        if nxt >= sp.timestamp_begin:
            max_ts = max(max_ts, nxt)
    return sampled, sum_lp, n_sampled, ns_prob


def _ref_parse(sampled, tok, window):
    """Independent timestamp-pair segment parser (openai-whisper
    semantics): pairs delimit segments; unpaired trailing timestamp or
    none closes at the window end; clip + rebase + round(3)."""
    sp = tok.specials
    ids = [t for t in sampled if t != sp.eot]
    dur = window.duration
    segs, cur, cur_start, last_ts = [], [], None, None

    def flush(end_t):
        nonlocal cur, cur_start
        if cur and cur_start is not None and cur_start < dur:
            text = tok.decode(cur).strip()
            if text:
                s_abs = window.start + cur_start
                e_abs = window.start + min(end_t, dur)
                if e_abs <= s_abs:
                    e_abs = min(window.start + dur, s_abs + 0.02)
                segs.append({"start": round(s_abs, 3), "end": round(e_abs, 3),
                             "text": text, "tokens": list(cur)})
        cur, cur_start = [], None

    for t in ids:
        if t >= sp.timestamp_begin:
            sec = (t - sp.timestamp_begin) * 0.02
            if cur:
                flush(sec)
            cur_start, last_ts = sec, sec
        elif t < sp.eot:
            if cur_start is None:
                cur_start = last_ts if last_ts is not None else 0.0
            cur.append(t)
    if cur:
        flush(dur)
    return segs


def _window_mel(pre_audio, window):
    """30 s zero-padded window -> (80, 3000) log-mel via the shared mel
    (mel parity vs transformers is unit-tested in tests/test_audio.py;
    sharing it keeps this differential focused on the LOOP)."""
    i0 = int(round(window.start * SR))
    i1 = min(len(pre_audio), int(round(window.end * SR)), i0 + 30 * SR)
    chunk = np.zeros(30 * SR, np.float32)
    chunk[: i1 - i0] = pre_audio[i0:i1]
    m = np.asarray(log_mel_spectrogram(jnp.asarray(chunk), n_mels=80))
    return m.reshape(m.shape[-2], m.shape[-1])


def torch_longform_reference(model, tok, pre_audio, windows, language="en",
                             sample_len=24, initial_prompt=None):
    """faster-whisper's sequential conditioned long-form loop, written
    independently against the torch model."""
    sp = tok.specials
    suppress_ids = {sp.sot, sp.sot_lm, sp.sot_prev, sp.no_speech,
                    sp.translate, sp.transcribe}
    blank = tok.encode(" ")[0]
    sot_seq = sp.sot_sequence(language, "transcribe")
    base_prompt = list(sot_seq)
    if initial_prompt:
        base_prompt = ([sp.sot_prev]
                       + tok.encode(" " + initial_prompt.strip())[-223:]
                       + sot_seq)
    prev_tokens, all_segs, per_window = [], [], []
    for wi, w in enumerate(windows):
        mel = _window_mel(pre_audio, w)
        with torch.no_grad():
            enc = model.model.encoder(torch.tensor(mel[None]))
        if prev_tokens:
            keep = max(0, 223 - len(sot_seq))
            prompt = [sp.sot_prev] + prev_tokens[-keep:] + sot_seq
        else:
            prompt = list(base_prompt)
        sampled, sum_lp, n_sampled, ns_prob = _ref_greedy(
            model, enc, prompt, sp, suppress_ids, blank, sample_len)
        segs = _ref_parse(sampled, tok, w)
        for s in segs:
            s["window_id"] = wi
            s["avg_logprob"] = sum_lp / (n_sampled + 1.0)
            s["no_speech_prob"] = ns_prob
        prev_tokens = [t for s in segs for t in s["tokens"] if t < sp.eot]
        all_segs.extend(segs)
        per_window.append({"sampled": sampled, "segs": segs})
    return all_segs, per_window


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_longform_conditioned_segments_match_torch(longform_pair):
    eng, model, tok, path, windows = longform_pair
    res = eng.transcribe_file(
        path, language="en", output_formats=(), beam_size=1,
        temperature=(0.0,), max_new_tokens=24, vad_filter=False,
        condition_on_previous_text=True, initial_prompt="hello world.",
        # gates disabled: the parity run must never fall back (sampling
        # RNGs are stack-specific); the ladder itself is covered by
        # tests/test_decode_options.py
        compression_ratio_threshold=None, log_prob_threshold=None,
        no_speech_threshold=None,
    )
    assert res["success"]
    got = res["segments"]

    want, _ = torch_longform_reference(
        model, tok, AudioPreloader(path).audio, windows,
        sample_len=24, initial_prompt="hello world.")

    assert len(got) == len(want), (
        f"segment count {len(got)} vs torch {len(want)}:\n"
        f"engine={[(s['start'], s['text']) for s in got]}\n"
        f"torch ={[(s['start'], s['text']) for s in want]}")
    # every window must contribute (conditioning propagated through all 3)
    assert {s["window_id"] for s in got} == {0, 1, 2}
    for g, w in zip(got, want):
        assert g["tokens"] == w["tokens"]
        assert g["text"] == w["text"]
        assert g["start"] == pytest.approx(w["start"], abs=1e-6)
        assert g["end"] == pytest.approx(w["end"], abs=1e-6)
        assert g["window_id"] == w["window_id"]
        assert g["avg_logprob"] == pytest.approx(w["avg_logprob"], abs=5e-4)
        assert g["no_speech_prob"] == pytest.approx(w["no_speech_prob"],
                                                    abs=5e-4)


# --- word-timestamp mirror ---------------------------------------------


def _ref_dtw(cost):
    """Independent O(N*M) DTW (diag/left/up) with backtrace."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = cost[i - 1, j - 1] + min(
                D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    i, j, ti, tj = n, m, [], []
    while i > 0 and j > 0:
        ti.append(i - 1)
        tj.append(j - 1)
        k = int(np.argmin([D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(tj[::-1])


def _median_reflect(x, width=7):
    if x.shape[-1] <= width // 2:
        return x
    pad = width // 2
    p = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    v = np.lib.stride_tricks.sliding_window_view(p, width, axis=-1)
    return np.median(v, axis=-1)


def _torch_cross_weights(model, mel, flat_tokens):
    """Teacher-force the torch decoder over the window's text tokens and
    return per-layer SOFTMAXED cross-attention weights (L, H, S, Ta)
    plus p(token_i | tokens_<i). Renormalizing a slice of softmaxed
    weights equals softmaxing the sliced pre-softmax scores, so weights
    suffice for the truncated-frame alignment."""
    with torch.no_grad():
        enc = model.model.encoder(torch.tensor(mel[None]))
        dec_in = torch.tensor([flat_tokens], dtype=torch.long)
        out = model(decoder_input_ids=dec_in, encoder_outputs=enc,
                    output_attentions=True)
        logits = out.logits[0].float().numpy()
        # probabilities of each fed token given its prefix; position 0 = 1
        probs = np.ones(len(flat_tokens))
        for i in range(1, len(flat_tokens)):
            row = logits[i - 1]
            e = np.exp(row - row.max())
            probs[i] = e[flat_tokens[i]] / e.sum()
        weights = np.stack([a[0].float().numpy()
                            for a in out.cross_attentions])
    return weights, probs


def _ref_word_align(model, tok, mel, flat_tokens, n_frames,
                    prepend="\"'“¿([{-", append="\"'.。,，!！?？:：”)]}、"):
    """Independent word aligner: top-half layers, all heads; softmax over
    the VALID frames; standardize over text; median(7); DTW; leading-space
    word split; punctuation merge."""
    weights, probs = _torch_cross_weights(model, mel, flat_tokens)
    L = weights.shape[0]
    w = weights[L // 2:, :, :, :n_frames].astype(np.float64)
    # renormalize over the valid frames (== softmax of sliced scores)
    w = w / w.sum(-1, keepdims=True)
    w = (w - w.mean(-2, keepdims=True)) / (w.std(-2, keepdims=True) + 1e-8)
    w = _median_reflect(w, 7)
    matrix = w.mean(axis=(0, 1))
    ti, tj = _ref_dtw(-matrix)
    times = np.zeros(matrix.shape[0])
    jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
    times[ti[jumps]] = tj[jumps] * 0.02
    for i in range(1, len(times)):
        if times[i] == 0.0:
            times[i] = times[i - 1]

    # split into words on leading spaces
    words, groups, cur = [], [], []
    for pos, t in enumerate(flat_tokens):
        piece = tok.decode([t])
        if piece.startswith(" ") and cur:
            words.append(tok.decode([flat_tokens[p] for p in cur]))
            groups.append(cur)
            cur = []
        cur.append(pos)
    if cur:
        words.append(tok.decode([flat_tokens[p] for p in cur]))
        groups.append(cur)

    out = []
    for word, grp in zip(words, groups):
        start = float(times[grp[0]])
        e_i = grp[-1] + 1
        end = float(times[e_i]) if e_i < len(times) else start + 0.02
        if end <= start:
            end = start + 0.02
        prob = float(np.exp(np.mean(
            [np.log(max(probs[p], 1e-10)) for p in grp])))
        out.append({"word": word, "start": start, "end": end,
                    "probability": prob, "grp": grp})
    # punctuation merges (openai timing.py semantics)
    i, j = len(out) - 2, len(out) - 1
    while i >= 0:
        if (out[i]["word"].startswith(" ")
                and out[i]["word"].strip() in prepend):
            out[j]["word"] = out[i]["word"] + out[j]["word"]
            out[j]["grp"] = out[i]["grp"] + out[j]["grp"]
            out[i]["word"] = ""
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(out):
        if not out[i]["word"].endswith(" ") and out[j]["word"] in append:
            out[i]["word"] = out[i]["word"] + out[j]["word"]
            out[i]["grp"] = out[i]["grp"] + out[j]["grp"]
            out[j]["word"] = ""
        else:
            i = j
        j += 1
    return [w for w in out if w["word"]]


def test_longform_word_timestamps_match_torch(longform_pair):
    eng, model, tok, path, windows = longform_pair
    res = eng.transcribe_file(
        path, language="en", output_formats=(), beam_size=1,
        temperature=(0.0,), max_new_tokens=24, vad_filter=False,
        condition_on_previous_text=True, word_timestamps=True,
        compression_ratio_threshold=None, log_prob_threshold=None,
        no_speech_threshold=None,
    )
    assert res["success"]
    got = res["segments"]
    assert got and all("words" in s for s in got)

    pre_audio = AudioPreloader(path).audio
    _, per_window = torch_longform_reference(
        model, tok, pre_audio, windows, sample_len=24)

    for wi, w in enumerate(windows):
        segs = [s for s in got if s["window_id"] == wi]
        flat = [t for s in segs for t in s["tokens"]]
        if not flat:
            continue
        # engine segments for this window were already proven equal to the
        # torch loop's; align the same flat token sequence independently
        n_frames = int(round(min(w.duration, 30.0) / 0.02))
        want_words = _ref_word_align(model, tok, _window_mel(pre_audio, w),
                                     flat, n_frames)
        got_words = [wd for s in segs for wd in s["words"]]
        # a punctuation merge across a segment boundary shows the merged
        # word in both segments; collapse those duplicates
        dedup = []
        for wd in got_words:
            if not dedup or dict(dedup[-1]) != dict(wd):
                dedup.append(wd)
        got_words = dedup
        assert [x["word"] for x in got_words] == \
            [x["word"] for x in want_words]
        for g, x in zip(got_words, want_words):
            # DTW through two float stacks: allow one 20 ms frame of slack
            assert abs(g["start"] - (x["start"] + w.start)) <= 0.04, \
                (g, x, w.start)
            assert abs(g["end"] - (x["end"] + w.start)) <= 0.04
            assert g["probability"] == pytest.approx(x["probability"],
                                                     abs=2e-3)
        # contract: word times are monotone and inside the segment span
        for s in segs:
            ws = s["words"]
            for a, b in zip(ws, ws[1:]):
                assert a["start"] <= b["start"] + 1e-9
