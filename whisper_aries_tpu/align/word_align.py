"""Word-level timestamps from cross-attention DTW.

Equivalent of faster-whisper's ``word_timestamps=True`` machinery (exposed by
the reference at final_optimized_transcriber.py:316; SURVEY §2.3 N2): the
decoder is run teacher-forced over the already-decoded tokens with
cross-attention weights captured, attention is averaged over the alignment
heads (top half of decoder layers when no per-checkpoint head list is
configured — openai/whisper's fallback), time-normalised, and a monotonic
DTW path maps each token to an encoder frame (20 ms). Tokens are grouped
into words with unicode-aware splitting and each word gets
{word, start, end, probability}.

The attention forward pass runs on device (one batched call per window);
DTW and word grouping are host-side numpy (O(tokens x frames), microseconds
at this scale).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

FRAME_S = 0.02  # one encoder position = 20 ms


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through cost (N_text, N_audio); returns aligned index
    arrays (text_indices, time_indices) along the optimal path."""
    n, m = cost.shape
    D = np.full((n + 1, m + 1), np.inf, dtype=np.float64)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        row_cost = cost[i - 1]
        prev = D[i - 1]
        cur = D[i]
        # transitions: diagonal, left (advance time), up (advance text)
        for j in range(1, m + 1):
            c = row_cost[j - 1]
            best = prev[j - 1]
            if prev[j] < best:
                best = prev[j]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
    # backtrace
    i, j = n, m
    ti, tj = [], []
    while i > 0 and j > 0:
        ti.append(i - 1)
        tj.append(j - 1)
        moves = (D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
        k = int(np.argmin(moves))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(tj[::-1])


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with REFLECT padding — matching
    openai/whisper's timing.py median_filter and transformers'
    _median_filter exactly (edge padding shifts boundary medians)."""
    if width < 3 or x.shape[-1] <= width // 2:
        return x
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def attention_to_token_times(
    cross_qk: np.ndarray,  # (L, H, T_text, T_audio) logits for ONE sequence
    n_frames: int,
    alignment_layers: Optional[Sequence[int]] = None,
    alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
) -> np.ndarray:
    """Token -> time (seconds) via DTW over averaged attention.

    ``alignment_heads``: per-checkpoint (layer, head) pairs from
    generation_config.json (openai/whisper's published head masks) —
    preferred when available; falls back to whole top-half layers.
    """
    L = cross_qk.shape[0]
    if alignment_heads:
        w = np.stack([cross_qk[l, h] for l, h in alignment_heads
                      if l < L and h < cross_qk.shape[1]])
        w = w[None]  # (1, N, T_text, T_audio) — same axes as the layer path
    else:
        layers = (
            list(alignment_layers)
            if alignment_layers is not None
            else list(range(L // 2, L))  # openai/whisper fallback head set
        )
        w = cross_qk[layers]  # (L', H, T_text, T_audio)
    w = w[..., :n_frames]
    # softmax over audio axis in f64 for stability
    w = w.astype(np.float64)
    w = np.exp(w - w.max(axis=-1, keepdims=True))
    w = w / w.sum(axis=-1, keepdims=True)
    # normalise each head across time, then average heads/layers
    mean = w.mean(axis=-2, keepdims=True)
    std = w.std(axis=-2, keepdims=True) + 1e-8
    w = (w - mean) / std
    w = _median_filter(w, 7)
    matrix = w.mean(axis=(0, 1))  # (T_text, T_audio)
    ti, tj = dtw_path(-matrix)
    # first frame where each token appears on the path
    n_text = matrix.shape[0]
    times = np.zeros(n_text)
    jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
    times[ti[jumps]] = tj[jumps] * FRAME_S
    return times


def split_tokens_into_words(
    tokens: Sequence[int], tokenizer
) -> Tuple[List[str], List[List[int]]]:
    """Group text tokens into display words (unicode-aware: split on spaces
    when the language uses them, else on codepoint boundaries).

    Returns (words, token_groups) covering exactly the input tokens.
    """
    sp = tokenizer.specials
    words: List[str] = []
    groups: List[List[int]] = []
    cur: List[int] = []

    def flush():
        nonlocal cur
        if cur:
            text = tokenizer.decode(cur)
            if text.strip():
                words.append(text)
                groups.append(list(cur))
            elif groups:
                groups[-1].extend(cur)
                words[-1] = words[-1] + text
            cur = []

    for tok in tokens:
        tok = int(tok)
        if tok >= sp.eot:
            continue
        piece = tokenizer.decode([tok])
        # a piece starting with a space (or replacement char boundary)
        # begins a new word
        if piece.startswith(" ") and cur:
            flush()
        cur.append(tok)
        # decode may produce replacement chars mid-codepoint; only split when
        # the accumulated text currently ends cleanly
        text = tokenizer.decode(cur)
        if text.endswith("�"):
            continue
    flush()
    return words, groups


def find_word_alignments(
    tokens: Sequence[int],
    cross_qk: np.ndarray,  # (L, H, T_text, T_audio) for this sequence
    tokenizer,
    n_frames: int,
    token_probs: Optional[np.ndarray] = None,
    alignment_layers: Optional[Sequence[int]] = None,
    alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
) -> List[Dict[str, Any]]:
    """Words with times for one decoded sequence (token list incl specials).

    ``cross_qk`` rows must correspond 1:1 with ``tokens``.
    """
    times = attention_to_token_times(cross_qk, n_frames, alignment_layers,
                                     alignment_heads)
    # carry times forward so every token has a start estimate
    for i in range(1, len(times)):
        if times[i] == 0.0 and i > 0:
            times[i] = times[i - 1]

    sp = tokenizer.specials
    # indices of text tokens only
    text_idx = [i for i, t in enumerate(tokens) if int(t) < sp.eot]
    words, groups = split_tokens_into_words(
        [int(tokens[i]) for i in text_idx], tokenizer
    )
    out: List[Dict[str, Any]] = []
    pos = 0
    for word, group in zip(words, groups):
        idxs = text_idx[pos : pos + len(group)]
        pos += len(group)
        if not idxs:
            continue
        start = float(times[idxs[0]])
        end_i = idxs[-1] + 1
        end = float(times[end_i]) if end_i < len(times) else start + 0.02
        if end <= start:
            end = start + 0.02
        prob = 1.0
        if token_probs is not None:
            prob = float(np.exp(np.mean([np.log(max(token_probs[i], 1e-10))
                                         for i in idxs])))
        out.append({
            "word": word,
            "start": round(start, 3),
            "end": round(end, 3),
            "probability": round(prob, 4),
        })
    return out


def add_word_timestamps(
    engine,
    segments: List[Dict[str, Any]],
    audio: np.ndarray,
    windows,
    language: Optional[str] = None,
) -> None:
    """Attach ``words`` to every segment in place.

    Groups segments by window (chunk_id), teacher-forces the decoder over
    each window's token sequence with cross-attention capture, and
    distributes DTW word times (rebased by the window start).
    """
    import jax.numpy as jnp

    from whisper_aries_tpu.audio.mel import log_mel_spectrogram
    from whisper_aries_tpu.models import whisper as W
    from whisper_aries_tpu.vad.planner import windows_to_batch

    by_window: Dict[int, List[Dict[str, Any]]] = {}
    for seg in segments:
        by_window.setdefault(
            seg.get("window_id", seg.get("chunk_id", 0)), []
        ).append(seg)

    for win_id, segs in by_window.items():
        window = windows[win_id]
        # token sequence: timestamped tokens of all segments in order
        flat_tokens: List[int] = []
        seg_spans: List[Tuple[int, int]] = []
        for seg in segs:
            toks = seg.get("tokens")
            if not toks:
                seg_spans.append((len(flat_tokens), len(flat_tokens)))
                continue
            start = len(flat_tokens)
            flat_tokens.extend(int(t) for t in toks)
            seg_spans.append((start, len(flat_tokens)))
        if not flat_tokens:
            continue

        batch = windows_to_batch(audio, [window])
        mel = log_mel_spectrogram(jnp.asarray(batch), n_mels=engine.dims.n_mels)
        xa = W.encode(engine.params, mel.astype(engine.activation_dtype),
                      engine.dims)
        toks_j = jnp.asarray(np.asarray(flat_tokens, np.int32)[None])
        logits, cqk = W.decoder_forward(
            engine.params, toks_j, xa, engine.dims, return_cross_qk=True
        )
        # token_probs[i] = p(token_i | tokens_<i): shift logits by one
        lp = np.asarray(logits)[0]
        probs = np.ones(len(flat_tokens))
        sm = np.exp(lp - lp.max(axis=-1, keepdims=True))
        sm = sm / sm.sum(axis=-1, keepdims=True)
        for i in range(1, len(flat_tokens)):
            probs[i] = sm[i - 1, flat_tokens[i]]

        cqk_np = np.asarray(cqk)[:, 0]  # (L, H, T_text, T_audio)
        n_frames = int(round(min(window.duration, 30.0) / FRAME_S))
        words = find_word_alignments(
            flat_tokens, cqk_np, engine.tokenizer, max(n_frames, 1),
            token_probs=probs,
            alignment_heads=getattr(engine, "alignment_heads", None),
        )
        # distribute words into segments by token span coverage
        token_word: List[int] = []
        for wi, (_, group_sz) in enumerate(
            zip(words, [len(g) for g in
                        split_tokens_into_words(
                            [t for t in flat_tokens
                             if t < engine.tokenizer.specials.eot],
                            engine.tokenizer)[1]])
        ):
            token_word.extend([wi] * group_sz)

        text_positions = [i for i, t in enumerate(flat_tokens)
                          if t < engine.tokenizer.specials.eot]
        pos_to_word = dict(zip(text_positions, token_word))
        for seg, (s0, s1) in zip(segs, seg_spans):
            wset = sorted({pos_to_word[i] for i in range(s0, s1)
                           if i in pos_to_word})
            seg_words = []
            for wi in wset:
                w = dict(words[wi])
                w["start"] = round(w["start"] + window.start, 3)
                w["end"] = round(w["end"] + window.start, 3)
                seg_words.append(w)
            seg["words"] = seg_words
            if seg_words:
                seg["start"] = min(seg["start"], seg_words[0]["start"])
                seg["end"] = max(seg["end"], seg_words[-1]["end"])
