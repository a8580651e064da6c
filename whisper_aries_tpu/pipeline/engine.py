"""AriesTranscriber — the TPU-native long-form ASR engine.

This is the re-design of the reference's ``OptimizedParallelTranscriber``
(final_optimized_transcriber.py:199-612). The reference shape — N worker
threads each owning a replicated CTranslate2 model, a work queue of
N-minute chunks, staggered startup, poison pills, dead-worker timeouts —
collapses on TPU into:

    audio -> VAD -> window plan -> [batch of 30 s windows]
          -> jit(mel | encoder | KV-cached decode) sharded over the mesh
          -> host-side parse/merge/render

One resident compiled program; "workers" are the mesh's data axis; the
queue is a dense batch; chunk reconciliation becomes trivial because
windows are planned disjointly up front (VAD mode) or reconciled with the
reference's drop/merge strategies (chunk mode).

Feature parity with the reference engine surface:
  * chunk_length_minutes / overlap_seconds / num_workers knobs
    (final_optimized_transcriber.py:199-208) — num_workers maps to
    windows_per_device,
  * transcribe params: language, task, beam_size, temperature ladder,
    condition_on_previous_text, vad_filter, thresholds, initial_prompt,
    word_timestamps (:310-319, :432-441),
  * per-segment avg_logprob / no_speech_prob / chunk_id / worker_id
    (:331-340) and TXT/JSON/SRT outputs (:558-612),
  * real-time-factor reporting (:506-511).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_aries_tpu.audio.decode import AudioPreloader
from whisper_aries_tpu.audio.mel import log_mel_spectrogram
from whisper_aries_tpu.config import AriesConfig, load_config
from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.decoding.segments_parse import (
    parse_window_tokens,
    window_quality,
)
from whisper_aries_tpu.decoding.tokenizer import (
    WhisperTokenizer,
    build_special_tokens,
    LANGUAGES,
)
from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.models.loader import load_model
from whisper_aries_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
)
from whisper_aries_tpu.render.renderers import srt_timestamp
from whisper_aries_tpu.vad import (
    VadOptions,
    collect_speech_segments,
    get_speech_probs,
    plan_chunks,
    plan_windows,
)
from whisper_aries_tpu.vad.planner import Window

from whisper_aries_tpu.utils.memory import is_oom_error as _is_oom

log = logging.getLogger(__name__)


def _parse_ramp(env_val: str) -> List[int]:
    """Parse ARIES_RAMP ("4,12"-style rung sizes). Malformed input degrades
    to the default ladder with a warning instead of aborting the
    transcription (round-4 advisor finding)."""
    try:
        return [int(r) for r in env_val.split(",") if r.strip()]
    except ValueError:
        log.warning("malformed ARIES_RAMP=%r; using default 4,12", env_val)
        return [4, 12]


def _batch_sizes(n: int, cap: int, ramp) -> List[int]:
    """Dispatch sizes for n pending windows: an optional RAMP LADDER of
    small batches first (pipeline ramp-up — the first dispatch blocks on
    ~1 uploaded tunnel chunk instead of a full batch span, and each rung
    decodes while the next rung's chunks upload), then the per-file
    ceil-divided cap batches rounded up to the x4 compile grid. ``ramp``
    is an int (one rung; 0 disables) or a sequence of rung sizes."""
    if isinstance(ramp, int):
        ramp = (ramp,) if ramp else ()
    sizes: List[int] = []
    for r in ramp:
        if n <= cap or r <= 0 or r >= cap:
            break
        sizes.append(r)
        n -= r
    if n > 0:
        k = -(-n // cap)
        per = -(-n // k)
        sizes += [min(cap, -(-per // 4) * 4)] * k
    return sizes


def _plan_signature(windows: Sequence[Window], model_size: str,
                    beam: int, sample_len: int, opts: str = "") -> str:
    """Stable id of (window plan, decode config) for resume-journal safety:
    a journal written under a different plan or different decode options
    (language/task/prompts/temperatures/penalties) must not be replayed."""
    import hashlib

    h = hashlib.sha1()
    h.update(f"{model_size}|{beam}|{sample_len}|{len(windows)}|{opts}".encode())
    for w in windows:
        h.update(f"{w.start:.3f},{w.end:.3f},{w.chunk_id};".encode())
    return h.hexdigest()


class ResumeJournal:
    """Append-only JSONL journal of per-window decode results.

    SURVEY §5's rebuild decision ("add per-chunk resume, which the chunk
    architecture makes natural"): a killed job re-runs only the windows
    whose results were never journaled. Line 1 is a header with the plan
    signature; a signature mismatch (different file/plan/knobs) discards
    the stale journal.
    """

    def __init__(self, path: str, sig: str):
        self.path = path
        self.sig = sig
        self.done: Dict[int, List[Dict[str, Any]]] = {}
        #: windows whose decode reset cross-window conditioning (sequential
        #: temperature fallback) — replayed on resume
        self.reset_ids: set = set()
        self._load()

    def _load(self) -> None:
        p = Path(self.path)
        if not p.exists():
            self._write_header()
            return
        try:
            lines = p.read_text(encoding="utf-8").splitlines()
            header = json.loads(lines[0]) if lines else {}
            if header.get("plan_sig") != self.sig:
                log.info("resume journal %s: plan changed, starting fresh",
                         self.path)
                self._write_header()
                return
            for line in lines[1:]:
                try:
                    rec = json.loads(line)
                    self.done[int(rec["window_id"])] = rec["segments"]
                    if rec.get("reset"):
                        self.reset_ids.add(int(rec["window_id"]))
                except Exception:
                    continue  # torn tail write from a crash
            if self.done:
                log.info("resume journal %s: %d windows already decoded",
                         self.path, len(self.done))
        except Exception as e:
            log.warning("resume journal %s unreadable (%s); starting fresh",
                        self.path, e)
            self._write_header()

    def _write_header(self) -> None:
        self.done = {}
        self.reset_ids = set()
        Path(self.path).parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w", encoding="utf-8") as f:
            f.write(json.dumps({"plan_sig": self.sig}) + "\n")

    def record(self, window_id: int, segments: List[Dict[str, Any]],
               reset: bool = False, sync: bool = False) -> None:
        """Append one window's result. Durability is BATCHED: records
        buffer in the OS file cache until ``flush()`` — the engine flushes
        once per dispatch batch instead of per window (the per-window
        open+fsync measured as unoverlapped host time in the fetch loop,
        round-4 review Weak #6). A crash loses at most the current
        batch's records; those windows simply re-decode on resume."""
        self.done[window_id] = segments
        if reset:
            self.reset_ids.add(window_id)
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"window_id": window_id,
                                "segments": segments, "reset": reset}) + "\n")
            if sync:
                f.flush()
                os.fsync(f.fileno())

    def flush(self) -> None:
        """fsync the journal (called once per dispatch batch)."""
        try:
            with open(self.path, "a", encoding="utf-8") as f:
                f.flush()
                os.fsync(f.fileno())
        except OSError as e:
            log.warning("journal fsync failed: %s", e)


class DummyTokenizer:
    """Tokenizer stand-in for random-weight runs (perf benchmarks)."""

    def __init__(self, n_vocab: int):
        if n_vocab == 51864:  # English-only .en layout
            self.specials = build_special_tokens(50257, 99, english=True)
        else:
            num_lang = max(1, n_vocab - 51766)
            self.specials = build_special_tokens(
                n_vocab - num_lang - 1509, num_lang
            )

    def decode(self, ids, skip_special=True):
        return " ".join(f"<{int(i)}>" for i in ids)

    def encode(self, text):
        # " " -> 220 mirrors the real GPT-2 byte-BPE table, so the derived
        # DecodeSpecialIds.blank (a STATIC jit arg) matches real-tokenizer
        # runs and random-weight benches share their compiled decode
        # programs with bench.py's handcrafted ids
        return [220] if text == " " else [0]

    def non_speech_tokens(self, encoder):
        return []


class _AudioUploader:
    """Pipelined host->device audio transfer in fixed-size CHUNKS.

    The axon tunnel moves host arrays at a measured (and variable)
    5-30 MB/s, so eagerly uploading a whole file's int16 samples costs
    2-14 s of serial prefix on a 36-minute file (scripts/probe_upload.py)
    — ~20% of the engine-path wall time. Transfers DO overlap device
    compute (probe 3/3b), so this uploader runs every jax.device_put on
    a single background worker.

    Round 3 keyed transfers by exact per-batch SPAN; round 4 re-keys by
    fixed CHUNK index, which strictly dominates: (a) chunks are reusable
    across ANY span, so overlapping batch spans (the audio_ctx bucket
    sort interleaves time ranges) never re-upload — the round-3
    ``whole=True`` degrade and its 1.25x heuristic are gone; (b) the
    engine can SPECULATIVELY start chunk 0..k while host VAD scoring /
    planning still runs (the round-3 exact keys made early prefetch
    useless — the first batch's exact span isn't known until planning
    ends), taking the first upload off the critical path; (c) a batch's
    get() assembles its covering chunks with one device-side concat
    (~80 us at the measured 570 GB/s HBM rate vs 5-30 MB/s through the
    tunnel). Chunks covering VAD-silence gaps are simply never
    requested. int16 quantization of float sources happens per-chunk on
    the worker, off the critical path.
    """

    CHUNK = 1 << 22            # 4 Mi samples = 8 MB per transfer

    def __init__(self, audio_f32, audio_i16=None, pad: int = 480_000):
        import concurrent.futures as _cf

        self._f32 = audio_f32
        self._i16 = audio_i16
        self._pad = pad
        self.n = int(len(audio_i16 if audio_i16 is not None else audio_f32))
        # total extent incl. the window-overhang pad past EOF
        self._ntot = self.n + pad
        self._nchunks = max(1, -(-self._ntot // self.CHUNK))
        self._futs: Dict[int, Any] = {}
        self._pool = _cf.ThreadPoolExecutor(max_workers=1)

    def _chunk16(self, ci: int) -> np.ndarray:
        """int16 samples for chunk ci, zero-padded past EOF (the window
        overhang the old whole-file upload pre-padded)."""
        s = ci * self.CHUNK
        e = min(s + self.CHUNK, self._ntot)
        if self._i16 is not None:
            a = self._i16[s:min(e, self.n)]
        else:
            # 16-bit wire fidelity matches the reference exactly: its
            # pipeline ingests via ffmpeg pcm_s16le (utils.py:107-123)
            a = np.clip(
                np.asarray(self._f32[s:min(e, self.n)], np.float32)
                * 32768.0, -32768, 32767,
            ).astype(np.int16)
        if e - s > len(a):
            a = np.pad(a, (0, e - s - len(a)))
        return a

    def _crange(self, s: int, e: int) -> Tuple[int, int]:
        s = max(0, int(s))
        e = min(int(e), self._ntot)
        return s // self.CHUNK, min(self._nchunks, -(-e // self.CHUNK))

    def prefetch(self, s: int, e: int) -> None:
        c0, c1 = self._crange(s, e)
        for ci in range(c0, c1):
            if ci not in self._futs:
                self._futs[ci] = self._pool.submit(
                    lambda ci=ci: jax.device_put(self._chunk16(ci)))

    def get(self, s: int, e: int) -> Tuple[jax.Array, int]:
        """Device int16 span covering [s, e) and its base offset."""
        self.prefetch(s, e)
        c0, c1 = self._crange(s, e)
        parts = [self._futs[ci].result() for ci in range(c0, c1)]
        arr = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return arr, c0 * self.CHUNK


@dataclasses.dataclass(frozen=True)
class _CallOpts:
    """Per-call decode options threaded through the window loops.

    The engine instance may be SHARED by concurrent server jobs
    (run_pipeline's process-wide cache + the server's bounded semaphore),
    so per-call options travel as an explicit value, never as mutable
    engine state. Fields cover the faster-whisper/CTranslate2 whitelist
    the reference forwards (final_optimized_transcriber.py:310-319).
    """

    ids: G.DecodeSpecialIds          # carries max_initial_timestamp_index
    suppress_mask: Any               # (vocab,) additive logit mask
    with_timestamps: bool = True     # False == without_timestamps option
    multilingual: bool = False       # per-window language detection
    prompt_reset_on_temperature: float = 0.5


class AriesTranscriber:
    """Long-form transcription engine over a device mesh."""

    def __init__(
        self,
        model_size: str = "large-v3",
        device: Optional[str] = None,  # accepted for API parity; ignored
        compute_type: str = "bf16",
        chunk_length_minutes: float = 3.0,
        overlap_seconds: float = 5.0,
        num_workers: Optional[int] = None,  # maps to windows_per_device
        cache_dir: str = "./models",
        config: Optional[AriesConfig] = None,
        allow_random: bool = False,
        mesh=None,
        windows_per_device: Optional[int] = None,
        kv_cache_dtype: Optional[str] = None,  # "auto" | "int8" | "bf16"
        mel_backend: Optional[str] = None,     # "auto" | "pallas" | "xla"
        audio_ctx: Optional[str] = None,       # "full" | "bucket"
        _params=None,
        _dims=None,
        _tokenizer=None,
    ):
        self.config = config or load_config()
        self.model_size = model_size
        self.chunk_length_minutes = chunk_length_minutes
        self.overlap_seconds = overlap_seconds

        # persistent XLA compile cache: a restarted process skips the
        # 40-90 s/shape remote tunnel compiles (utils/compile_cache.py)
        from whisper_aries_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        if compute_type in ("f32", "float32"):
            dtype = jnp.float32
        self.activation_dtype = dtype

        if _params is not None:
            # direct injection (tests / embedding in other runtimes)
            self.params, self.dims, self.model_dir = _params, _dims, None
        else:
            self.params, self.dims, self.model_dir = load_model(
                model_size, cache_dir=cache_dir, dtype=dtype,
                allow_random=allow_random,
            )
        if compute_type == "int8":
            from whisper_aries_tpu.ops.quant import quantize_model_params

            self.params = quantize_model_params(self.params)
        # one (d -> 3d) GEMM for the decoder self-attention projections:
        # decode steps are latency-bound at engine row counts (bit-exact)
        self.params = W.fuse_decoder_qkv(self.params)
        self.tokenizer = _tokenizer if _tokenizer is not None else self._load_tokenizer()
        self.ids = G.DecodeSpecialIds.from_tokenizer(self.tokenizer)
        # per-checkpoint DTW alignment heads (generation_config.json); None
        # falls back to the top-half-layers head set in align/word_align.py
        from whisper_aries_tpu.models.loader import load_alignment_heads

        self.alignment_heads = load_alignment_heads(self.model_dir)

        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = int(np.prod(self.mesh.devices.shape))
        wpd = windows_per_device or num_workers
        self._auto_batch = wpd is None
        if wpd is None:
            if jax.default_backend() == "tpu":
                from whisper_aries_tpu.parallel.mesh import auto_windows_per_device

                skvd = self.config.decode.self_kv_cache_dtype
                wpd = auto_windows_per_device(
                    model_size,
                    beam_size=self.config.decode.beam_size or 5,
                    sample_len=self.config.decode.max_new_tokens,
                    self_kv_int8=None if skvd == "auto" else skvd == "int8",
                )
            else:
                wpd = 8
        self.batch_size = max(1, n_dev * wpd)
        self.params = replicate_params(self.params, self.mesh)

        # default suppress mask (non-speech symbols + specials); per-call
        # suppress_tokens build their own via _make_suppress_mask
        self.suppress_mask = self._make_suppress_mask(None)
        self._mel_sharding = None

        on_tpu = jax.default_backend() == "tpu"
        # int8 cross-attention K/V (fused Pallas dequant attention) halves
        # the dominant decode-step HBM stream; "auto" enables it on TPU.
        kvd = kv_cache_dtype or self.config.decode.kv_cache_dtype
        self.kv_int8 = kvd == "int8" or (kvd == "auto" and on_tpu)
        # self-attention cache: "auto" resolves to int8 exactly where the
        # beam megakernel quantizes appended K/V in-kernel (TPU beam path;
        # zero measured latency cost, 2x window-batch capacity). The XLA
        # quantize-on-write variant costs step latency, so auto keeps
        # greedy/CPU at bf16. Resolved per-call in _decode_batch.
        skvd = self.config.decode.self_kv_cache_dtype
        self._self_kv_auto = skvd == "auto"
        self.self_kv_int8 = skvd == "int8"
        melb = mel_backend or self.config.decode.mel_backend
        self.use_pallas_mel = melb == "pallas" or (melb == "auto" and on_tpu)
        # opt-in short-window encoder bucketing (whisper.cpp audio_ctx
        # style): batches made entirely of <=16 s VAD windows encode at a
        # 16 s context instead of the trained 30 s padding
        self.audio_ctx_bucket = (
            (audio_ctx or self.config.decode.audio_ctx) == "bucket"
        )
        self._speech_scorer = self._make_speech_scorer()
        # startup smoke test of REAL checkpoints (the reference runs 0.5 s
        # of noise through every loaded model before serving,
        # final_optimized_transcriber.py:188-191): a corrupt checkpoint
        # fails here, not mid-job. Random/injected weights skip it.
        if self.model_dir is not None and os.environ.get(
                "ARIES_SMOKE_TEST", "1") != "0":
            self.smoke_test()

    def smoke_test(self) -> None:
        """Forward 0.5 s of noise through mel -> encoder -> one decoder
        call and fail fast on non-finite logits (corrupt / truncated
        checkpoint). Reference parity: final_optimized_transcriber.py
        :188-191 ("Quick test" with 8000 random samples)."""
        rng = np.random.default_rng(0)
        buf = np.zeros(self.WINDOW_SAMPLES, np.float32)
        buf[:8000] = 0.1 * rng.standard_normal(8000).astype(np.float32)
        mel = self._mel(jnp.asarray(buf[None]))
        xa = self._encode_batch(mel)
        sot = self.tokenizer.specials.sot
        logits = W.decoder_forward(
            self.params, jnp.asarray([[sot]], jnp.int32), xa, self.dims)
        if not bool(np.isfinite(np.asarray(logits)).all()):
            raise RuntimeError(
                f"model smoke test failed: non-finite decoder logits "
                f"(corrupt checkpoint at {self.model_dir}?)")
        log.info("model smoke test passed (%s)", self.model_size)

    def _make_suppress_mask(self, suppress_tokens) -> jnp.ndarray:
        """(vocab,) additive logit mask for a ``suppress_tokens`` option.

        faster-whisper/openai-whisper semantics (the reference whitelists
        suppress_tokens at final_optimized_transcriber.py:310-319): ``-1``
        in the list expands to the model's default non-speech symbol set;
        an empty list suppresses no extra ids. Special tokens (sot/
        sot_prev/sot_lm/no_speech/task tokens) are ALWAYS suppressed —
        they must never be sampled regardless of the option.
        """
        if suppress_tokens is None:
            suppress_tokens = self.config.decode.suppress_tokens
        sp = self.tokenizer.specials
        ids: List[int] = []
        for t in suppress_tokens:
            if int(t) == -1:
                ids += list(
                    self.tokenizer.non_speech_tokens(self.tokenizer.encode)
                )
            elif int(t) >= 0:
                ids.append(int(t))
        ids += [sp.sot, sp.sot_lm, sp.sot_prev, sp.no_speech,
                sp.translate, sp.transcribe]
        return jnp.asarray(G.build_suppress_mask(self.dims.n_vocab, ids))

    def _make_speech_scorer(self):
        """Frame speech-probability scorer: the trained Silero-replacement
        net when its checkpoint ships (weights/vad.safetensors), else the
        adaptive-energy detector (vad/energy.py). Config: vad.backend."""
        backend = self.config.vad.backend
        if backend in ("auto", "learned"):
            try:
                from whisper_aries_tpu.models.vad_net import (
                    init_vad,
                    make_nn_speech_scorer,
                )
                from whisper_aries_tpu.utils.params_io import (
                    default_weights_dir,
                    load_params_into,
                )

                path = default_weights_dir() / "vad.safetensors"
                params = load_params_into(init_vad(), str(path))
                log.info("VAD: learned scorer (%s)", path)
                return make_nn_speech_scorer(params)
            except Exception as e:
                if backend == "learned":
                    raise
                log.info("VAD: energy scorer (no learned weights: %s)", e)
        return get_speech_probs

    def _mel(self, audio_j: jax.Array) -> jax.Array:
        """Log-mel via the fused Pallas kernel on TPU, XLA FFT elsewhere."""
        if self.use_pallas_mel:
            from whisper_aries_tpu.ops.pallas_mel import log_mel_pallas

            return log_mel_pallas(audio_j, n_mels=self.dims.n_mels)
        return log_mel_spectrogram(audio_j, n_mels=self.dims.n_mels)

    # ------------------------------------------------------------------
    # Device-side windowing: the whole file is uploaded ONCE as int16 and
    # 30 s windows are gathered on-device. Per-batch host->device window
    # uploads (B x 1.9 MB float32) dominated the product path on
    # bandwidth-limited transports (the axon tunnel measured ~35 s/batch);
    # one int16 upload is 2 B/sample for the entire file.
    # ------------------------------------------------------------------

    WINDOW_SAMPLES = 480_000  # 30 s @ 16 kHz
    # short-bucket window (audio_ctx="bucket"): 16 s keeps the mel frame
    # count (1600) divisible by the Pallas mel kernel's 200-frame grid block
    SHORT_WINDOW_SAMPLES = 256_000  # 16 s @ 16 kHz
    SHORT_WINDOW_S = 16.0

    def _make_uploader(self, pre) -> _AudioUploader:
        """Span-pipelined device transfer for this file's samples. When
        the source was a PCM16 WAV the preloader hands back its raw
        samples and the quantize pass is skipped — bit-exact, because
        round(clip(s/32768 * 32768)) == s and the device gather divides
        by the same 32768."""
        i16 = getattr(pre, "audio_i16", None)
        # PCM16 sources never touch pre.audio here: the f32 conversion
        # is lazy (AudioPreloader.audio) and costs ~1 s of first-touch
        # page faults on a long file
        return _AudioUploader(None if i16 is not None else pre.audio,
                              i16, pad=self.WINDOW_SAMPLES)

    def _batch_span(self, windows: Sequence[Window], batch_idx,
                    win: Optional[int] = None) -> Tuple[int, int]:
        """Sample range covering a batch's windows (+ the gather extent)."""
        win = win or self.WINDOW_SAMPLES
        sr = 16_000
        s0 = min(int(round(windows[i].start * sr)) for i in batch_idx)
        s1 = max(int(round(windows[i].start * sr)) for i in batch_idx) + win
        return s0, s1

    def _gather_span(self, uploader: _AudioUploader,
                     windows: Sequence[Window], batch_idx, B: int,
                     win: Optional[int] = None) -> jax.Array:
        """Gather a window batch from the uploader's covering span.
        Pad rows (start 0 / length 0) rebase to negative starts, which
        dynamic_slice clamps and the length mask zeroes."""
        win = win or self.WINDOW_SAMPLES
        starts, lens = self._window_starts_lengths(windows, batch_idx, B,
                                                   win=win)
        arr, base = uploader.get(*self._batch_span(windows, batch_idx, win))
        return self._gather_windows(arr, starts - base, lens, win=win)

    def _gather_windows(self, audio_dev: jax.Array, starts: np.ndarray,
                        lengths: np.ndarray,
                        win: Optional[int] = None) -> jax.Array:
        """(B,) sample starts/lengths -> (B, win) float32 windows gathered
        on device, zeroed past each window's length, sharded on the mesh
        data axis. ``win`` defaults to the full 30 s WINDOW_SAMPLES; the
        short bucket passes SHORT_WINDOW_SAMPLES."""
        win = win or self.WINDOW_SAMPLES
        if not hasattr(self, "_gather_fns"):
            self._gather_fns = {}
        if win not in self._gather_fns:
            WIN = win

            def gather(audio16, starts_j, lengths_j):
                def one(s, l):
                    w = jax.lax.dynamic_slice(audio16, (s,), (WIN,))
                    w = w.astype(jnp.float32) * (1.0 / 32768.0)
                    return jnp.where(jnp.arange(WIN) < l, w, 0.0)

                return jax.vmap(one)(starts_j, lengths_j)

            self._gather_fns[win] = {
                # batches divisible by the mesh shard on the data axis;
                # odd sizes (B=1 language probe / sequential) replicate
                True: jax.jit(gather, out_shardings=batch_sharding(self.mesh, 2)),
                False: jax.jit(gather),
            }
        n_dev = int(np.prod(self.mesh.devices.shape))
        fn = self._gather_fns[win][len(starts) % n_dev == 0]
        return fn(
            audio_dev, jnp.asarray(starts, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
        )

    def _window_starts_lengths(self, windows: Sequence[Window], idx, B: int,
                               win: Optional[int] = None):
        """Padded (B,) start/length sample arrays for a window subset."""
        win = win or self.WINDOW_SAMPLES
        sr = 16_000
        starts = np.zeros((B,), np.int32)
        lengths = np.zeros((B,), np.int32)
        for k, i in enumerate(idx):
            starts[k] = int(round(windows[i].start * sr))
            lengths[k] = min(win, int(round(windows[i].duration * sr)))
        return starts, lengths

    # ------------------------------------------------------------------

    def _load_tokenizer(self):
        if self.model_dir is not None and (Path(self.model_dir) / "vocab.json").exists():
            tok = WhisperTokenizer.from_pretrained(str(self.model_dir))
            # the special-token layout must match the model's vocab exactly
            if tok.specials.n_vocab != self.dims.n_vocab:
                if self.dims.n_vocab == 51864:  # English-only .en layout
                    tok.specials = build_special_tokens(50257, 99, english=True)
                else:
                    expect_langs = self.dims.n_vocab - 51766
                    if expect_langs > 0:
                        tok.specials = build_special_tokens(
                            self.dims.n_vocab - expect_langs - 1509,
                            expect_langs,
                        )
            return tok
        return DummyTokenizer(self.dims.n_vocab)

    # ------------------------------------------------------------------
    # Window planning
    # ------------------------------------------------------------------

    def _plan(self, pre: AudioPreloader, duration: float,
              vad_filter: bool, vad_parameters: Optional[dict],
              chunking_mode: str = "vad",
              chunk_length_minutes: Optional[float] = None) -> List[Window]:
        if chunking_mode == "fixed":
            # reference-compatible coarse chunks with overlap
            # (final_optimized_transcriber.py:422-426), each tiled into 30 s
            # windows carrying the chunk_id for downstream reconciliation.
            chunks = plan_chunks(
                duration,
                chunk_length_minutes or self.chunk_length_minutes,
                self.overlap_seconds,
            )
            windows: List[Window] = []
            for c in chunks:
                t = c.start
                while t < c.end - 1e-6:
                    windows.append(
                        Window(t, min(c.end, t + 30.0), chunk_id=c.chunk_id)
                    )
                    t += 30.0
            return windows
        if vad_filter:
            audio = pre.audio  # f32 materializes here (VAD needs it)
            opts = VadOptions(**(vad_parameters or {}))
            probs = self._speech_scorer(audio)
            speech = collect_speech_segments(probs, opts, total_samples=len(audio))
            if not speech:
                return []
            return plan_windows(speech, duration)
        # no VAD: tile the whole file into 30 s windows
        return plan_windows([(0.0, duration)], duration)

    # ------------------------------------------------------------------
    # Batched decode
    # ------------------------------------------------------------------

    def _encode_batch(self, mel: jax.Array) -> jax.Array:
        return W.encode(self.params, mel.astype(self.activation_dtype), self.dims)

    def _decode_batch(
        self,
        xa: jax.Array,
        prompt: np.ndarray,
        beam_size: int,
        temperature: float,
        sample_len: int,
        length_penalty: float,
        seed: int = 0,
        repetition_penalty: float = 1.0,
        sot_index: int = 0,
        patience: float = 1.0,
        no_repeat_ngram_size: int = 0,
        prompt_start: int = 0,
        opts: Optional[_CallOpts] = None,
        fetch: bool = True,
        row_lang: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        ids = opts.ids if opts is not None else self.ids
        suppress_mask = (opts.suppress_mask if opts is not None
                         else self.suppress_mask)
        with_ts = opts.with_timestamps if opts is not None else True
        prompt_j = jnp.asarray(prompt, jnp.int32)
        if row_lang is not None:
            # `multilingual`: per-row detected language token ids, still on
            # device (G.detect_language_ids) — injected here as DATA so the
            # pipeline never blocks on a host fetch; they return to host
            # with the decode outputs (out["row_lang"] below)
            prompt_j = prompt_j.at[:, sot_index + 1].set(row_lang)
        # index of <|sot|> inside the prompt — with a <|startofprev|> prefix
        # (initial_prompt / condition_on_previous_text) it is not 0, and
        # no_speech_prob must be read at the sot position's logits.
        sot_index = jnp.int32(sot_index)
        rep = (jnp.float32(repetition_penalty)
               if repetition_penalty and repetition_penalty != 1.0 else None)
        ngram = int(no_repeat_ngram_size or 0)
        # left-padded prompt buffers (sequential conditioning) share one
        # compiled program; prompt_start marks the first real token.
        ps = jnp.int32(prompt_start) if prompt_start else None
        if beam_size > 1 and temperature == 0.0:
            import os as _os

            reorder = _os.environ.get("ARIES_BEAM_REORDER", "default")
            self_int8 = self.self_kv_int8
            if self._self_kv_auto:
                # auto: int8 exactly on the megakernel path (in-kernel
                # quantize-on-append — parity-exact tokens, free capacity)
                self_int8 = (self.kv_int8 and reorder in ("default", "mega")
                             and jax.default_backend() == "tpu")
            beam_kw = dict(
                beam_size=beam_size,
                sample_len=sample_len, length_penalty=length_penalty,
                repetition_penalty=rep, patience=float(patience or 1.0),
                no_repeat_ngram_size=ngram, kv_int8=self.kv_int8,
                self_kv_int8=self_int8, prompt_start=ps,
                with_timestamps=with_ts,
                # read at CALL time and passed as a static arg so flipping
                # the A/B knob mid-process retraces instead of silently
                # hitting the stale jit cache entry
                beam_reorder=reorder,
                beam_tail=_os.environ.get("ARIES_BEAM_TAIL", "default"),
                # experimental grouped-beam megakernel (windows x beams
                # share kernel rows); read at call time for live A/B
                beam_group=int(
                    _os.environ.get("ARIES_BEAM_GROUP", "2") or 1),
            )
            n_dev = int(np.prod(self.mesh.devices.shape))
            if n_dev > 1 and xa.shape[0] % n_dev == 0:
                # multi-device: one full decode replica per device via
                # shard_map (the Pallas megakernel/beam-tail programs are
                # opaque to GSPMD — see beam_search_decode_sharded)
                out = G.beam_search_decode_sharded(
                    self.mesh, self.params, xa, prompt_j, self.dims, ids,
                    suppress_mask, sot_index, **beam_kw,
                )
            else:
                out = G.beam_search_decode(
                    self.params, xa, prompt_j, self.dims, ids,
                    suppress_mask, sot_index, **beam_kw,
                )
        else:
            # grouped-windows greedy megakernel (ARIES_GREEDY_MEGA=0 opts
            # out; ARIES_MEGA_GROUP sets the group size): Kg windows pack
            # into the kernel's beam slots — the greedy analogue of the
            # beam mega default (see generate.greedy_decode)
            import os as _os

            mg = None
            if (jax.default_backend() == "tpu" and self.kv_int8
                    and _os.environ.get("ARIES_GREEDY_MEGA", "1") != "0"):
                try:
                    mg = int(_os.environ.get("ARIES_MEGA_GROUP", "4"))
                except ValueError:
                    mg = 4
                if mg <= 1 or xa.shape[0] % mg != 0:
                    mg = None
            self_int8 = self.self_kv_int8
            if self._self_kv_auto:
                # auto: int8 exactly on the megakernel path (in-kernel
                # quantize-on-append), bf16 elsewhere — same policy as beam
                self_int8 = mg is not None
            out = G.greedy_decode(
                self.params, xa, prompt_j, self.dims, ids,
                suppress_mask, sot_index,
                jnp.float32(temperature), jax.random.PRNGKey(seed),
                sample_len=sample_len, repetition_penalty=rep,
                no_repeat_ngram_size=ngram, kv_int8=self.kv_int8,
                self_kv_int8=self_int8, prompt_start=ps,
                with_timestamps=with_ts, mega_group=mg,
            )
        keep = ("tokens", "n_sampled", "sum_logprob", "avg_logprob",
                "no_speech_prob")
        if row_lang is not None:
            out = dict(out)
            out["row_lang"] = row_lang
            keep = keep + ("row_lang",)
        if not fetch:
            # leave results on device: jit dispatch is async, so the caller
            # can enqueue the NEXT batch's gather/mel/encode/decode before
            # blocking on these (double-buffered engine loop)
            return {k: v for k, v in out.items() if k in keep}
        return {k: np.asarray(v) for k, v in out.items() if k in keep}

    def _window_languages(
        self, xa: jax.Array
    ) -> Optional[Tuple[np.ndarray, List[str]]]:
        """Per-window language for `multilingual`: one batched single-step
        probe over the already-encoded audio. Returns (language token ids,
        language codes) per row, or None for models without language tokens
        (.en checkpoints)."""
        sp = self.tokenizer.specials
        lang_tokens = getattr(sp, "language_tokens", None)
        if not lang_tokens:
            return None
        lang0 = min(lang_tokens.values())
        probs = np.asarray(G.detect_language_batched(
            self.params, xa, self.dims, sp.sot, lang0, sp.num_languages
        ))
        idx = probs.argmax(axis=1)
        return (lang0 + idx.astype(np.int32),
                [LANGUAGES[int(i)] for i in idx])

    def detect_language(self, mel: jax.Array) -> Tuple[str, float]:
        sp = self.tokenizer.specials
        lang0 = min(sp.language_tokens.values())
        probs = np.asarray(
            G.detect_language_logits(
                self.params, self._encode_batch(mel[:1]), self.dims,
                sp.sot, lang0, sp.num_languages,
            )
        )[0]
        idx = int(np.argmax(probs))
        return LANGUAGES[idx], float(probs[idx])

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def transcribe_file(
        self,
        audio_path: str,
        language: Optional[str] = None,
        output_formats: Sequence[str] = ("txt",),
        output_dir: Optional[str] = None,
        task: str = "transcribe",
        beam_size: Optional[int] = None,
        best_of: int = 5,
        patience: Optional[float] = None,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: Optional[int] = None,
        temperature: Optional[Sequence[float]] = None,
        vad_filter: bool = True,
        vad_parameters: Optional[dict] = None,
        initial_prompt: Optional[str] = None,
        prefix: Optional[str] = None,
        hotwords: Optional[str] = None,
        word_timestamps: bool = False,
        length_penalty: float = 1.0,
        compression_ratio_threshold: float = 2.4,
        log_prob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        max_new_tokens: int = 224,
        progress_callback=None,
        chunking_mode: str = "vad",
        chunk_size: Optional[float] = None,
        overlap_strategy: Optional[str] = None,
        condition_on_previous_text: bool = False,
        resume_path: Optional[str] = None,
        suppress_tokens: Optional[Sequence[int]] = None,
        without_timestamps: Optional[bool] = None,
        max_initial_timestamp: Optional[float] = None,
        prompt_reset_on_temperature: Optional[float] = None,
        multilingual: Optional[bool] = None,
        prepend_punctuations: Optional[str] = None,
        append_punctuations: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Transcribe one file end to end; returns the result dict and writes
        any requested output formats.

        ``chunking_mode="fixed"`` reproduces the reference's coarse-chunk plan
        with overlap; ``chunk_size`` (seconds, reference ``config.py:25``
        ``DEFAULT_CHUNK_SIZE`` semantics) forces fixed chunking at that
        length for this call; ``overlap_strategy`` ("drop" | "merge") then
        reconciles
        duplicate text in overlap regions (final_optimized_transcriber.py:
        537-556 / complete_fixed_whisper.py:880-902).
        ``condition_on_previous_text=True`` decodes windows sequentially, each
        prompted with the previous window's text via <|startofprev|>
        (faster-whisper semantics; the reference disables it for parallelism,
        final_optimized_transcriber.py:437).
        ``resume_path``: per-window resume journal (JSONL). A killed run
        restarted with the same path re-decodes only the unfinished windows
        (SURVEY §5 checkpoint/resume).

        faster-whisper option-whitelist parity (the reference forwards
        these at final_optimized_transcriber.py:310-319):
        ``suppress_tokens`` (-1 expands to the default non-speech set),
        ``without_timestamps`` (each window becomes one un-timestamped
        segment spanning it), ``max_initial_timestamp`` (cap on a window's
        first timestamp, seconds), ``prompt_reset_on_temperature`` (with
        condition_on_previous_text: context resets when a window's accepted
        temperature exceeds it), ``multilingual`` (per-window language
        detection; segments carry their window's language),
        ``prepend_punctuations``/``append_punctuations`` (word-timestamp
        punctuation merging). ``None`` defers to config.decode.
        """
        t0 = time.time()
        self.last_monitor = None
        # per-call activity log (reference WorkerDiagnostics,
        # complete_fixed_whisper.py:249-284): every window's
        # PLANNED/DECODING/FALLBACK/COMPLETED/ERROR transitions, surfaced in
        # the result dict and kept on the engine for post-mortems
        from whisper_aries_tpu.utils.perf import WorkerDiagnostics

        diag = WorkerDiagnostics()
        self.last_diagnostics = diag
        pre = AudioPreloader(audio_path)
        duration = pre.duration
        # start the uploader BEFORE planning: host VAD scoring and the
        # 5-30 MB/s tunnel transfer both walk the audio from the front, so
        # the first chunks stream while the host plans (chunk keying makes
        # the speculation reusable by whatever spans planning produces;
        # wasted only if the file HEAD is VAD silence)
        uploader = self._make_uploader(pre)
        if jax.default_backend() == "tpu":
            uploader.prefetch(0, 4 * _AudioUploader.CHUNK)
        if chunk_size is not None:
            # a per-call chunk size implies the reference's fixed-chunk plan
            chunking_mode = "fixed"
        windows = self._plan(pre, duration, vad_filter, vad_parameters,
                             chunking_mode=chunking_mode,
                             chunk_length_minutes=(
                                 chunk_size / 60.0 if chunk_size else None))
        log.info("planned %d windows for %.1fs audio", len(windows), duration)

        beam = beam_size if beam_size is not None else self.config.decode.beam_size
        # auto-sized batches assumed the config's beam at construction; a
        # larger call-time beam needs proportionally more HBM per window
        if (self._auto_batch and jax.default_backend() == "tpu"
                and beam != (self.config.decode.beam_size or 5)):
            from whisper_aries_tpu.parallel.mesh import auto_windows_per_device

            n_dev = int(np.prod(self.mesh.devices.shape))
            skvd = self.config.decode.self_kv_cache_dtype
            self.batch_size = max(1, n_dev * auto_windows_per_device(
                self.model_size, beam_size=beam or 1,
                sample_len=max_new_tokens,
                self_kv_int8=None if skvd == "auto" else skvd == "int8",
            ))
        temps = (temperature if temperature is not None
                 else self.config.decode.temperature)
        if isinstance(temps, (int, float)):  # scalar (e.g. temperature=0.0)
            temps = (float(temps),)
        temps = tuple(temps)
        patience = (patience if patience is not None
                    else self.config.decode.patience)
        ngram = (no_repeat_ngram_size if no_repeat_ngram_size is not None
                 else self.config.decode.no_repeat_ngram_size)

        # -- faster-whisper option whitelist -> per-call decode options ----
        dc = self.config.decode
        without_ts = (without_timestamps if without_timestamps is not None
                      else dc.without_timestamps)
        mit = (max_initial_timestamp if max_initial_timestamp is not None
               else dc.max_initial_timestamp)
        prt = (prompt_reset_on_temperature
               if prompt_reset_on_temperature is not None
               else dc.prompt_reset_on_temperature)
        multi = multilingual if multilingual is not None else dc.multilingual
        call_ids = self.ids
        mit_idx = max(0, int(round(mit / 0.02)))
        if mit_idx != call_ids.max_initial_timestamp_index:
            call_ids = dataclasses.replace(
                call_ids, max_initial_timestamp_index=mit_idx
            )
        opts = _CallOpts(
            ids=call_ids,
            suppress_mask=(self.suppress_mask if suppress_tokens is None
                           else self._make_suppress_mask(suppress_tokens)),
            with_timestamps=not without_ts,
            multilingual=bool(multi),
            prompt_reset_on_temperature=float(prt),
        )

        segments: List[Dict[str, Any]] = []
        info: Dict[str, Any] = {
            "language": language,
            "language_probability": 1.0 if language else None,
        }

        if windows:
            # language detection on the first window if not specified.
            # The BATCHED path defers it INTO the first dispatch: the
            # round-5 engine profile showed the serial 1-window
            # mel+encode+probe+host-fetch as unoverlapped prefix time
            # (tunnel RTT + a spare encode shape); deferred mode computes
            # the (1,) language token id on device from the first batch's
            # xa and injects it into every batch's prompt rows as DATA
            # (the multilingual row_lang machinery) — the id reaches the
            # host with the first batch's outputs, never on its own.
            deferred_lang: Optional[Dict[str, Any]] = None
            lang_tokens = getattr(self.tokenizer.specials,
                                  "language_tokens", None)
            if language is None:
                can_defer = (lang_tokens
                             and not condition_on_previous_text
                             and not prefix
                             and not (opts.multilingual)
                             and os.environ.get("ARIES_DEFER_LANG",
                                                "1") != "0")
                if can_defer:
                    deferred_lang = {"lang0": min(lang_tokens.values())}
                else:
                    mel0 = self._mel(
                        self._gather_span(uploader, windows, [0], 1))
                    language, lang_prob = self.detect_language(mel0)
                    info["language"] = language
                    info["language_probability"] = lang_prob

            # deferred mode builds the prompt with a PLACEHOLDER language
            # token — the real one overwrites it on device (prompt data)
            prompt_ids = self.tokenizer.specials.sot_sequence(
                language if deferred_lang is None else "en", task)
            sot_idx = 0
            # faster-whisper semantics: hotwords fill the <|startofprev|>
            # context when no initial_prompt is given; initial_prompt wins.
            prev_text = initial_prompt or hotwords
            if prev_text:
                prev = [self.tokenizer.specials.sot_prev] + \
                    self.tokenizer.encode(" " + prev_text.strip())[-223:]
                prompt_ids = prev + prompt_ids
                sot_idx = len(prev)
            # forced transcript start (faster-whisper: applies to the FIRST
            # window only): prefix tokens follow the sot sequence as
            # already-decoded text and appear in the output
            prefix_ids: List[int] = (
                self.tokenizer.encode(" " + prefix.strip()) if prefix else []
            )

            journal = None
            if resume_path:
                # the signature covers everything that changes decoded
                # output: window plan, model, and the full decode config
                # (prompt_ids encodes language/task/initial_prompt/hotwords)
                opts_sig = json.dumps([
                    prompt_ids, prefix_ids, list(temps), repetition_penalty,
                    ngram, patience, length_penalty, condition_on_previous_text,
                    self.audio_ctx_bucket,
                    # whitelist options that change decoded output
                    bool(without_ts), mit_idx, bool(multi), float(prt),
                    list(suppress_tokens) if suppress_tokens is not None
                    else None,
                ])
                journal = ResumeJournal(
                    resume_path,
                    _plan_signature(windows, self.model_size,
                                    beam or 1, max_new_tokens, opts_sig),
                )
            if condition_on_previous_text:
                segments = self._transcribe_windows_sequential(
                    pre, uploader, windows, prompt_ids, sot_idx, beam,
                    temps,
                    length_penalty, max_new_tokens,
                    compression_ratio_threshold, log_prob_threshold,
                    no_speech_threshold, progress_callback,
                    rep_penalty=repetition_penalty, patience=patience,
                    ngram=ngram, journal=journal, prefix_ids=prefix_ids,
                    opts=opts,
                )
            else:
                segments = []
                skip = set()
                if prefix_ids and 0 not in (journal.done if journal else {}):
                    # faster-whisper semantics: the prefix forces only the
                    # FIRST window's transcript; decode it alone via the
                    # sequential machinery, then batch the rest without it
                    segments += self._transcribe_windows_sequential(
                        pre, uploader, windows[:1], prompt_ids,
                        sot_idx, beam, temps,
                        length_penalty, max_new_tokens,
                        compression_ratio_threshold, log_prob_threshold,
                        no_speech_threshold, None,
                        rep_penalty=repetition_penalty, patience=patience,
                        ngram=ngram, journal=journal, prefix_ids=prefix_ids,
                        opts=opts,
                    )
                    skip = {0}
                segments += self._transcribe_windows(
                    pre, uploader, windows, prompt_ids, sot_idx, beam,
                    temps,
                    length_penalty, max_new_tokens,
                    compression_ratio_threshold, log_prob_threshold,
                    no_speech_threshold, progress_callback,
                    best_of=best_of, rep_penalty=repetition_penalty,
                    patience=patience, ngram=ngram, journal=journal,
                    skip_ids=skip, opts=opts, deferred_lang=deferred_lang,
                )
                segments.sort(key=lambda s: (s["start"], s["end"]))
            if deferred_lang is not None and "code" in deferred_lang:
                language = deferred_lang["code"]
                info["language"] = language
                info["language_probability"] = deferred_lang["prob"]
            if chunking_mode == "fixed":
                from whisper_aries_tpu.utils.segments import (
                    merge_overlapping_segments,
                    remove_overlaps_drop,
                )

                strategy = overlap_strategy or self.config.chunking.overlap_strategy
                if strategy == "merge":
                    segments = merge_overlapping_segments(segments)
                else:
                    segments = remove_overlaps_drop(segments)

        if word_timestamps and segments:
            try:
                from whisper_aries_tpu.align.word_align import add_word_timestamps

                add_word_timestamps(
                    self, segments, pre.audio, windows, language=language,
                    prepend_punctuations=(
                        prepend_punctuations
                        if prepend_punctuations is not None
                        else dc.prepend_punctuations),
                    append_punctuations=(
                        append_punctuations
                        if append_punctuations is not None
                        else dc.append_punctuations),
                )
            except Exception as e:  # non-fatal, like reference LLM step
                log.warning("word timestamps failed: %s", e)

        wall = time.time() - t0
        rtf = duration / wall if wall > 0 else 0.0
        result: Dict[str, Any] = {
            "success": True,
            "segments": segments,
            "text": " ".join(s["text"] for s in segments).strip(),
            "language": info["language"],
            "language_probability": info["language_probability"],
            "duration": duration,
            "processing_time": wall,
            "real_time_factor": rtf,
            "num_windows": len(windows),
            "performance": (
                self.last_monitor.final_report()
                if getattr(self, "last_monitor", None) else None
            ),
            "diagnostics": diag.summary(),
            "metadata": {
                "audio_file": audio_path,
                "model": self.model_size,
                "device": jax.default_backend(),
                "total_segments": len(segments),
            },
        }
        if output_formats:
            result["output_files"] = self._generate_outputs(
                audio_path, segments, result, output_formats, output_dir
            )
        return result

    # ------------------------------------------------------------------

    def _transcribe_windows(
        self, pre, uploader, windows, prompt_ids, sot_idx, beam, temps,
        length_penalty, sample_len, cr_thresh, lp_thresh, ns_thresh,
        progress_callback=None, best_of: int = 5, rep_penalty: float = 1.0,
        patience: float = 1.0, ngram: int = 0, journal=None,
        skip_ids: Optional[set] = None, opts: Optional[_CallOpts] = None,
        deferred_lang: Optional[Dict[str, Any]] = None,
    ) -> List[Dict[str, Any]]:
        from whisper_aries_tpu.utils.perf import PerformanceMonitor

        parse_skip = len(prompt_ids)
        skip_ids = skip_ids or set()

        B = self.batch_size
        N = len(windows)
        all_segments: List[Dict[str, Any]] = []
        # windows already decoded in a previous (killed) run of this job;
        # skip_ids were handled by the caller (prefix window) — neither
        # re-decoded nor re-emitted here
        done = dict(journal.done) if journal is not None else {}
        for wid, segs in done.items():
            if wid not in skip_ids:
                all_segments.extend(segs)
        pending = [i for i in range(N) if i not in done and i not in skip_ids]
        if self.audio_ctx_bucket:
            # group short windows together so whole batches qualify for the
            # 16 s encoder bucket (stable within each group; the final
            # segment sort restores time order)
            pending.sort(key=lambda i: (
                windows[i].duration > self.SHORT_WINDOW_S, i))
        if pending:
            # size the dispatch batch to the FILE: ceil-divide the pending
            # count over the batch count the cap implies, then round up to
            # the x4 compile grid. Removes pad-window waste — a 72-window
            # file at the batch-48 cap would run 2x48 slots (33% padding,
            # measured 220x vs 256x engine RTF); 2x36 runs none. The x4
            # grid keeps the set of compile shapes small and reusable
            # across files in a server process.
            n_b = -(-len(pending) // B)
            per = -(-len(pending) // n_b)
            B = min(B, -(-per // 4) * 4)
        monitor = PerformanceMonitor(
            total_audio_s=sum(windows[i].duration for i in pending)
        )
        self.last_monitor = monitor
        diag = getattr(self, "last_diagnostics", None)
        if diag is not None:
            for i in pending:
                diag.log(i, "PLANNED",
                         f"{windows[i].start:.1f}-{windows[i].end:.1f}s")

        def batch_win(batch_idx) -> int:
            return (self.SHORT_WINDOW_SAMPLES
                    if self.audio_ctx_bucket and all(
                        windows[i].duration <= self.SHORT_WINDOW_S
                        for i in batch_idx)
                    else self.WINDOW_SAMPLES)

        # pipeline ramp-up ladder: the FIRST dispatch blocks on its whole
        # span's tunnel upload (~33 MB for a 36-window batch at the
        # measured 5-30 MB/s — a multi-second serial prefix, and the
        # slow-tunnel reps of profile_engine.py showed 1+ s stalls even
        # on good days). A 4-window first batch needs ~1 chunk so device
        # compute starts ~4-8x sooner, and a second 12-window rung keeps
        # decoding while the full batches' chunks stream behind it.
        # Skipped when the audio_ctx bucket sort reordered pending (the
        # ramp would then span scattered chunks) and off-TPU (no tunnel).
        ramp: Tuple[int, ...] = ()
        if jax.default_backend() == "tpu" and pending and len(pending) > B:
            n_dev = max(1, int(np.prod(self.mesh.devices.shape)))
            ramp = tuple(
                r * n_dev
                for r in _parse_ramp(os.environ.get("ARIES_RAMP", "4,12")))
            if self.audio_ctx_bucket and any(
                    windows[i].duration <= self.SHORT_WINDOW_S
                    for i in pending):
                ramp = ()

        def build_grid(start: int, cap: int, ramp: int):
            """[(offset, size)] dispatch plan for pending[start:]."""
            out, s = [], start
            for z in _batch_sizes(len(pending) - start, cap, ramp):
                out.append((s, z))
                s += z
            return out

        grid = build_grid(0, B, ramp)
        # queue every batch's covering chunks on the uploader's worker
        # NOW: the first batch blocks only on its own chunks; the rest
        # stream through the tunnel while earlier batches decode.
        # Chunk keying dedupes overlapping batch spans for free (the
        # audio_ctx bucket sort can interleave batch time ranges).
        for gs, gz in grid:
            gidx = pending[gs:gs + gz]
            s, e = self._batch_span(windows, gidx, batch_win(gidx))
            uploader.prefetch(s, e)

        def dispatch(p: int, nB: int) -> Dict[str, Any]:
            """Enqueue gather/mel/encode/decode for pending[p:p+nB] on the
            device WITHOUT blocking (jit dispatch is async; results stay on
            device until the caller fetches them)."""
            batch_idx = pending[p : p + nB]
            wb = [windows[i] for i in batch_idx]
            prompt = np.tile(np.asarray(prompt_ids, np.int32), (nB, 1))
            win = batch_win(batch_idx)
            chunk_j = self._gather_span(uploader, windows, batch_idx,
                                        nB, win=win)
            if diag is not None:
                for i in batch_idx:
                    diag.log(i, "ENCODING", f"batch@{p} size={nB}")
            mel = self._mel(chunk_j)
            xa = self._encode_batch(mel)
            win_langs = None
            row_lang = None
            if deferred_lang is not None:
                # per-FILE deferred detection (faster-whisper: detect on
                # the first window): the (1,) id computes once on device
                # from the FIRST batch's xa; later dispatches broadcast
                # the same device value — a queue data dependency, no
                # host sync anywhere
                if "_ids" not in deferred_lang:
                    sp = self.tokenizer.specials
                    probs1 = G.detect_language_batched(
                        self.params, xa[:1], self.dims, sp.sot,
                        deferred_lang["lang0"], sp.num_languages)
                    deferred_lang["_ids"] = (
                        deferred_lang["lang0"]
                        + jnp.argmax(probs1, -1).astype(jnp.int32))
                    deferred_lang["_prob"] = jnp.max(probs1, -1)
                row_lang = jnp.broadcast_to(deferred_lang["_ids"], (nB,))
            if opts is not None and opts.multilingual:
                # faster-whisper `multilingual`: every window decodes with
                # its own detected language token — one batched single-step
                # probe whose (B,) token ids STAY ON DEVICE (prompt rows
                # are data, so one compiled decode serves mixed-language
                # batches); the ids come back with the decode outputs, so
                # the probe no longer serialises the double-buffered
                # pipeline on a host fetch.
                sp = self.tokenizer.specials
                lang_tokens = getattr(sp, "language_tokens", None)
                if lang_tokens:
                    lang0 = min(lang_tokens.values())
                    row_lang = G.detect_language_ids(
                        self.params, xa, self.dims, sp.sot, lang0,
                        sp.num_languages)
                    win_langs = lang0  # parse resolves codes from row_lang
            out = self._decode_batch(
                xa, prompt, beam, temps[0], sample_len, length_penalty,
                repetition_penalty=rep_penalty, sot_index=sot_idx,
                patience=patience, no_repeat_ngram_size=ngram,
                opts=opts, fetch=False, row_lang=row_lang,
            )
            if diag is not None:
                for i in batch_idx:
                    diag.log(i, "DECODING", f"batch@{p} size={nB}")
            return {"pos": p, "batch_idx": batch_idx, "wb": wb,
                    "prompt": prompt, "out": out, "win_langs": win_langs,
                    "t0": time.time()}

        # Double-buffered batch loop (reference anatomy: its worker pool
        # overlapped compute and collection, final_optimized_transcriber.py
        # :256-298): keep up to `depth` batches in the device queue so host
        # token-parse/merge of batch k runs WHILE the device decodes batch
        # k+1. Depth 2 holds a second encoder-output + cross-KV set in HBM;
        # on OOM the ladder first drops to depth 1, then halves the batch.
        gi = 0  # next grid entry to dispatch (OOM retries rebuild the grid)
        bi = 0
        parsed = 0  # windows fetched+parsed (progress; dispatch runs ahead)
        depth = 2 if os.environ.get("ARIES_PIPELINE", "1") == "1" else 1
        inflight: List[Dict[str, Any]] = []
        while gi < len(grid) or inflight:
            try:
                while gi < len(grid) and len(inflight) < depth:
                    inflight.append(dispatch(*grid[gi]))
                    gi += 1
                head = inflight[0]
                # blocks until head's decode finishes; later batches keep
                # streaming behind it on the device queue
                out = {k: np.asarray(v) for k, v in head["out"].items()}
                inflight.pop(0)
            except Exception as e:
                # HBM OOM ladder: pipelining off first, then halve the
                # window batch; rewind to the oldest unparsed batch (the
                # auto batch heuristic is a first guess — the exact budget
                # depends on beam/sample_len/model, see parallel/mesh.py)
                if _is_oom(e) and (depth > 1 or B > 1):
                    depth_only = depth > 1
                    if depth_only:
                        depth = 1
                        log.warning("HBM OOM — disabling batch pipelining")
                    else:
                        B = max(1, B // 2)
                        self.batch_size = B
                        log.warning("HBM OOM — retrying with batch_size=%d",
                                    B)
                    if inflight:
                        restart = inflight[0]["pos"]
                    elif gi < len(grid):
                        restart = grid[gi][0]
                    else:
                        restart = len(pending)
                    if depth_only:
                        # B unchanged: keep the surviving tail of the grid so
                        # the retry stays on already-compiled batch shapes
                        # (re-ceil-dividing the remainder can invent a new
                        # shape => a 40-90 s tunnel compile mid-recovery)
                        grid = [g for g in grid if g[0] >= restart]
                    else:
                        # re-plan the undone remainder at the new budget (no
                        # ramp: its chunks are already uploaded by now)
                        grid = build_grid(restart, B, 0)
                    gi = 0
                    inflight = []
                    continue
                raise
            wb = head["wb"]
            n_real = len(head["batch_idx"])
            win_langs = head["win_langs"]
            prompt = head["prompt"]
            if win_langs is not None:
                # multilingual: the detected token ids arrived with the
                # fetched outputs; resolve codes and write the ids into the
                # HOST prompt rows (the fallback ladder re-prompts from it)
                lang0 = win_langs
                lang_ids = out.pop("row_lang")
                prompt[:, sot_idx + 1] = lang_ids
                win_langs = [LANGUAGES[int(t) - lang0] for t in lang_ids]
            elif deferred_lang is not None and "row_lang" in out:
                # deferred per-file detection: same id for every row; the
                # fallback ladder re-prompts from the updated host rows
                lang_ids = out.pop("row_lang")
                prompt[:, sot_idx + 1] = lang_ids
                if "code" not in deferred_lang:
                    deferred_lang["code"] = LANGUAGES[
                        int(lang_ids[0]) - deferred_lang["lang0"]]
                    deferred_lang["prob"] = float(
                        np.asarray(deferred_lang["_prob"])[0])
            t_batch = head["t0"]
            # parse every window first, collecting the quality-gate
            # failures, then run the temperature ladder for ALL of them in
            # batched dispatches (_fallback_windows) instead of one serial
            # re-encode+decode per failing window
            rows: List[Tuple[int, int, Window, List[Dict[str, Any]], bool]] = []
            fails: List[Tuple[int, Window, np.ndarray,
                              List[Dict[str, Any]]]] = []
            for w_i in range(n_real):
                window = wb[w_i]
                win_id = head["batch_idx"][w_i]
                failed = False
                try:
                    segs, quality = self._parse_one(
                        out["tokens"][w_i], window, parse_skip,
                        float(out["avg_logprob"][w_i]),
                        float(out["no_speech_prob"][w_i]),
                        cr_thresh, lp_thresh, ns_thresh,
                    )
                    if quality["is_silence"]:
                        if journal is not None:
                            journal.record(win_id, [])
                        if diag is not None:
                            diag.log(win_id, "COMPLETED", "silence")
                        continue
                    if quality["needs_fallback"] and len(temps) > 1:
                        # multilingual rows keep their detected language
                        # token (written into the host prompt above)
                        fails.append((win_id, window, prompt[w_i], segs))
                        if diag is not None:
                            diag.log(
                                win_id, "FALLBACK",
                                f"cr={quality['compression_ratio']:.2f} "
                                f"lp={out['avg_logprob'][w_i]:.2f}")
                except Exception as e:
                    # per-window soft failure: one bad window must not kill
                    # the file (reference emits ChunkResult(success=False)
                    # and keeps going, final_optimized_transcriber.py:355-365)
                    log.warning("window %d (%.1f-%.1fs) failed: %s",
                                win_id, window.start, window.end, e)
                    if diag is not None:
                        diag.log(win_id, "ERROR", str(e))
                    failed = True
                    segs = [{
                        "start": window.start, "end": window.end, "text": "",
                        "success": False, "error": str(e),
                        "avg_logprob": 0.0, "no_speech_prob": 0.0,
                    }]
                rows.append((w_i, win_id, window, segs, failed))
            fb: Dict[int, Tuple[List[Dict[str, Any]], float]] = {}
            if fails:
                try:
                    fb = self._fallback_windows(
                        uploader, windows, fails, temps[1:], sample_len,
                        cr_thresh, lp_thresh, ns_thresh, best_of=best_of,
                        sot_idx=sot_idx, parse_skip=parse_skip, opts=opts,
                    )
                except Exception as e:
                    log.warning("fallback ladder failed (%s); keeping "
                                "first-pass segments", e)
            for w_i, win_id, window, segs, failed in rows:
                if win_id in fb:
                    segs = fb[win_id][0]
                if win_langs is not None and not failed:
                    for s in segs:
                        s["language"] = win_langs[w_i]
                for s in segs:
                    s["chunk_id"] = window.chunk_id
                    s["window_id"] = win_id
                    s["worker_id"] = w_i % max(
                        1, int(np.prod(self.mesh.devices.shape))
                    )
                # failed windows are NOT journaled: a resume retries them
                if journal is not None and not failed:
                    journal.record(win_id, segs)
                if diag is not None and not failed:
                    diag.log(win_id, "COMPLETED", f"{len(segs)} segment(s)")
                all_segments.extend(segs)
            if journal is not None:
                journal.flush()  # one fsync per batch, not per window
            monitor.record(
                bi, sum(w.duration for w in wb), time.time() - t_batch,
                device=bi % max(1, int(np.prod(self.mesh.devices.shape))),
                kind="batch",
            )
            bi += 1
            parsed += n_real
            if progress_callback:
                progress_callback(len(done) + parsed, N)

        all_segments.sort(key=lambda s: (s["start"], s["end"]))
        return all_segments

    def _transcribe_windows_sequential(
        self, pre, uploader, windows, prompt_ids, sot_idx, beam, temps,
        length_penalty, sample_len, cr_thresh, lp_thresh, ns_thresh,
        progress_callback=None, rep_penalty: float = 1.0,
        patience: float = 1.0, ngram: int = 0, journal=None,
        prefix_ids: Optional[List[int]] = None,
        opts: Optional[_CallOpts] = None,
    ) -> List[Dict[str, Any]]:
        """Window-by-window decode with cross-window text conditioning.

        Each window's prompt becomes <|startofprev|> + previous text tokens
        + the sot sequence (faster-whisper's condition_on_previous_text).
        ``prefix_ids`` force the FIRST window's transcript start (faster-
        whisper applies `prefix` at seek==0 only). Slower than the batched
        path — this is the fidelity mode.
        """
        sp = self.tokenizer.specials
        prefix_ids = prefix_ids or []
        # length of the sot sequence at the tail of prompt_ids (prompt_ids may
        # already carry an initial_prompt <|startofprev|> prefix of sot_idx
        # tokens)
        sot_seq = list(prompt_ids[sot_idx:])
        # All prompts are LEFT-PADDED to one static width so the whole
        # sequential mode is a single compiled decode program (a fresh jit
        # per distinct prompt length costs 40-90 s on the TPU tunnel).
        P_max = 224 + len(sot_seq) + len(prefix_ids)
        all_segments: List[Dict[str, Any]] = []
        prev_tokens: List[int] = []
        done = dict(journal.done) if journal is not None else {}
        for wi, window in enumerate(windows):
            if wi in done:
                segs = done[wi]
                all_segments.extend(segs)
                # rebuild conditioning state from the journaled tokens —
                # unless that window reset conditioning (fallback) in the
                # original run
                if journal is not None and wi in journal.reset_ids:
                    prev_tokens = []
                else:
                    prev_tokens = [
                        t for s in segs for t in s.get("tokens", [])
                        if t < sp.eot
                    ] if segs else []
                continue
            pfx = list(prefix_ids) if wi == 0 else []
            if prev_tokens:
                keep = max(0, 223 - len(sot_seq))
                prev = [sp.sot_prev] + (prev_tokens[-keep:] if keep else [])
                prompt = prev + sot_seq + pfx
            else:
                prompt = list(prompt_ids) + pfx
            # sot position in the left-padded static buffer
            w_sot = P_max - len(sot_seq) - len(pfx)
            pad = P_max - len(prompt)
            prompt = [-1] * pad + prompt  # -1 pads are masked in the decoder
            # queue this window's span, then the NEXT one (single upload
            # worker: order matters) so it streams while this one decodes
            uploader.prefetch(*self._batch_span(windows, [wi]))
            if wi + 1 < len(windows):
                uploader.prefetch(*self._batch_span(windows, [wi + 1]))
            mel = self._mel(self._gather_span(uploader, windows, [wi], 1))
            xa = self._encode_batch(mel)
            win_lang = None
            if opts is not None and opts.multilingual and len(sot_seq) >= 2:
                det = self._window_languages(xa)
                if det is not None:
                    # language token sits right after <|sot|> in the
                    # (left-padded) prompt buffer
                    prompt[w_sot + 1] = int(det[0][0])
                    win_lang = det[1][0]
            try:
                out = self._decode_batch(
                    xa, np.asarray(prompt, np.int32)[None], beam, temps[0],
                    sample_len, length_penalty, sot_index=w_sot,
                    repetition_penalty=rep_penalty, patience=patience,
                    no_repeat_ngram_size=ngram, prompt_start=pad, opts=opts,
                )
                segs, quality = self._parse_one(
                    out["tokens"][0], window, len(prompt) - len(pfx),
                    float(out["avg_logprob"][0]), float(out["no_speech_prob"][0]),
                    cr_thresh, lp_thresh, ns_thresh,
                )
            except Exception as e:
                log.warning("window %d (%.1f-%.1fs) failed: %s",
                            wi, window.start, window.end, e)
                segs = [{
                    "start": window.start, "end": window.end, "text": "",
                    "success": False, "error": str(e),
                    "avg_logprob": 0.0, "no_speech_prob": 0.0,
                }]
                quality = {"is_silence": False, "needs_fallback": False}
                prev_tokens = []
            if quality["is_silence"]:
                prev_tokens = []
                if journal is not None:
                    journal.record(wi, [], sync=True)
                continue
            was_fallback = False
            if quality["needs_fallback"] and len(temps) > 1:
                segs, used_t = self._fallback_windows(
                    uploader, windows, [(wi, window, prompt, segs)],
                    temps[1:], sample_len,
                    cr_thresh, lp_thresh, ns_thresh, sot_idx=w_sot,
                    prompt_start=pad, parse_skip=len(prompt) - len(pfx),
                    opts=opts,
                )[wi]
                # faster-whisper prompt_reset_on_temperature: the text
                # context only resets when the ACCEPTED temperature
                # exceeds the threshold — low-temperature recoveries keep
                # conditioning
                reset_t = (opts.prompt_reset_on_temperature
                           if opts is not None else 0.5)
                was_fallback = used_t > reset_t
            if was_fallback:
                prev_tokens = []
            elif segs and segs[0].get("success", True):
                prev_tokens = [
                    t for s in segs for t in s.get("tokens", [])
                    if t < sp.eot
                ]
            if win_lang is not None:
                for s in segs:
                    s["language"] = win_lang
            for s in segs:
                s["chunk_id"] = window.chunk_id
                s["window_id"] = wi
                s["worker_id"] = 0
            if journal is not None and not (segs and segs[0].get("success")
                                            is False):
                # reset=True replays the conditioning reset on resume;
                # the sequential fidelity mode keeps per-window durability
                journal.record(wi, segs, reset=was_fallback, sync=True)
            all_segments.extend(segs)
            if progress_callback:
                progress_callback(wi + 1, len(windows))
        all_segments.sort(key=lambda s: (s["start"], s["end"]))
        return all_segments

    def _parse_one(self, toks, window, prompt_len, avg_lp, ns_prob,
                   cr_thresh, lp_thresh, ns_thresh):
        segs = parse_window_tokens(
            toks, self.tokenizer, window.start, window.duration,
            prompt_len=prompt_len,
        )
        text = " ".join(s["text"] for s in segs)
        q = window_quality(
            text, avg_lp, ns_prob,
            log_prob_threshold=lp_thresh,
            compression_ratio_threshold=cr_thresh,
            no_speech_threshold=ns_thresh,
        )
        for s in segs:
            s["avg_logprob"] = avg_lp
            s["no_speech_prob"] = ns_prob
        return segs, q

    #: max failing windows per fallback dispatch — keeps best_of*group
    #: rows inside the known-good 128-row decode tier (ROADMAP)
    FALLBACK_GROUP = 16

    def _fallback_windows(self, uploader, windows, fails, temps,
                          sample_len, cr_thresh, lp_thresh, ns_thresh,
                          best_of: int = 5, sot_idx: int = 0,
                          prompt_start: int = 0,
                          parse_skip: Optional[int] = None,
                          opts: Optional[_CallOpts] = None
                          ) -> Dict[int, Tuple[List[Dict[str, Any]], float]]:
        """Temperature-fallback ladder for failing windows, batched
        (faster-whisper's ladder; README.md:179 TEMPERATURE).

        ``fails``: list of (win_idx, window, prompt_row, t0_segs) — every
        window of one batch that flunked the quality gates at temps[0].
        At each temperature rung, ``best_of`` independent samples of ALL
        still-failing windows run as ONE dispatch (the reference whitelists
        best_of at final_optimized_transcriber.py:310-319; CTranslate2
        samples num_hypotheses and keeps the best by sum logprob).

        Round-4 rework: the old per-window path materialised the full-file
        float32 via windows_to_batch(pre.audio), re-uploaded each window
        best_of times through a host np.tile, and dispatched once per
        window — on noisy audio (the reference's Arabic-meeting use case)
        that serial path dominated. Now windows gather on-device from the
        chunked uploader (cache hit — their chunks already uploaded for
        the main pass), best_of tiling is a device-side repeat, and the
        window count pads to a power of two so rungs reuse a handful of
        compiled programs.

        Returns {win_idx: (segments, used_temperature)} — the sequential
        path uses the accepted temperature for prompt_reset_on_temperature.
        """
        K = max(1, best_of)
        results: Dict[int, Tuple[List[Dict[str, Any]], float]] = {}
        last_t = float(temps[-1]) if len(temps) else 0.0
        for g0 in range(0, len(fails), self.FALLBACK_GROUP):
            group = fails[g0:g0 + self.FALLBACK_GROUP]
            F = len(group)
            Fp = 1 << max(0, (F - 1).bit_length())
            idx = [f[0] for f in group] + [group[-1][0]] * (Fp - F)
            xa = self._encode_batch(
                self._mel(self._gather_span(uploader, windows, idx, Fp)))
            xa = jnp.repeat(xa, K, axis=0)
            P = len(group[0][2])
            prompt = np.empty((Fp, P), np.int32)
            for i, f in enumerate(group):
                prompt[i] = np.asarray(f[2], np.int32)
            prompt[F:] = prompt[F - 1]
            prompt = np.repeat(prompt, K, axis=0)
            skip = P if parse_skip is None else parse_skip
            best = {f[0]: (f[3], last_t) for f in group}
            pending = {i: f for i, f in enumerate(group)}
            for t_i, t in enumerate(temps):
                if not pending:
                    break
                out = self._decode_batch(
                    xa, prompt, beam_size=1, temperature=float(t),
                    sample_len=sample_len, length_penalty=1.0,
                    seed=1234 + t_i, sot_index=sot_idx,
                    prompt_start=prompt_start, opts=opts,
                )
                for i in list(pending):
                    win_idx, window = pending[i][0], pending[i][1]
                    rows = out["sum_logprob"][i * K:(i + 1) * K]
                    b = i * K + int(np.argmax(rows))
                    segs, q = self._parse_one(
                        out["tokens"][b], window, skip,
                        float(out["avg_logprob"][b]),
                        float(out["no_speech_prob"][b]),
                        cr_thresh, lp_thresh, ns_thresh,
                    )
                    if q["is_silence"]:
                        results[win_idx] = ([], float(t))
                        del pending[i]
                    elif not q["needs_fallback"]:
                        results[win_idx] = (segs, float(t))
                        del pending[i]
                    else:
                        best[win_idx] = (segs, last_t)
            for f in pending.values():
                results[f[0]] = best[f[0]]
        return results

    # ------------------------------------------------------------------
    # Output writers (engine-level TXT/JSON/SRT:
    # final_optimized_transcriber.py:558-612)
    # ------------------------------------------------------------------

    def _generate_outputs(self, audio_path, segments, result, formats,
                          output_dir=None) -> Dict[str, str]:
        stem = Path(audio_path).with_suffix("")
        if output_dir:
            Path(output_dir).mkdir(parents=True, exist_ok=True)
            stem = Path(output_dir) / Path(audio_path).stem
        out: Dict[str, str] = {}
        for fmt in formats:
            path = f"{stem}.{fmt}"
            if fmt == "txt":
                with open(path, "w", encoding="utf-8") as f:
                    for s in segments:
                        f.write(s["text"].strip() + "\n")
            elif fmt == "json":
                payload = {
                    "transcription": [
                        {k: s[k] for k in
                         ("start", "end", "text", "avg_logprob",
                          "no_speech_prob", "chunk_id", "worker_id")
                         if k in s}
                        for s in segments
                    ],
                    "metadata": {
                        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                        "audio_file": str(audio_path),
                        "total_segments": len(segments),
                        "model": self.model_size,
                        "device": jax.default_backend(),
                        "language": result.get("language"),
                    },
                }
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(payload, f, indent=2, ensure_ascii=False)
            elif fmt == "srt":
                with open(path, "w", encoding="utf-8") as f:
                    for i, s in enumerate(segments, 1):
                        f.write(f"{i}\n{srt_timestamp(s['start'])} --> "
                                f"{srt_timestamp(s['end'])}\n"
                                f"{s['text'].strip()}\n\n")
            else:
                continue
            out[fmt] = path
        return out


# Back-compat alias mirroring the reference class name.
OptimizedParallelTranscriber = AriesTranscriber
