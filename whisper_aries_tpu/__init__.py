"""whisper_aries_tpu — a TPU-native speech-to-insight framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Hamza-Waseem-Nasser/Whisper-Aries: chunked long-form Whisper transcription,
speaker diarization, transcript/speaker alignment, renderers, LLM meeting
analytics, and an async job-queue API server — built for TPU from the start
(device-mesh data parallelism over 30 s windows instead of thread pools;
Pallas kernels for the mel front-end and quantized matmuls; KV-cached
batched beam search under jit).
"""

__version__ = "0.1.0"

from whisper_aries_tpu.config import AriesConfig, load_config
from whisper_aries_tpu.errors import (
    AlignmentError,
    AudioError,
    ConversationError,
    DiarizationError,
    ServingError,
    TranscriptionError,
)
