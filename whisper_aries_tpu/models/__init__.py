"""Model architectures: Whisper (ASR), VAD net, diarization nets.

All models are plain-pytree JAX: parameters are nested dicts of arrays with
per-layer leaves stacked on a leading layer axis (scan-over-layers), forward
passes are pure functions. No framework modules, no state objects — the
whole decode program jits into one XLA executable.
"""
