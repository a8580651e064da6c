from whisper_aries_tpu.pipeline.engine import AriesTranscriber, OptimizedParallelTranscriber
from whisper_aries_tpu.pipeline.run import get_transcriber, run_pipeline

__all__ = [
    "AriesTranscriber",
    "OptimizedParallelTranscriber",
    "get_transcriber",
    "run_pipeline",
]
