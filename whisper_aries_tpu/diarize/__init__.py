from whisper_aries_tpu.diarize.cluster import (
    agglomerative_cluster,
    cosine_distance_matrix,
    relabel_by_first_appearance,
)
from whisper_aries_tpu.diarize.pipeline import DiarizationPipeline

__all__ = [
    "agglomerative_cluster",
    "cosine_distance_matrix",
    "relabel_by_first_appearance",
    "DiarizationPipeline",
]
