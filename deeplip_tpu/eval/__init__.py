from deeplip_tpu.eval.eer import eer_from_scores, eer_sweep
from deeplip_tpu.eval.scoring import (
    TrialList,
    EmbeddingStore,
    cosine_scores,
    cosine_eer,
    score_fusion_eer,
    feature_fusion_eer,
    feature_normalize,
)
from deeplip_tpu.eval.plda import PLDA, plda_eer

__all__ = [
    "eer_from_scores",
    "eer_sweep",
    "TrialList",
    "EmbeddingStore",
    "cosine_scores",
    "cosine_eer",
    "score_fusion_eer",
    "feature_fusion_eer",
    "feature_normalize",
    "PLDA",
    "plda_eer",
]
