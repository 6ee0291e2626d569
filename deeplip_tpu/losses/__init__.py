from deeplip_tpu.losses.softmax import (
    CrossEntropyHead,
    LMCL,
    AAMSoftmax,
    ASoftmax,
    build_criterion,
)
from deeplip_tpu.losses.triplet import (
    OnlineTripletLoss,
    batch_all_triplet_loss,
    batch_hard_triplet_loss,
    semihard_triplet_loss,
    contrastive_loss,
)

__all__ = [
    "CrossEntropyHead",
    "LMCL",
    "AAMSoftmax",
    "ASoftmax",
    "build_criterion",
    "OnlineTripletLoss",
    "batch_all_triplet_loss",
    "batch_hard_triplet_loss",
    "semihard_triplet_loss",
    "contrastive_loss",
]
