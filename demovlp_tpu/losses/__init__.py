from demovlp_tpu.losses.losses import (
    GlobalLocalLoss,
    NormSoftmaxLoss,
    RWALoss,
    CrossEntropy,
    MaxMarginRankingLoss,
    norm_softmax_loss,
    rwa_loss,
    cross_entropy_loss,
    max_margin_ranking_loss,
)

__all__ = [
    "GlobalLocalLoss",
    "NormSoftmaxLoss",
    "RWALoss",
    "CrossEntropy",
    "MaxMarginRankingLoss",
    "norm_softmax_loss",
    "rwa_loss",
    "cross_entropy_loss",
    "max_margin_ranking_loss",
]
