from demovlp_tpu.ops.masking import additive_mask, l2norm
from demovlp_tpu.ops.similarity import sim_matrix, cosine_similarity
from demovlp_tpu.ops.xattn import func_attention, xattn_score

__all__ = [
    "additive_mask",
    "l2norm",
    "sim_matrix",
    "cosine_similarity",
    "func_attention",
    "xattn_score",
]
