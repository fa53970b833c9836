from demovlp_tpu.models.object_transformer import ObjectTransformer
from demovlp_tpu.models.distilbert import DistilBertConfig, DistilBertModel
from demovlp_tpu.models.qa_head import BUTDQAHead
from demovlp_tpu.models.feature_extractor import PatchRegionExtractor
from demovlp_tpu.models.dual_encoder import (
    ObjectRelation,
    ObjectQARelation,
    ObjectMCRelation,
)

__all__ = [
    "ObjectTransformer",
    "DistilBertConfig",
    "DistilBertModel",
    "BUTDQAHead",
    "PatchRegionExtractor",
    "ObjectRelation",
    "ObjectQARelation",
    "ObjectMCRelation",
]
