from demovlp_tpu.data.regions import (
    load_frame_regions,
    select_regions,
    read_video_regions,
    read_image_regions,
)
from demovlp_tpu.data.sampling import sample_frame_indices
from demovlp_tpu.data.tokenizer import build_tokenizer, SimpleTokenizer
from demovlp_tpu.data.loader import RegionDataLoader, MultiDistTextObjectVideoDataLoader

__all__ = [
    "load_frame_regions",
    "select_regions",
    "read_video_regions",
    "read_image_regions",
    "sample_frame_indices",
    "build_tokenizer",
    "SimpleTokenizer",
    "RegionDataLoader",
    "MultiDistTextObjectVideoDataLoader",
]
