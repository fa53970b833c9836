"""Dataset adapters: name -> class registry (replaces the reference's
if/elif dispatch, data_loader/data_loader.py:40-63)."""
from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.datasets.msrvtt import (
    MSRVTTObjectSelect,
    MSRVTTQAObjectSelect,
    MSRVTTMCObjectSelect,
)
from demovlp_tpu.data.datasets.webvid import WebVidObjectSelect
from demovlp_tpu.data.datasets.cc3m import ConceptualCaptions3MObjectSelect
from demovlp_tpu.data.datasets.msvd import MSVDObjectSelect, MSVDQAObjectSelect
from demovlp_tpu.data.datasets.didemo import DiDeMoObjectSelect
from demovlp_tpu.data.datasets.lsmdc import LSMDCObjectSelect, LSMDCMCObjectSelect
from demovlp_tpu.data.datasets.tgif import TGIFFrameObjectSelect
from demovlp_tpu.data.datasets.synthetic import SyntheticObjectSelect

DATASET_REGISTRY = {
    cls.__name__: cls
    for cls in [
        MSRVTTObjectSelect,
        MSRVTTQAObjectSelect,
        MSRVTTMCObjectSelect,
        WebVidObjectSelect,
        ConceptualCaptions3MObjectSelect,
        MSVDObjectSelect,
        MSVDQAObjectSelect,
        DiDeMoObjectSelect,
        LSMDCObjectSelect,
        LSMDCMCObjectSelect,
        TGIFFrameObjectSelect,
        SyntheticObjectSelect,
    ]
}


def dataset_object_loader(dataset_name: str, **kwargs) -> RegionDataset:
    if dataset_name not in DATASET_REGISTRY:
        raise NotImplementedError(f"Dataset: {dataset_name} not found.")
    return DATASET_REGISTRY[dataset_name](dataset_name=dataset_name, **kwargs)


__all__ = ["RegionDataset", "DATASET_REGISTRY", "dataset_object_loader"] + list(
    DATASET_REGISTRY
)
