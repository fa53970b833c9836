from demovlp_tpu.convert.torch_import import (
    convert_reference_checkpoint,
    load_reference_checkpoint,
    inflate_temporal_embed,
    import_timm_vit,
)

__all__ = [
    "convert_reference_checkpoint",
    "load_reference_checkpoint",
    "inflate_temporal_embed",
    "import_timm_vit",
]
