from demovlp_tpu.convert.torch_import import (
    convert_reference_checkpoint,
    load_reference_checkpoint,
    inflate_temporal_embed,
    import_timm_vit,
)
from demovlp_tpu.convert.torch_export import (
    export_reference_state_dict,
    save_reference_checkpoint,
)

__all__ = [
    "convert_reference_checkpoint",
    "load_reference_checkpoint",
    "inflate_temporal_embed",
    "import_timm_vit",
    "export_reference_state_dict",
    "save_reference_checkpoint",
]
