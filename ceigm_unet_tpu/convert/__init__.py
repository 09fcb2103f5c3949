from ceigm_unet_tpu.convert.torch_import import (
    convert_msvm_unet_state_dict, convert_groupmamba_state_dict,
    remap_pretrained_groupmamba_keys, strip_lightning_prefix,
)

__all__ = [
    "convert_msvm_unet_state_dict", "convert_groupmamba_state_dict",
    "remap_pretrained_groupmamba_keys", "strip_lightning_prefix",
]
