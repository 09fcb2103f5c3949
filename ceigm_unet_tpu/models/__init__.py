from ceigm_unet_tpu.models.msvm_unet import MSVMUNet, build_model
from ceigm_unet_tpu.models.groupmamba import (
    GroupMamba, GroupMambaLayer, BlockMamba, Stem, DownSample,
    build_groupmamba, GROUPMAMBA_CONFIGS)
from ceigm_unet_tpu.models.emcad import EMCAD
from ceigm_unet_tpu.models.ss2d import SS2D, QuadGroupSS2D
from ceigm_unet_tpu.models.vmamba import (
    VSSBlock, MSVSS, VSSM, LegacyDecoder, MSVMUNetLegacy, LKPE, FLKPE,
    UpBlock, build_vssm, VSSM_CONFIGS)

__all__ = [
    "MSVMUNet", "build_model", "GroupMamba", "GroupMambaLayer", "BlockMamba",
    "Stem", "DownSample", "build_groupmamba", "GROUPMAMBA_CONFIGS", "EMCAD",
    "SS2D", "QuadGroupSS2D", "VSSBlock", "MSVSS", "VSSM", "LegacyDecoder",
    "MSVMUNetLegacy", "LKPE", "FLKPE", "UpBlock", "build_vssm",
    "VSSM_CONFIGS",
]
