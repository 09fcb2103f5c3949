from ceigm_unet_tpu.data.datasets import SynapseDataset, ACDCDataset
from ceigm_unet_tpu.data.loader import DataLoader

__all__ = ["SynapseDataset", "ACDCDataset", "DataLoader"]
