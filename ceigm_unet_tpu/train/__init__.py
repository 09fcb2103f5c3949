from ceigm_unet_tpu.train.config import TrainConfig, SYNAPSE_CONFIG, ACDC_CONFIG
from ceigm_unet_tpu.train.trainstep import (
    TrainState, create_train_state, make_train_step, cosine_lr)

__all__ = ["TrainConfig", "SYNAPSE_CONFIG", "ACDC_CONFIG", "TrainState",
           "create_train_state", "make_train_step", "cosine_lr"]
