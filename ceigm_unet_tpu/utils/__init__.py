from ceigm_unet_tpu.utils import initializers  # noqa: F401
