from moca_tpu.models.unet3d import UNetConfig, UNet3D  # noqa: F401
