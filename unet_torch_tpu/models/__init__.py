from unet_torch_tpu.models.unet import UNet, UNetMultitask, UNetAttention, build_model
