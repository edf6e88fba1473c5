from unet_torch_tpu.kernels.attention import attention_reference, fused_attention
from unet_torch_tpu.kernels.auction import auction_lsap, auction_lsap_batched
from unet_torch_tpu.kernels.fused_conv import (
    fold_bn,
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_reference,
)
from unet_torch_tpu.kernels.minplus import minplus, minplus_reference
