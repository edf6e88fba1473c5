from unet_torch_tpu.nn.blocks import (
    DoubleConv,
    Down,
    Up,
    OutConv,
    AttentionGate,
    kaiming_normal,
)
