from unet_torch_tpu.models.transunet.configs import CONFIGS
from unet_torch_tpu.models.transunet.resnetv2 import ResNetV2, StdConv
from unet_torch_tpu.models.transunet.vit import (
    Attention,
    DecoderCup,
    Embeddings,
    SegmentationHead,
    VisionTransformer,
    VisionTransformerMultitask,
    VisionTransformerMultitaskEM,
    bilinear_upsample_2x,
    build_transunet,
    load_npz_into_params,
)
