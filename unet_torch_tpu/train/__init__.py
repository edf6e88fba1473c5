from unet_torch_tpu.train.optim import (
    ReduceLROnPlateau,
    make_optimizer,
    poly_lr,
)
from unet_torch_tpu.train.state import TrainState
from unet_torch_tpu.train.trainer import Trainer
