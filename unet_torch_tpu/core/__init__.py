from unet_torch_tpu.core.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from unet_torch_tpu.core.precision import Precision, DEFAULT_PRECISION
from unet_torch_tpu.core.rng import seed_everything, RngStream
