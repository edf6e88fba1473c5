from unet_torch_tpu.utils.debug import check_input, profile_trace
from unet_torch_tpu.utils.logger import MetricLogger, SmoothedValue
