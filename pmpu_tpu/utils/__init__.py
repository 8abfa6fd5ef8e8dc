from pmpu_tpu.utils.colorize import mask_to_image  # noqa: F401
from pmpu_tpu.utils.tblog import MetricWriter  # noqa: F401
