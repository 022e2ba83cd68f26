from fusion_tpu.utils.common import catchtime, count_parameters, estimate_flops, log_step, set_seed
from fusion_tpu.utils.loggers import JSONLLogger, LoggingHandler, WandbLogger

__all__ = [
    "catchtime",
    "count_parameters",
    "estimate_flops",
    "log_step",
    "set_seed",
    "JSONLLogger",
    "LoggingHandler",
    "WandbLogger",
]
