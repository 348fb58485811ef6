"""Shared utilities: seeding, meters, parameter summaries.

Reference: /root/reference/utils/{helper.py,util.py}.
"""

from rot_mvgaze_tpu.utils.config import build_model_from_cfg
from rot_mvgaze_tpu.utils.helper import AverageMeter
from rot_mvgaze_tpu.utils.profiling import StepTimer, device_memory_stats, trace
from rot_mvgaze_tpu.utils.seed import set_seed
from rot_mvgaze_tpu.utils.summary import count_parameters, parameter_table

__all__ = [
    "AverageMeter",
    "build_model_from_cfg",
    "set_seed",
    "count_parameters",
    "parameter_table",
    "StepTimer",
    "device_memory_stats",
    "trace",
]
