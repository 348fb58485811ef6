"""L5 training/evaluation runtime.

Reference: /root/reference/trainer.py. Components: jitted train/eval steps,
Adam + cyclic-triangular2 LR, Orbax checkpoints, TensorBoard-compatible
event writer, data-parallel sharding.
"""

from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
from rot_mvgaze_tpu.train.trainer import Trainer, TrainState, make_optimizer

__all__ = ["cyclic_triangular2", "Trainer", "TrainState", "make_optimizer"]
