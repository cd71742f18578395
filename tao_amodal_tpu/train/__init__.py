"""Training stack: losses, target assignment, augmentation, schedules,
trainer loop with checkpoint/resume + fail-safe retry."""

from tao_amodal_tpu.train.loop import Trainer, TrainConfig  # noqa: F401
from tao_amodal_tpu.train.optim import (  # noqa: F401
    log_schedule,
    warmup_log_schedule,
    staged_unfreeze_mask,
)
from tao_amodal_tpu.train.anchor_target import assign_anchor_targets  # noqa: F401
