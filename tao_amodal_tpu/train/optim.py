"""Optimizer schedules + staged unfreezing.

Capability-parity with the reference's LR machinery
(``pysot/utils/lr_scheduler.py`` log-space schedule, warmup epochs,
``build_opt_lr`` staged backbone unfreeze at ``TRAIN.BACKBONE_TRAIN_
EPOCH`` in ``tools/train.py:74-116``), expressed as optax schedules
and masked transforms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def log_schedule(start_lr, end_lr, steps):
    """Log-space interpolation from start to end (the pysot 'log'
    schedule)."""
    lrs = np.exp(np.linspace(np.log(start_lr), np.log(end_lr), steps))

    def schedule(count):
        idx = jnp.minimum(count, steps - 1)
        return jnp.asarray(lrs)[idx]

    return schedule


def warmup_log_schedule(warmup_start, warmup_end, warmup_steps,
                        start_lr, end_lr, steps):
    """Warmup (log) then main log schedule, like pysot's
    ``WarmUPScheduler``."""
    warm = log_schedule(warmup_start, warmup_end, max(warmup_steps, 1))
    main = log_schedule(start_lr, end_lr, max(steps - warmup_steps, 1))

    def schedule(count):
        return jnp.where(count < warmup_steps, warm(count),
                         main(count - warmup_steps))

    return schedule


def staged_unfreeze_mask(params, frozen_prefixes, step, unfreeze_step):
    """Mask pytree: False (no update) for frozen params until
    ``unfreeze_step`` (reference: backbone frozen for the first
    BACKBONE_TRAIN_EPOCH epochs)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        frozen = any(p in "/".join(map(str, path))
                     for p in frozen_prefixes)
        mask[path] = not (frozen and step < unfreeze_step)
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(schedule, weight_decay=1e-4, momentum=0.9,
                   clip_norm=10.0):
    """SGD+momentum with grad clipping (the reference's training
    recipe: clip_grad_norm_ then SGD, ``tools/train.py:217-231``)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )


def make_adamw(schedule, weight_decay=1e-4, clip_norm=10.0):
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
    )
