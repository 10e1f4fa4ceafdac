"""Optimizers and schedules.

Reference: AdamW with cosine LambdaLR ``(1 + cos(e*pi/E)) / 2``
(STEM-GNN/utils/others.py:138-145, pretrain.py:134-136) and grad-clip 1.0
(pretrain.py:62).  Built on optax; the schedule steps per *optimizer step*
like the reference's per-batch ``scheduler.step()`` (pretrain.py:64-65) when
``steps_per_epoch`` is given.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import optax


def cosine_lambda_schedule(base_lr: float, epochs: int,
                           steps_per_epoch: int = 1):
    """lr(step) = base * (1 + cos(epoch * pi / epochs)) / 2, with epoch
    advancing fractionally per step — matches LambdaLR stepping each batch."""
    def fn(step):
        # jnp: the schedule is traced inside the jitted update.
        import jax.numpy as jnp
        epoch = step / steps_per_epoch
        return base_lr * (1 + jnp.cos(jnp.minimum(epoch, epochs)
                                      * jnp.pi / epochs)) * 0.5
    return fn


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   grad_clip: Optional[float] = None,
                   use_scheduler: bool = False, epochs: int = 1,
                   steps_per_epoch: int = 1):
    """AdamW (+ optional global-norm clip + cosine schedule)."""
    sched = cosine_lambda_schedule(lr, epochs, steps_per_epoch) \
        if use_scheduler else lr
    tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if grad_clip is not None and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
