"""Learning-rate schedules (reference ``train/lr_common_manager.py:22-46``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _warm_up_cos(xp, step, lr, end_warm, end_iter, alpha):
    """One formula for both the traced (jnp) and host (np) evaluations —
    a single source of truth so the logged lr can never silently diverge
    from the lr fed to optax."""
    warm_factor = step / end_warm
    progress = (step - end_warm) / (end_iter - end_warm)
    cos_factor = (xp.cos(xp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
    return lr * xp.where(step < end_warm, warm_factor, cos_factor)


def warm_up_cos_schedule(lr: float = 5e-4, end_warm: int = 5000,
                         end_iter: int = 300000, alpha: float = 0.05):
    """Linear warm-up then cosine decay to ``alpha * lr`` — an optax-style
    schedule function usable directly in ``optax.adam``."""

    def schedule(step):
        return _warm_up_cos(jnp, jnp.asarray(step, jnp.float32),
                            lr, end_warm, end_iter, alpha)

    return schedule


def warm_up_cos_host(lr: float = 5e-4, end_warm: int = 5000,
                     end_iter: int = 300000, alpha: float = 0.05):
    """Same schedule evaluated with numpy on the HOST.

    The trainer logs ``lr`` every train_log_step; evaluating the jnp
    schedule there launches a handful of tiny device programs, and on the
    remote-compiled axon tunnel each first-time tiny jit costs tens of
    seconds — a pure-host evaluation keeps logging free."""

    def schedule(step):
        return float(_warm_up_cos(np, np.float32(step),
                                  lr, end_warm, end_iter, alpha))

    return schedule


name2lr_schedule = {"warm_up_cos": warm_up_cos_schedule}
