"""Learning-rate schedules.

Parity with ``models/networks.py:89-118`` (get_scheduler): the reference
steps the LR once per *epoch*; here the schedule is a pure function of the
global step with the epoch derived as ``step // steps_per_epoch``, so a
fully jitted training loop sees the exact same per-epoch LR values.
"""

from __future__ import annotations

import math


def make_lr_schedule(opt, steps_per_epoch: int):
    """Return ``lr(step)`` matching the reference policy semantics.

    policies (reference lambda evaluated at integer epoch e):
      linear: lr * (1-t) + lr_final * t,  t = max(0, e+1-n_epochs+n_epochs_decay)/(n_epochs_decay+1)
      exp:    exp(log(lr)*(1-t) + log(lr_final)*t)   [default in all scripts]
      step:   lr * gamma^(e // lr_decay_epochs)
    """
    lr0 = opt.lr
    policy = opt.lr_policy

    def t_of_epoch(e):
        return max(
            0.0, e + 1 - opt.n_epochs + opt.n_epochs_decay
        ) / float(opt.n_epochs_decay + 1)

    def lr_fn(step: int) -> float:
        e = int(step) // max(1, steps_per_epoch)
        if policy == "linear":
            t = t_of_epoch(e)
            return lr0 * (1 - t) + opt.lr_final * t
        if policy == "exp":
            t = t_of_epoch(e)
            return math.exp(
                math.log(lr0) * (1 - t) + math.log(opt.lr_final) * t)
        if policy == "step":
            return lr0 * (opt.lr_decay_gamma ** (e // opt.lr_decay_epochs))
        raise NotImplementedError(f"lr policy {policy}")

    return lr_fn


def make_jax_lr_schedule(opt, steps_per_epoch: int):
    """Same schedule as a traceable jnp function for use inside jit."""
    import jax.numpy as jnp

    lr0 = float(opt.lr)
    lrf = float(getattr(opt, "lr_final", lr0))
    n_epochs = int(opt.n_epochs)
    n_decay = int(opt.n_epochs_decay)
    policy = opt.lr_policy
    spe = max(1, int(steps_per_epoch))

    def sched(step):
        e = step // spe
        if policy == "step":
            return lr0 * (opt.lr_decay_gamma ** (e // opt.lr_decay_epochs))
        t = jnp.clip(
            (e + 1.0 - n_epochs + n_decay) / (n_decay + 1.0), 0.0, None)
        if policy == "linear":
            return lr0 * (1 - t) + lrf * t
        # exp (default)
        return jnp.exp(
            jnp.log(lr0) * (1 - t) + jnp.log(lrf) * t)

    return sched
