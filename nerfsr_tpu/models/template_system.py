"""Toy regression system (x -> x^2).

Smoke-test scaffold with the same role as ``models/template_model.py`` of
the reference: validates the config / training-loop / checkpoint plumbing
with a 2-layer MLP and no real data.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerfsr_tpu.models import register_model
from nerfsr_tpu.utils.schedule import make_jax_lr_schedule


class _TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(64)(x))
        return nn.Dense(1)(x)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@register_model("template")
class TemplateSystem:
    def __init__(self, opt):
        self.opt = opt
        self.net = _TinyMLP()
        self.tx = None
        self._steps_per_epoch = 1
        self.train_loss_names = ["mse", "tot"]

    def use_mesh(self, mesh):
        self.mesh = mesh
        return self

    def create_state(self, key, steps_per_epoch=None):
        if steps_per_epoch:
            self._steps_per_epoch = steps_per_epoch
        params = self.net.init(key, jnp.zeros((1, 1)))
        sched = make_jax_lr_schedule(self.opt, self._steps_per_epoch)
        self.tx = optax.chain(
            optax.scale_by_adam(b1=self.opt.beta1),
            optax.scale_by_schedule(lambda s: -sched(s)))
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, key):
        del key

        def loss_fn(p):
            pred = self.net.apply(p, batch["x"])
            mse = jnp.mean((pred - batch["y"]) ** 2)
            return mse, {"mse": mse, "tot": mse}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), losses

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_from_buffer(self, state, buffer, key):
        idx = jax.random.randint(
            jax.random.fold_in(key, state.step),
            (min(self.opt.batch_size, 256),), 0, buffer["x"].shape[0])
        batch = jax.tree_util.tree_map(lambda a: a[idx], buffer)
        return self.train_step(state, batch, key)
