"""The vanilla NeRF training/eval system.

Capability parity with ``models/nerf_model.py`` (NeRFModel) of
cwchenwang/NeRF-SR, re-architected for TPU:

- one fully-jitted train step: batch gather (from a device-resident ray
  buffer) -> coarse/fine fused render -> losses -> grads -> adam update.
  The reference's two-level chunk_batch host loop
  (``models/nerf_model.py:201,245``) does not exist here.
- coarse+fine parameters live in one pytree optimized by a single adam,
  matching the single optimizer over both nets
  (``models/nerf_model.py:150-154``).
- data parallelism = sharding constraint on the ray batch over a 1-D mesh
  (see ``nerfsr_tpu.parallel.mesh``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfsr_tpu.core.rays import Rays
from nerfsr_tpu.core.encoding import posenc_channels
from nerfsr_tpu.models import register_model
from nerfsr_tpu.models.mlp import VanillaMLP
from nerfsr_tpu.models.render import RenderConfig, render_rays
from nerfsr_tpu.models.criterions import psnr as psnr_fn
from nerfsr_tpu.parallel.mesh import shard_batch
from nerfsr_tpu.utils.schedule import make_jax_lr_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _compute_dtype(precision: str):
    return jnp.bfloat16 if precision in ("bf16", "mixed") else jnp.float32


@register_model("nerf")
class NeRFSystem:
    """Orchestrates vanilla NeRF training (experiment type 'nerf')."""

    def __init__(self, opt):
        self.opt = opt
        self.render_cfg = RenderConfig(
            n_coarse=opt.N_coarse,
            n_importance=opt.N_importance,
            deg_pos=opt.deg_pos,
            deg_dir=opt.deg_dir,
            include_identity=not opt.no_xyz,
            log_scale=not opt.no_logscale,
            lindisp=opt.lindisp,
            white_bkgd=bool(opt.white_bkgd),
            noise_std=opt.noise_std,
            sigma_activation=opt.sigma_activation,
            use_dir=not opt.no_dir,
        )
        self.mlp = VanillaMLP(
            depth=opt.D,
            width=opt.W,
            skips=tuple(opt.skips),
            use_dir=not opt.no_dir,
            stop_grad=opt.stop_grad,
            dim_rgb=opt.dim_rgb,
            color_activation=opt.color_activation,
            init_type=opt.init_type,
            compute_dtype=_compute_dtype(opt.precision),
        )
        self.mesh = None          # set via .use_mesh()
        self.tx = None            # built in create_state
        self._steps_per_epoch = max(1, getattr(opt, "steps_per_epoch", 1) or 1)
        # loss/metric name lists (parity: models/nerf_model.py:98-101)
        self.train_loss_names = ["coarse_mse", "fine_mse", "coarse_psnr",
                                 "fine_psnr", "tot"]

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def use_mesh(self, mesh):
        self.mesh = mesh
        return self

    def init_params(self, key: jax.Array):
        """Initialize coarse+fine parameter pytrees."""
        c_pos = posenc_channels(self.opt.dim_pos, self.opt.deg_pos,
                                not self.opt.no_xyz)
        c_dir = posenc_channels(self.opt.dim_dir, self.opt.deg_dir,
                                not self.opt.no_xyz)
        xyz = jnp.zeros((1, 1, c_pos))
        drc = jnp.zeros((1, 1, c_dir)) if not self.opt.no_dir else None
        k1, k2 = jax.random.split(key)
        params = {
            "coarse": self.mlp.init(k1, xyz, drc),
            "fine": self.mlp.init(k2, xyz, drc),
        }
        if self.opt.N_importance <= 0:
            params.pop("fine")
        return params

    def create_state(self, key: jax.Array,
                     steps_per_epoch: Optional[int] = None) -> TrainState:
        if steps_per_epoch:
            self._steps_per_epoch = max(1, steps_per_epoch)
        params = self.init_params(key)
        self.tx = self._make_tx()
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    def _make_tx(self):
        opt = self.opt
        sched = make_jax_lr_schedule(opt, self._steps_per_epoch)
        chain = []
        if opt.grad_clip_val > 0:
            if opt.grad_clip_type == "norm":
                chain.append(optax.clip_by_global_norm(opt.grad_clip_val))
            else:
                chain.append(optax.clip(opt.grad_clip_val))
        chain.append(optax.scale_by_adam(b1=opt.beta1, b2=0.999))
        chain.append(optax.scale_by_schedule(lambda s: -sched(s)))
        return optax.chain(*chain)

    # ------------------------------------------------------------------
    # forward / loss
    # ------------------------------------------------------------------
    def render(self, params, rays: Rays, key, randomized: bool):
        return render_rays(
            self.mlp, params["coarse"], params.get("fine"), rays, key,
            self.render_cfg, randomized)

    def compute_losses(self, out: Dict[str, Any], batch: Dict[str, Any]):
        """MSE + PSNR losses (parity: ``models/nerf_model.py:253-311``).

        Patch-based depth-laplacian / VGG losses apply when patch_size
        gates allow (reference :276-304) — wired in via _extra_losses for
        subclasses / patch mode.
        """
        opt = self.opt
        rgbs = batch["rgbs"]
        losses = {}
        loss_tot = 0.0

        coarse_mse = jnp.mean((out["coarse_rgb"] - rgbs) ** 2)
        losses["coarse_mse"] = coarse_mse
        loss_tot = loss_tot + coarse_mse * opt.lambda_coarse_mse

        if "fine_rgb" in out:
            fine_mse = jnp.mean((out["fine_rgb"] - rgbs) ** 2)
            losses["fine_mse"] = fine_mse
            loss_tot = loss_tot + fine_mse * opt.lambda_fine_mse
        else:
            losses["fine_mse"] = jnp.zeros(())

        extra = self._extra_losses(out, batch)
        for name, (val, weight) in extra.items():
            losses[name] = val
            loss_tot = loss_tot + val * weight

        losses["coarse_psnr"] = jax.lax.stop_gradient(
            psnr_fn(out["coarse_rgb"], rgbs))
        if "fine_rgb" in out:
            losses["fine_psnr"] = jax.lax.stop_gradient(
                psnr_fn(out["fine_rgb"], rgbs))
        else:
            losses["fine_psnr"] = jnp.zeros(())
        losses["tot"] = loss_tot
        return loss_tot, losses

    def _extra_losses(self, out, batch):
        """Hook for subclasses (downX variance losses, patch losses)."""
        del out, batch
        return {}

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _batch_to_rays(self, batch) -> Rays:
        return Rays(
            origins=batch["origins"],
            directions=batch["directions"],
            near=batch["near"],
            far=batch["far"],
            viewdirs=batch.get("viewdirs", batch["directions"]),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch: Dict[str, Any],
                   key: jax.Array):
        """One fused optimization step over a host-provided ray batch."""
        step_key = jax.random.fold_in(key, state.step)
        return self._train_step_impl(state, batch, step_key)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step_from_buffer(self, state: TrainState, buffer, key):
        """Sample a ray batch from the device-resident buffer and step.

        ``buffer`` is a dict of (N_total, ...) arrays living in HBM; index
        sampling happens inside jit so a training step does zero
        host->device transfers (the reference re-uploads every batch from
        CPU DataLoader workers).
        """
        n_total = buffer["rgbs"].shape[0]
        step_key = jax.random.fold_in(key, state.step)
        idx_key, render_key = jax.random.split(step_key)
        idx = jax.random.randint(
            idx_key, (self.opt.batch_size,), 0, n_total)
        batch = jax.tree_util.tree_map(lambda x: x[idx], buffer)
        return self._train_step_impl(state, batch, render_key)

    def _loss_fn(self, params, batch, key):
        """Render + losses for one batch (overridable by subclasses)."""
        rays = self._batch_to_rays(batch)
        out = self.render(params, rays, key, randomized=True)
        return self.compute_losses(out, batch)

    def _train_step_impl(self, state, batch, step_key):
        batch = shard_batch(batch, self.mesh)

        (_, losses), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, batch, step_key)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, losses

    @functools.partial(jax.jit, static_argnums=0)
    def eval_chunk(self, params, batch):
        """Deterministic render of a fixed-size ray chunk (compiled once)."""
        rays = self._batch_to_rays(batch)
        out = self.render(params, rays, jax.random.PRNGKey(0),
                          randomized=False)
        keep = ["coarse_rgb", "coarse_depth", "coarse_opacity"]
        if "fine_rgb" in out:
            keep += ["fine_rgb", "fine_depth", "fine_opacity"]
        return {k: out[k] for k in keep}

    # ------------------------------------------------------------------
    # eval metrics / visuals (consumed by the engine loops)
    # ------------------------------------------------------------------
    def eval_metrics(self, out, sample):
        """PSNR dict for one rendered image (parity names:
        ``models/nerf_model.py:100``)."""
        import numpy as np
        gt = sample["rgbs"]
        m = {"coarse_psnr": float(psnr_fn(out["coarse_rgb"], gt))}
        m["fine_psnr"] = float(psnr_fn(out["fine_rgb"], gt)) \
            if "fine_rgb" in out else m["coarse_psnr"]
        return m

    def eval_visuals(self, out, sample, idx, with_gt, depth_bounds):
        """[pred | gt | depth] strips per level (parity:
        ``models/nerf_model.py:333-346`` calculate_vis)."""
        import numpy as np
        from nerfsr_tpu.utils.visualizer import Visualizee, depth2im

        w, h = self.opt.img_wh
        near, far = depth_bounds
        vis = []
        for level in ("coarse", "fine"):
            if f"{level}_rgb" not in out:
                continue
            img = out[f"{level}_rgb"].reshape(h, w, 3)
            depth = depth2im(out[f"{level}_depth"].reshape(h, w), near,
                             far).astype(np.float32) / 255.0
            parts = [img]
            if with_gt and sample.get("rgbs") is not None:
                parts.append(sample["rgbs"].reshape(h, w, 3))
            parts.append(depth)
            vis.append(Visualizee(
                "image", np.concatenate(parts, axis=1),
                name=f"{idx}-{level}", range=(0, 1)))
        return vis

    # ------------------------------------------------------------------
    # host-level eval (full images)
    # ------------------------------------------------------------------
    def render_image(self, params, rays_np: Dict[str, np.ndarray],
                     chunk: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Render H*W rays by host-chunking with a padded fixed shape.

        Static shapes keep one compiled executable for every chunk
        (SURVEY.md §7 'Ragged eval vs static shapes').
        """
        chunk = chunk or max(4096, self.opt.ray_chunk)
        n = rays_np["origins"].shape[0]
        outs = []
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            sl = {k: v[start:end] for k, v in rays_np.items()
                  if k != "rgbs"}
            pad = chunk - (end - start)
            if pad:
                sl = {k: np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in
                    sl.items()}
            out = self.eval_chunk(params, sl)
            out = jax.tree_util.tree_map(np.asarray, out)
            if pad:
                out = {k: v[: end - start] for k, v in out.items()}
            outs.append(out)
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
