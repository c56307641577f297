"""The NeRF-SR supersampling system (experiment type 'nerf_downX').

Capability parity with ``models/nerf_downX_model.py`` of
cwchenwang/NeRF-SR — the paper's core contribution. Each training item is
one LOW-RES pixel carrying its ``downscale^2`` HIGH-RES sub-rays; all
sub-rays render at HR and the HR predictions are averaged over the ds^2
axis to form the LR prediction supervised by the LR ground truth
(``comp_low_res_output``, reference :326-353). Optional sub-pixel color /
depth variance regularizers (:332-336, :349-353) and SISR supervision
(:364-367) are implemented as loss terms.

TPU notes: the (B, ds^2, C) grouped batch flattens to one (B*ds^2) ray
bundle — a single fused render per step; the subpixel mean is a free
reshape+reduce that XLA fuses into the loss.

The reference's auxiliary GAN patch training (``train_gan``, :572-594)
and TV patch regularizer (``regularize_patch``, :596-618) are not used
by any shipped script but are provided: ``gan_step`` (with the
image-gradient discriminator input of :550-570) and ``reg_patch_step``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from nerfsr_tpu.core.rays import Rays
from nerfsr_tpu.models import register_model
from nerfsr_tpu.models.criterions import psnr as psnr_fn
from nerfsr_tpu.models.nerf_system import NeRFSystem, TrainState
from nerfsr_tpu.parallel.mesh import shard_batch


def subpixel_mean(x, ds2):
    """(N*ds2, ...) -> (N, ...) mean over the ds^2 sub-pixel axis."""
    return jnp.mean(x.reshape((-1, ds2) + x.shape[1:]), axis=1)


def subpixel_var(x, ds2):
    """Sum over pixels/channels of the unbiased variance across the ds^2
    axis (parity with ``torch.var`` default unbiased=True, :332-336)."""
    g = x.reshape((-1, ds2) + x.shape[1:])
    return jnp.sum(jnp.var(g, axis=1, ddof=1))


@register_model("nerf_downX")
class NeRFDownXSystem(NeRFSystem):
    """Supersampling NeRF: HR rays, LR supervision."""

    def __init__(self, opt):
        super().__init__(opt)
        self.ds = opt.downscale
        self.ds2 = self.ds * self.ds
        self.train_loss_names = ["coarse_mse", "fine_mse", "coarse_psnr",
                                 "fine_psnr", "tot"]
        if opt.use_var_loss:
            self.train_loss_names += ["out_coarse_var", "out_fine_var"]
        if opt.use_depth_var_loss:
            self.train_loss_names += ["coarse_depth_var", "fine_depth_var"]

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _flat_rays(self, batch) -> Rays:
        """(B, ds^2, C) grouped fields -> flat (B*ds^2,) Rays. The dir
        embedding consumes rays_d itself (8-col rays; reference :286)."""
        flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
        return Rays(
            origins=flat(batch["origins"]),
            directions=flat(batch["directions"]),
            near=flat(batch["near"]),
            far=flat(batch["far"]),
            viewdirs=flat(batch.get("viewdirs", batch["directions"])),
        )

    def _loss_fn(self, params, batch, key, step=None):
        opt = self.opt
        ds2 = self.ds2
        rays = self._flat_rays(batch)
        out = self.render(params, rays, key,
                          randomized=bool(self.opt.randomized), step=step)

        lr_rgbs = batch["rgbs"]                   # (B, 3)
        losses: Dict[str, Any] = {}
        loss_tot = 0.0
        has_coarse = "coarse_rgb" in out          # absent in fast mode

        coarse_lr = None
        if has_coarse:
            coarse_lr = subpixel_mean(out["coarse_rgb"], ds2)
            coarse_mse = jnp.mean((coarse_lr - lr_rgbs) ** 2)
            losses["coarse_mse"] = coarse_mse
            loss_tot = loss_tot + coarse_mse * opt.lambda_coarse_mse

        fine_lr = None
        if "fine_rgb" in out:
            fine_lr = subpixel_mean(out["fine_rgb"], ds2)
            fine_mse = jnp.mean((fine_lr - lr_rgbs) ** 2)
            losses["fine_mse"] = fine_mse
            loss_tot = loss_tot + fine_mse * opt.lambda_fine_mse
        else:
            losses["fine_mse"] = jnp.zeros(())

        loss_tot = self._interlevel(out, losses, loss_tot)

        # sub-pixel color variance regularizer (reference :332-336)
        if opt.use_var_loss:
            cv = subpixel_var(out["coarse_rgb"], ds2) if has_coarse \
                else jnp.zeros(())
            fv = subpixel_var(out["fine_rgb"], ds2) if fine_lr is not None \
                else jnp.zeros(())
            losses["out_coarse_var"] = cv
            losses["out_fine_var"] = fv
            loss_tot = loss_tot + opt.lambda_coarse_var * cv \
                + opt.lambda_fine_var * fv

        # sub-pixel depth variance regularizer, far-normalized (:349-353)
        if opt.use_depth_var_loss:
            far = batch["far"].reshape(-1)[0]
            cdv = subpixel_var(out["coarse_depth"] / far, ds2) \
                if has_coarse else jnp.zeros(())
            fdv = subpixel_var(out["fine_depth"] / far, ds2) \
                if "fine_depth" in out else jnp.zeros(())
            losses["coarse_depth_var"] = cdv
            losses["fine_depth_var"] = fdv
            loss_tot = loss_tot + opt.lambda_coarse_depth_var * cdv \
                + opt.lambda_fine_depth_var * fdv

        # SISR supervision of the HR output (reference :364-367)
        if "rgbs_sr" in batch:
            sr = batch["rgbs_sr"].reshape(-1, batch["rgbs_sr"].shape[-1])
            c_sr = jnp.mean((out["coarse_rgb"] - sr) ** 2) if has_coarse \
                else jnp.zeros(())
            f_sr = jnp.mean((out["fine_rgb"] - sr) ** 2) \
                if "fine_rgb" in out else jnp.zeros(())
            losses["coarse_mse_sr"] = c_sr
            losses["fine_mse_sr"] = f_sr
            loss_tot = loss_tot + c_sr + f_sr

        if coarse_lr is not None:
            losses["coarse_psnr"] = jax.lax.stop_gradient(
                psnr_fn(coarse_lr, lr_rgbs))
        losses["fine_psnr"] = jax.lax.stop_gradient(
            psnr_fn(fine_lr, lr_rgbs)) if fine_lr is not None \
            else jnp.zeros(())

        # HR PSNR vs the HR ground truth when present (reference :386-388)
        if "rgbs_ori" in batch:
            hr = batch["rgbs_ori"].reshape(-1, 3)
            if has_coarse:
                losses["coarse_psnr_ori"] = jax.lax.stop_gradient(
                    psnr_fn(out["coarse_rgb"], hr))
            if "fine_rgb" in out:
                losses["fine_psnr_ori"] = jax.lax.stop_gradient(
                    psnr_fn(out["fine_rgb"], hr))

        losses["tot"] = loss_tot
        return loss_tot, losses

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def reg_patch_step(self, state: TrainState, patch_batch, key):
        """TV regularization step on rendered HR patches (capability of
        the reference's ``regularize_patch``, :596-618): render a
        contiguous patch's HR rays and minimize total variation."""
        from nerfsr_tpu.models.criterions import tv_loss

        patch_batch = shard_batch(patch_batch, self.mesh)
        step_key = jax.random.fold_in(key, state.step)
        side = self.opt.reg_patch_len * self.ds

        plen_lr, ds = self.opt.reg_patch_len, self.ds

        def loss_fn(params):
            rays = self._flat_rays(patch_batch)
            out = self.render(params, rays, step_key,
                              randomized=bool(self.opt.randomized),
                              step=state.step)
            loss = 0.0
            for level in ("coarse_rgb", "fine_rgb"):
                if level in out:
                    # grouped flat rows -> HR SPATIAL order before TV
                    # (parity: the reference rearranges '(h1 w1)(s1 s2)
                    # c -> (h1 s1)(w1 s2) c' BEFORE rendering,
                    # llff_downX_dataset.py:436-437 — TV on the grouped
                    # permutation would penalize sub-pixel layout, not
                    # image smoothness)
                    img = self._ungroup(
                        out[level].reshape(plen_lr * plen_lr,
                                           ds * ds, -1),
                        hw=(side, side)).reshape(1, side, side, -1)
                    loss = loss + tv_loss(img)
            loss = loss * self.opt.reg_lambda_tv
            return loss, {"patch": loss}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), losses

    # ------------------------------------------------------------------
    # adversarial patch training (--with_netD; reference train_gan
    # :572-594 + backward_D/G :518-548, unused by shipped scripts)
    # ------------------------------------------------------------------
    def create_gan_state(self, key):
        from nerfsr_tpu.models.networks import create_discriminator
        import optax

        self.netD = create_discriminator(self.opt)
        variables = self.netD.init(
            key, jnp.zeros((1, self.opt.patch_len, self.opt.patch_len, 3)))
        self.txD = optax.adam(self.opt.gan_lr, b1=self.opt.beta1)
        return {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": self.txD.init(variables["params"])}

    def _img_grad_mag(self, img):
        """Gradient-magnitude D input (--use_grad; reference img_grad
        :550-570): sqrt(dx^2 + dy^2) of forward differences."""
        from nerfsr_tpu.models.criterions import image_gradients
        dy, dx = image_gradients(img)
        return jnp.sqrt(dx ** 2 + dy ** 2 + 1e-12)

    @functools.partial(jax.jit, static_argnums=0)
    def gan_step(self, state: TrainState, d_state, patch, key):
        """Render one HR patch and take a D step + a lambda_gan-weighted
        G step (the L1 term is omitted — 'already done by nerf',
        reference :545-547). patch: HR (P, P, C) ray fields + rgbs.

        --gan_mode wgangp additionally applies the standard gradient
        penalty to the D loss (the reference's backward_D, :518-533,
        omits it — which makes its wgangp objective unbounded; fixed
        here rather than reproduced)."""
        step_key = jax.random.fold_in(key, state.step)
        flat = {k: v.reshape(-1, v.shape[-1]) for k, v in patch.items()}
        rays = self._batch_to_rays(flat)
        real = patch["rgbs"][None]                      # (1, P, P, 3)
        return self._gan_update_impl(state, d_state, rays, real,
                                     step_key)

    def _gan_update_impl(self, state, d_state, rays, real, step_key):
        """Shared D+G adversarial update over one patch's rays (called
        from the single-dispatch ``gan_step`` and from inside
        ``train_steps_scan_gan``'s compiled loop)."""
        import optax
        from nerfsr_tpu.models.criterions import (gan_loss,
                                                  wgan_gradient_penalty)

        opt = self.opt
        plen = opt.patch_len

        def render_patch(params):
            # step threads --prop_pad_anneal into the patch render;
            # without it the pad evaluates at its FINAL value from
            # step 0 (the zero-floor regime the resample death-spirals
            # in during early training)
            out = self.render(params, rays, step_key,
                              randomized=bool(self.opt.randomized),
                              step=state.step)
            return out["fine_rgb"].reshape(1, plen, plen, 3)

        def d_in(x):
            return self._img_grad_mag(x) if opt.use_grad else x

        fake = render_patch(state.params)
        fake_sg = jax.lax.stop_gradient(fake)

        # refresh the spectral-norm power-iteration vectors ONCE per D
        # update (torch parity: u/v advance on every D forward, outside
        # the gradient) — without this the u/v frozen at init stop
        # approximating the leading singular vectors as D trains and
        # the Lipschitz normalization silently degrades
        _, d_mut = self.netD.apply(
            {"params": d_state["params"],
             "batch_stats": d_state["batch_stats"]},
            self._img_grad_mag(fake_sg) if opt.use_grad else fake_sg,
            update_stats=True, mutable=["batch_stats"])
        d_stats = jax.lax.stop_gradient(d_mut["batch_stats"])

        d_vars = lambda pd: {"params": pd, "batch_stats": d_stats}

        def d_loss_fn(pd):
            pf = self.netD.apply(d_vars(pd), d_in(fake_sg))
            pr = self.netD.apply(d_vars(pd), d_in(real))
            lf = gan_loss(pf, False, opt.gan_mode)
            lr_ = gan_loss(pr, True, opt.gan_mode)
            loss = 0.5 * (lf + lr_)
            if opt.gan_mode == "wgangp":
                # the Wasserstein objective is unbounded without the
                # gradient penalty on real/fake interpolates
                loss = loss + wgan_gradient_penalty(
                    lambda x: self.netD.apply(d_vars(pd), d_in(x)),
                    jax.random.fold_in(step_key, 7), real, fake_sg)
            return loss, (lr_, lf)

        (_, (d_real, d_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state["params"])
        d_updates, d_opt = self.txD.update(d_grads, d_state["opt_state"],
                                           d_state["params"])
        d_params = optax.apply_updates(d_state["params"], d_updates)

        def g_loss_fn(params):
            fake_g = render_patch(params)
            pf = self.netD.apply(d_vars(d_params), d_in(fake_g))
            return gan_loss(pf, True, opt.gan_mode) * opt.lambda_gan

        g_gan, g_grads = jax.value_and_grad(g_loss_fn)(state.params)
        g_updates, opt_state = self.tx.update(g_grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, g_updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"params": d_params,
                           "batch_stats": d_stats,
                           "opt_state": d_opt}, \
            {"G_GAN": g_gan, "D_real": d_real, "D_fake": d_fake}

    def _patch_rays_at(self, gan_bufs, geom, view_i, r0, c0, side):
        """HR-spatial-order rays of a ``side x side`` patch at HR pixel
        (r0, c0) of view ``view_i``, built ON DEVICE from the uploaded
        raygen buffers (``LLFFDownXDataset.gan_raygen_buffers``):
        dynamic-slice the (h, w, 3) camera-space direction grid, rotate
        by the view's pose, NDC-warp per the static ``geom`` — the same
        math as the host patch samplers, without per-call host work or
        upload. Row k*side+j is HR pixel (r0+k, c0+j) (scan order, so a
        rendered patch reshapes straight to (side, side))."""
        from nerfsr_tpu.core.rays import get_rays, make_rays, ndc_rays

        d = jax.lax.dynamic_slice(gan_bufs["dirs_hw"], (r0, c0, 0),
                                  (side, side, 3)).reshape(-1, 3)
        c2w = jax.lax.dynamic_index_in_dim(gan_bufs["poses"], view_i,
                                           keepdims=False)
        ro, rd = get_rays(d, c2w)
        if geom[0] == "ndc":
            _, h, w, focal, near, far = geom
            ro, rd = ndc_rays(h, w, focal, 1.0, ro, rd)
        else:
            _, near, far = geom
        return make_rays(ro, rd, near, far, rd)

    def _gan_patch_at(self, gan_bufs, geom, view_i, r0_lr, c0_lr):
        """Adversarial patch: ``_patch_rays_at`` rays (HR order, like
        the host ``gan_patch``'s ungrouped fields) + the 'real' HR
        pixels at the same location."""
        plen = self.opt.patch_len
        r0 = r0_lr * self.ds
        c0 = c0_lr * self.ds
        rays = self._patch_rays_at(gan_bufs, geom, view_i, r0, c0, plen)
        ri = jax.lax.dynamic_index_in_dim(gan_bufs["real_idx"], view_i,
                                          keepdims=False)
        real = jax.lax.dynamic_slice(
            gan_bufs["reals"], (ri, r0, c0, 0), (1, plen, plen, 3))
        return rays, real

    def _gan_sample_patch(self, gan_bufs, geom, key):
        """Random (view, LR-aligned location) -> patch rays + real,
        mirroring the host sampler's domain (``gan_patch``: view from
        the usable pool, r0/c0 with the reference's EXCLUSIVE upper
        bound — the last valid position is never drawn,
        llff_downX_dataset.py:443-447; max(1, .) guards the
        patch-spans-image degenerate case)."""
        plen_lr = self.opt.patch_len // self.ds
        h, w = gan_bufs["dirs_hw"].shape[:2]
        hl, wl = h // self.ds, w // self.ds
        kv, kr, kc = jax.random.split(key, 3)
        view_i = jax.random.randint(kv, (), 0,
                                    gan_bufs["poses"].shape[0])
        r0_lr = jax.random.randint(kr, (), 0, max(1, hl - plen_lr))
        c0_lr = jax.random.randint(kc, (), 0, max(1, wl - plen_lr))
        return self._gan_patch_at(gan_bufs, geom, view_i, r0_lr, c0_lr)

    def _reg_update_impl(self, state, rays, step_key):
        """TV-regularization G update over one device-raygen HR patch
        (same objective as ``reg_patch_step``; the rays are HR spatial
        order, so the render reshapes straight to (side, side))."""
        import optax
        from nerfsr_tpu.models.criterions import tv_loss

        side = self.opt.reg_patch_len * self.ds

        def loss_fn(params):
            out = self.render(params, rays, step_key,
                              randomized=bool(self.opt.randomized),
                              step=state.step)
            loss = 0.0
            for level in ("coarse_rgb", "fine_rgb"):
                if level in out:
                    loss = loss + tv_loss(
                        out[level].reshape(1, side, side, -1))
            loss = loss * self.opt.reg_lambda_tv
            return loss, {"patch": loss}

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), losses

    def _reg_sample_rays(self, gan_bufs, geom, key):
        """Random reg-patch location -> HR-spatial rays, mirroring the
        host ``patch_buffer`` sampler's domain (row/col uniform over
        hl - plen + 1 LR positions, ``data/llff_downx.py``)."""
        plen_lr = self.opt.reg_patch_len
        h, w = gan_bufs["dirs_hw"].shape[:2]
        hl, wl = h // self.ds, w // self.ds
        kv, kr, kc = jax.random.split(key, 3)
        view_i = jax.random.randint(kv, (), 0,
                                    gan_bufs["poses"].shape[0])
        r0_lr = jax.random.randint(kr, (), 0, hl - plen_lr + 1)
        c0_lr = jax.random.randint(kc, (), 0, wl - plen_lr + 1)
        return self._patch_rays_at(gan_bufs, geom, view_i,
                                   r0_lr * self.ds, c0_lr * self.ds,
                                   plen_lr * self.ds)

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 9),
                       donate_argnums=(1, 2))
    def train_steps_scan_gan(self, state: TrainState, d_state, buffer,
                             gan_bufs, n_steps: int, geom, key, it0,
                             with_reg: bool = False):
        """``n_steps`` buffer-sampled main steps with the adversarial
        D+G update folded INTO the compiled scan at the --gan_iter
        cadence (``lax.cond``; the engine's single-dispatch form pays a
        ~30-48 ms host round trip + a host-built patch upload every
        firing — at the primary's 1.2 ms/step a gan_iter=10 cadence
        would otherwise dominate wall time). Patch rays are generated
        on device (``_gan_sample_patch``), so the scan needs zero
        per-step host traffic. ``with_reg=True`` additionally folds the
        --reg_patch TV update in at the --reg_patch_freq cadence.

        Cadence parity with the engine loop: the update fires after the
        main step that brings iteration ``it0 + i + 1`` to a multiple
        of gan_iter, where the engine passes the GLOBAL step as
        ``it0`` so the phase is stable across epoch boundaries and
        matches its single-dispatch fallback gate (reference
        ``train.py`` gan hook: every --gan_iter total iterations).
        Returns (state, d_state, losses)
        where losses carry the LAST main-step losses + the most recent
        GAN/reg losses (zeros until the first firing)."""
        n_total = buffer["rgbs"].shape[0]
        gan_iter = max(1, int(self.opt.gan_iter))
        reg_freq = max(1, int(getattr(self.opt, "reg_patch_freq", 1)))

        def body(carry, i):
            state, d_state, gl, rl = carry
            step_key = jax.random.fold_in(key, state.step)
            idx_key, render_key = jax.random.split(step_key)
            idx = jax.random.randint(
                idx_key, (self.opt.batch_size,), 0, n_total)
            batch = jax.tree_util.tree_map(lambda x: x[idx], buffer)
            state, losses = self._train_step_impl(state, batch,
                                                  render_key)
            it = it0 + i + 1

            def fire_gan(args):
                st, ds_, _ = args
                gk = jax.random.fold_in(
                    jax.random.fold_in(key, st.step), 101)
                rays, real = self._gan_sample_patch(gan_bufs, geom, gk)
                return self._gan_update_impl(st, ds_, rays, real, gk)

            state, d_state, gl = jax.lax.cond(
                (it % gan_iter) == 0, fire_gan, lambda args: args,
                (state, d_state, gl))
            if with_reg:
                def fire_reg(args):
                    st, _ = args
                    rk = jax.random.fold_in(
                        jax.random.fold_in(key, st.step), 202)
                    rays = self._reg_sample_rays(gan_bufs, geom, rk)
                    return self._reg_update_impl(st, rays, rk)

                state, rl = jax.lax.cond(
                    (it % reg_freq) == 0, fire_reg, lambda args: args,
                    (state, rl))
            return (state, d_state, gl, rl), losses

        gl0 = {"G_GAN": jnp.float32(0.0), "D_real": jnp.float32(0.0),
               "D_fake": jnp.float32(0.0)}
        rl0 = {"patch": jnp.float32(0.0)}
        (state, d_state, gl, rl), losses = jax.lax.scan(
            body, (state, d_state, gl0, rl0), jnp.arange(n_steps))
        losses = jax.tree_util.tree_map(lambda x: x[-1], losses)
        extra = {**gl, **rl} if with_reg else gl
        return state, d_state, {**losses, **extra}

    @functools.partial(jax.jit, static_argnums=(0, 4, 5),
                       donate_argnums=1)
    def train_steps_scan_reg(self, state: TrainState, buffer, gan_bufs,
                             n_steps: int, geom, key, it0):
        """``n_steps`` buffer-sampled main steps with the --reg_patch TV
        update folded into the scan at --reg_patch_freq (the GAN-less
        sibling of ``train_steps_scan_gan``; the single-dispatch
        ``reg_patch_step`` additionally pays a full host
        ``_pose_rays_grouped`` build per firing)."""
        n_total = buffer["rgbs"].shape[0]
        reg_freq = max(1, int(getattr(self.opt, "reg_patch_freq", 1)))

        def body(carry, i):
            state, rl = carry
            step_key = jax.random.fold_in(key, state.step)
            idx_key, render_key = jax.random.split(step_key)
            idx = jax.random.randint(
                idx_key, (self.opt.batch_size,), 0, n_total)
            batch = jax.tree_util.tree_map(lambda x: x[idx], buffer)
            state, losses = self._train_step_impl(state, batch,
                                                  render_key)

            def fire_reg(args):
                st, _ = args
                rk = jax.random.fold_in(
                    jax.random.fold_in(key, st.step), 202)
                rays = self._reg_sample_rays(gan_bufs, geom, rk)
                return self._reg_update_impl(st, rays, rk)

            state, rl = jax.lax.cond(
                ((it0 + i + 1) % reg_freq) == 0, fire_reg,
                lambda args: args, (state, rl))
            return (state, rl), losses

        rl0 = {"patch": jnp.float32(0.0)}
        (state, rl), losses = jax.lax.scan(
            body, (state, rl0), jnp.arange(n_steps))
        losses = jax.tree_util.tree_map(lambda x: x[-1], losses)
        return state, {**losses, **rl}

    # ------------------------------------------------------------------
    # evaluation: render HR, report both LR (subpixel mean) and HR (ori)
    # ------------------------------------------------------------------
    def render_image(self, params, rays_np, chunk=None):
        """Render a full eval image from GROUPED rays (N_lr, ds^2, ...).

        Returns both LR fields (subpixel-averaged) and ``*_ori`` HR fields
        ungrouped to (H, W) scan order via ``unflatten_reshape`` parity
        (reference :410-416) — flattened to (H*W, ...) rows.
        """
        flat = {k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
                for k, v in rays_np.items()
                if k in ("origins", "directions", "viewdirs", "near", "far")}
        out = super().render_image(params, flat, chunk)
        return self._post_grouped(out)

    def _post_grouped(self, out):
        """Flat grouped-order render rows -> LR (subpixel mean) + HR
        ``*_ori`` (ungrouped to scan order) fields. Display-quantized
        uint8 rgb (``quantize_rgb`` readback) keeps the HR ``_ori``
        field uint8 (PNG-identical bytes) and computes the LR subpixel
        mean in f32/[0,1] from the quantized values (visual-strip use
        only; the mean of quantized subpixels differs from the
        quantized mean by <= 0.5/255 per channel)."""
        ds2 = self.ds2
        result = {}
        n_lr = next(iter(out.values())).shape[0] // ds2
        for k, v in out.items():
            grouped = v.reshape((n_lr, ds2) + v.shape[1:])
            if grouped.dtype == np.uint8:
                result[k] = grouped.astype(np.float32).mean(axis=1) / 255.0
            else:
                result[k] = grouped.mean(axis=1)
            result[k + "_ori"] = self._ungroup(grouped)
        return result

    def _postprocess_eval(self, flat):
        # pipelined render_eval_many parity with render_eval below
        return self._post_grouped(flat)

    def render_eval(self, params, dataset, idx, sample=None):
        """Device-raygen eval for grouped (downX) datasets: their
        ``eval_dirs`` are pre-permuted to the grouped flatten order, so
        the flat render rows regroup exactly like ``render_image``'s."""
        spec_fn = getattr(dataset, "eval_raygen_spec", None)
        if spec_fn is None:
            if sample is None:
                sample = dataset.image_rays(idx)
            return self.render_image(params, sample)
        flat_out = self.render_pose(params, spec_fn(idx),
                                    dataset.eval_dirs())
        return self._post_grouped(flat_out)

    def _metric_gt_pack(self, sample):
        """Grouped gt: LR pixels + (when supervised HR exists) the HR
        image ungrouped to scan order on the host at upload time."""
        if sample.get("rgbs") is None:
            return None
        pack = {"gt_lr": np.asarray(sample["rgbs"], np.float32)}
        if "rgbs_ori" in sample:
            pack["gt_hr"] = np.asarray(
                self._ungroup(np.asarray(sample["rgbs_ori"])), np.float32)
        return pack

    def _metrics_device(self, flat_out, gt_pack):
        """In-jit twin of ``eval_metrics``: flat grouped-order HR render
        rows -> LR (subpixel mean) PSNR + HR ``_ori`` PSNR/SSIM."""
        from nerfsr_tpu.models.criterions import psnr as psnr_fn
        from nerfsr_tpu.models.criterions import ssim as ssim_fn

        gt_lr = gt_pack["gt_lr"]
        n_lr = gt_lr.shape[0]
        ds2 = self.ds2
        lr, hr = {}, {}
        for k, v in flat_out.items():
            grouped = v[:n_lr * ds2].reshape((n_lr, ds2) + v.shape[1:])
            lr[k] = grouped.mean(axis=1)
            hr[k] = self._ungroup(grouped)
        m = {}
        if "coarse_rgb" in lr:  # absent in --fast_sampling mode
            m["coarse_psnr"] = psnr_fn(lr["coarse_rgb"], gt_lr)
        m["fine_psnr"] = psnr_fn(lr["fine_rgb"], gt_lr) \
            if "fine_rgb" in lr else m["coarse_psnr"]
        if "gt_hr" in gt_pack:
            gt_hr = gt_pack["gt_hr"]
            if "coarse_rgb" in hr:
                m["coarse_psnr_ori"] = psnr_fn(hr["coarse_rgb"], gt_hr)
            if "fine_rgb" in hr:
                m["fine_psnr_ori"] = psnr_fn(hr["fine_rgb"], gt_hr)
                w, h = self.opt.img_wh
                m["fine_ssim_ori"] = ssim_fn(
                    hr["fine_rgb"].reshape(h, w, 3),
                    gt_hr.reshape(h, w, 3))
        return m

    def eval_metrics(self, out, sample):
        from nerfsr_tpu.models.criterions import ssim as ssim_fn

        m = {}
        if "coarse_rgb" in out:  # absent in --fast_sampling mode
            m["coarse_psnr"] = float(psnr_fn(out["coarse_rgb"],
                                             sample["rgbs"]))
        m["fine_psnr"] = float(psnr_fn(out["fine_rgb"], sample["rgbs"])) \
            if "fine_rgb" in out else m["coarse_psnr"]
        if "rgbs_ori" in sample:
            # _ori outputs are HR scan order; gt is grouped -> ungroup
            hr = self._ungroup(sample["rgbs_ori"])
            if "coarse_rgb_ori" in out:
                m["coarse_psnr_ori"] = float(psnr_fn(
                    out["coarse_rgb_ori"], hr))
            if "fine_rgb_ori" in out:
                m["fine_psnr_ori"] = float(psnr_fn(
                    out["fine_rgb_ori"], hr))
                w, h = self.opt.img_wh
                m["fine_ssim_ori"] = float(ssim_fn(
                    jnp.asarray(out["fine_rgb_ori"].reshape(h, w, 3)),
                    jnp.asarray(hr.reshape(h, w, 3))))
        return m

    def eval_visuals(self, out, sample, idx, with_gt, depth_bounds):
        """LR strips, HR '-ori' strips, and the depth matrices
        ``{i}-{level}-depth[-ori].npz`` consumed by warp.py / the refine
        dataset (parity: reference :621-669 test + :419-451
        calculate_vis)."""
        from nerfsr_tpu.utils.visualizer import Visualizee, depth2im

        w, h = self.opt.img_wh
        wl, hl = w // self.ds, h // self.ds
        near, far = depth_bounds
        vis = []
        for level in ("coarse", "fine"):
            if f"{level}_rgb" not in out:
                continue
            # LR strip
            img = out[f"{level}_rgb"].reshape(hl, wl, 3)
            depth = depth2im(out[f"{level}_depth"].reshape(hl, wl), near,
                             far).astype(np.float32) / 255.0
            parts = [img]
            if with_gt and sample.get("rgbs") is not None:
                parts.append(sample["rgbs"].reshape(hl, wl, 3))
            parts.append(depth)
            vis.append(Visualizee(
                "image", self._vis_strip(parts, rng=(0, 1)),
                name=f"{idx}-{level}", range=(0, 1)))
            # HR (-ori) strip — `{i}-fine-ori.png` feeds the refinement
            # stage (reference :655-661)
            img_o = out[f"{level}_rgb_ori"].reshape(h, w, 3)
            depth_o = depth2im(out[f"{level}_depth_ori"].reshape(h, w),
                               near, far).astype(np.float32) / 255.0
            parts = [img_o]
            if with_gt and sample.get("rgbs_ori") is not None:
                parts.append(self._ungroup(
                    sample["rgbs_ori"]).reshape(h, w, 3))
            parts.append(depth_o)
            vis.append(Visualizee(
                "image", self._vis_strip(parts, rng=(0, 1)),
                name=f"{idx}-{level}-ori", range=(0, 1)))
            # depth matrices (npz + colormap png)
            vis.append(Visualizee(
                "matrix", out[f"{level}_depth"].reshape(hl, wl),
                name=f"{idx}-{level}-depth", range=(near, far)))
            vis.append(Visualizee(
                "matrix", out[f"{level}_depth_ori"].reshape(h, w),
                name=f"{idx}-{level}-depth-ori", range=(near, far)))
        return vis

    def _ungroup(self, grouped, hw=None):
        """(N_lr, ds^2, ...) -> (H*W, ...) HR scan order (parity:
        unflatten_reshape einops '(h1 w1)(s1 s2) c -> (h1 s1)(w1 s2) c').
        Works on numpy AND traced jax arrays (the device metric path
        ungroups in-jit). ``hw`` overrides the full-image size for
        patch-shaped grouped blocks (reg_patch TV)."""
        w, h = hw if hw is not None else self.opt.img_wh
        ds = self.ds
        h1, w1 = h // ds, w // ds
        tail = grouped.shape[2:]
        x = grouped.reshape((h1, w1, ds, ds) + tail)
        # moveaxis(2, 1): (h1, ds, w1, ds, ...)
        x = x.transpose((0, 2, 1, 3) + tuple(range(4, x.ndim)))
        return x.reshape((h * w,) + tail)
