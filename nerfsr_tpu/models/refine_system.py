"""Patch-refinement system (experiment type 'refine').

Capability parity with ``models/refine_model.py`` of cwchenwang/NeRF-SR:
a CNN refines NeRF-SR synthesized patches using nearby reference-view
patches. ``--refine_network unetgenerator`` concatenates sr + ref patches
channel-wise (:95-97); ``maxpoolingmodel`` passes them separately
(:98-99). Losses mse/l1/vgg/grad gated by ``--refine_with_*`` flags
(:151-168) with the reference's lambda defaults; PSNR of input vs refined
logged. ``test`` tiles each image into patches, refines, stitches via
start_locs and reports SSIM (:205-232).

The optional GAN mode (``--refine_as_gan``, :102-139; lsgan + L1*100,
pix2pix-style, not used by any shipped script) is provided via
``gan_steps`` below with an NLayerDiscriminator.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfsr_tpu.models import register_model
from nerfsr_tpu.models.criterions import (VGGPerceptualLoss, gradient_loss,
                                          l1 as l1_loss, psnr as psnr_fn,
                                          ssim as ssim_fn)
from nerfsr_tpu.models.networks import MaxPoolingModel, UnetGenerator
from nerfsr_tpu.parallel.mesh import shard_batch
from nerfsr_tpu.utils.schedule import make_jax_lr_schedule


class RefineState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@register_model("refine")
class RefineSystem:
    def __init__(self, opt):
        self.opt = opt
        if opt.refine_network == "unetgenerator":
            # --ngf/--output_nc/--norm flow through (reference
            # UnetGenerator signature, models/networks.py:346-352);
            # num_downs=6 is the reference's hard default.
            self.net = UnetGenerator(
                output_nc=getattr(opt, "output_nc", 3),
                ngf=getattr(opt, "ngf", 64),
                num_downs=getattr(opt, "num_downs", 6),
                norm=getattr(opt, "norm", "batch"),
                learn_residual=opt.learn_residual)
        elif opt.refine_network == "maxpoolingmodel":
            # --not_use_ref selects the _NoPooling decoder (reference
            # Model_VNPCAT_Decoder_NoPooling, models/networks.py:786-945)
            self.net = MaxPoolingModel(
                use_ref=not getattr(opt, "not_use_ref", False))
        else:
            raise KeyError(f"unknown refine network {opt.refine_network}")
        self.is_unet = opt.refine_network == "unetgenerator"
        if self.is_unet:
            # --input_nc must describe the stacked sr+refs input
            # (reference default 27 = 3 + 8 ref patches x 3,
            # models/networks.py:351-352); flax convs infer the channel
            # count from data, so a mismatch would silently diverge from
            # the requested architecture — fail loudly instead.
            expect = 3 * (1 + opt.num_ref_patches)
            got = getattr(opt, "input_nc", expect)
            if got not in (expect, 27):  # 27 = untouched default
                raise ValueError(
                    f"--input_nc {got} != 3*(1+num_ref_patches) = "
                    f"{expect}; adjust --num_ref_patches instead")
        self.mesh = None
        self.tx = None
        self._steps_per_epoch = 1
        self.vgg = VGGPerceptualLoss(
            getattr(opt, "vgg_weights", None)) \
            if opt.refine_with_vgg else None
        self.train_loss_names = ["mse", "tot"]
        for flag, name in (("refine_with_vgg", "vgg"),
                           ("refine_with_l1", "l1"),
                           ("refine_with_grad", "grad")):
            if getattr(opt, flag):
                self.train_loss_names.append(name)

    def use_mesh(self, mesh):
        self.mesh = mesh
        return self

    # ------------------------------------------------------------------
    @staticmethod
    def _stack_unet_input(sr, refs):
        """sr (N,P,P,3) + refs (N,K,P,P,3) -> channel-stacked UNet input
        (N,P,P,3+3K) — the ONE place the ref-patch packing order lives
        (init and every apply share it; a divergence would silently
        train on a different channel ordering than eval uses)."""
        n, k, h, w, c = refs.shape
        return jnp.concatenate(
            [sr, refs.transpose(0, 2, 3, 1, 4).reshape(n, h, w, k * c)],
            axis=-1)

    def _apply(self, variables, sr, refs, train):
        """Dispatch by network type (reference forward, :94-99)."""
        if self.is_unet:
            return self.net.apply(variables,
                                  self._stack_unet_input(sr, refs),
                                  train=train,
                                  mutable=["batch_stats"] if train else
                                  False)
        return self.net.apply(variables, sr, refs, train=train,
                              mutable=["batch_stats"] if train else False)

    def create_state(self, key, steps_per_epoch=None):
        if steps_per_epoch:
            self._steps_per_epoch = steps_per_epoch
        opt = self.opt
        plen = opt.patch_len
        k = opt.num_ref_patches
        sr = jnp.zeros((1, plen, plen, 3))
        refs = jnp.zeros((1, k, plen, plen, 3))
        if self.is_unet:
            variables = self.net.init(
                key, self._stack_unet_input(sr, refs), train=False)
        else:
            variables = self.net.init(key, sr, refs, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        sched = make_jax_lr_schedule(opt, self._steps_per_epoch)
        self.tx = optax.chain(
            optax.scale_by_adam(b1=opt.beta1, b2=0.999),
            optax.scale_by_schedule(lambda s: -sched(s)))
        return RefineState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=self.tx.init(params))

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: RefineState, batch, key):
        del key
        return self._train_step_impl(state, batch)

    def _train_step_impl(self, state: RefineState, batch):
        opt = self.opt
        batch = shard_batch(batch, self.mesh)

        def loss_fn(params):
            pred, mutated = self._apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["sr_patch"], batch["ref_patches"], train=True)
            gt = batch["gt_patch"]
            losses = {}
            tot = 0.0
            if opt.refine_with_mse:
                mse = jnp.mean((pred - gt) ** 2) * opt.lambda_refine_mse
                losses["mse"] = mse
                tot = tot + mse
            else:
                losses["mse"] = jnp.mean((pred - gt) ** 2)
            if opt.refine_with_l1:
                l1 = l1_loss(pred, gt) * opt.lambda_refine_l1
                losses["l1"] = l1
                tot = tot + l1
            if opt.refine_with_grad:
                g = gradient_loss(pred, gt) * opt.lambda_refine_grad
                losses["grad"] = g
                tot = tot + g
            if self.vgg is not None:
                v = self.vgg(pred, gt) * opt.lambda_refine_vgg
                losses["vgg"] = v
                tot = tot + v
            losses["tot"] = tot
            losses["psnr_input"] = jax.lax.stop_gradient(
                psnr_fn(batch["sr_patch"], gt))
            losses["psnr_refine"] = jax.lax.stop_gradient(
                psnr_fn(pred, gt))
            return tot, (losses, mutated["batch_stats"])

        (_, (losses, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return RefineState(step=state.step + 1, params=params,
                           batch_stats=batch_stats,
                           opt_state=opt_state), losses

    def train_step_from_buffer(self, state, dataset, key):
        """Host-sampled patch batch -> jitted step (the patch sampler is
        cheap numpy cropping; the CNN step dominates)."""
        batch = dataset.sample_train_batch(self.opt.batch_size)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        return self.train_step(state, batch, key)

    def _sample_patch_batch(self, buffers, key):
        """In-jit port of ``LLFFRefineDataset.sample_train_batch``
        (``data/refine.py:169-196``; reference ``llff_refine_dataset.py:
        214-238``): sr/gt patch at a bbox-constrained random location of
        a random augmented view + ``num_ref_patches`` nearby patches of
        the unwarped reference view. The image stacks live in HBM
        (``dataset.device_buffers()``); patch cuts are batched
        ``dynamic_slice``s, so a train step consumes ZERO per-step
        host->device traffic. RNG parity with the numpy sampler is not
        bit-exact (different streams) — training stochasticity only."""
        opt = self.opt
        plen = int(opt.patch_len)
        n_aug = buffers["sr_imgs"].shape[0]
        off = int(opt.ref_offset)
        k_ref = int(opt.num_ref_patches)

        def rand_between(key, lo, hi):
            # numpy parity: rng.randint(lo, max(lo + 1, hi))
            return jax.random.randint(key, (), lo,
                                      jnp.maximum(lo + 1, hi))

        def one(key):
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            i = jax.random.randint(k1, (), 0, n_aug)
            box = jax.lax.dynamic_index_in_dim(
                buffers["bboxes"], i, keepdims=False)
            x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
            xs = rand_between(k2, x0, x1 - plen)
            ys = rand_between(k3, y0, y1 - plen)
            sr = jax.lax.dynamic_slice(
                buffers["sr_imgs"], (i, ys, xs, 0),
                (1, plen, plen, 3))[0]
            gt = jax.lax.dynamic_slice(
                buffers["gt_imgs"], (i, ys, xs, 0),
                (1, plen, plen, 3))[0]
            rxl = jnp.maximum(x0, xs - off)
            rxh = jnp.minimum(x1 - plen, xs + off)
            ryl = jnp.maximum(y0, ys - off)
            ryh = jnp.minimum(y1 - plen, ys + off)

            def ref_one(kk):
                ka, kb = jax.random.split(kk)
                rx = rand_between(ka, rxl, rxh)
                ry = rand_between(kb, ryl, ryh)
                return jax.lax.dynamic_slice(
                    buffers["gt_img"], (ry, rx, 0), (plen, plen, 3))

            refs = jax.vmap(ref_one)(jax.random.split(k4, k_ref))
            if getattr(opt, "with_gt_patch", False):
                j = jax.random.randint(k5, (), 0, k_ref)
                refs = jnp.where(
                    (jnp.arange(k_ref) == j)[:, None, None, None],
                    gt[None], refs)
            return sr, refs, gt

        sr, refs, gt = jax.vmap(one)(
            jax.random.split(key, opt.batch_size))
        return {"sr_patch": sr, "ref_patches": refs, "gt_patch": gt}

    @functools.partial(jax.jit, static_argnums=(0, 3),
                       donate_argnums=1)
    def train_steps_scan(self, state: RefineState, buffers,
                         n_steps: int, key):
        """Run ``n_steps`` device-sampled refine steps as ONE compiled
        ``lax.scan`` program (same design as the NeRF systems'
        ``train_steps_scan``): amortizes dispatch through the host link
        and keeps the patch pipeline entirely in HBM. Returns the final
        state and the LAST step's losses."""

        def body(state, _):
            step_key = jax.random.fold_in(key, state.step)
            batch = self._sample_patch_batch(buffers, step_key)
            return self._train_step_impl(state, batch)

        state, losses = jax.lax.scan(body, state, None, length=n_steps)
        return state, jax.tree_util.tree_map(lambda x: x[-1], losses)

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, state: RefineState, sr, refs):
        """Deterministic refinement of a patch batch (eval mode)."""
        return self._apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            sr, refs, train=False)

    def validate_item(self, state, batch):
        """Refine one val patch triple and score it (parity:
        ``models/refine_model.py`` validate_iter losses — input vs
        refined PSNR + mse on (-1,1) patches). Returns (pred, metrics)."""
        pred = np.asarray(self.predict(
            state, jnp.asarray(batch["sr_patch"]),
            jnp.asarray(batch["ref_patches"])))
        gt = batch["gt_patch"]
        metrics = {
            "mse": float(np.mean((pred - gt) ** 2)),
            "psnr_input": float(psnr_fn(
                jnp.asarray((batch["sr_patch"] + 1) / 2),
                jnp.asarray((gt + 1) / 2))),
            "psnr_refine": float(psnr_fn(
                jnp.asarray((pred + 1) / 2), jnp.asarray((gt + 1) / 2))),
        }
        return pred, metrics

    # ------------------------------------------------------------------
    # GAN refinement option (--refine_as_gan)
    # ------------------------------------------------------------------
    def create_gan_state(self, key):
        """Discriminator params + optimizer (reference :89-95). The
        reference conditions D on a never-set ``self.input`` attribute
        (latent bug); here D sees the patch alone (input_nc=3)."""
        from nerfsr_tpu.models.networks import create_discriminator
        self.netD = create_discriminator(self.opt)
        variables = self.netD.init(
            key, jnp.zeros((1, self.opt.patch_len, self.opt.patch_len, 3)))
        self.txD = optax.adam(self.opt.gan_lr, b1=self.opt.beta1)
        return {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": self.txD.init(variables["params"])}

    @functools.partial(jax.jit, static_argnums=0)
    def gan_fakes(self, state: RefineState, batch):
        """Current generator output (stop-gradient) for the engine's
        ImagePool query. Reference ``backward_D`` queries the pool with
        THIS step's fakes (pix2pix semantics: D sees a ~50/50 mix of
        current and historical generator output every step), so the
        pool must be fed BEFORE the G+D update consumes its result."""
        pred, _ = self._apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["sr_patch"], batch["ref_patches"], train=True)
        return jax.lax.stop_gradient(pred)

    @functools.partial(jax.jit, static_argnums=0)
    def gan_train_step(self, state: RefineState, d_state, batch, key,
                       pool_fakes=None):
        """One lsgan G+D update pair (reference backward_D/backward_G,
        :106-131): D minimizes (D(gt)-1)^2 + D(G)^2, G minimizes
        (D(G)-1)^2 + lambda_L1 * L1(G, gt).

        pool_fakes: optional history-mixed fake batch (ImagePool) the
        DISCRIMINATOR trains on instead of the current fakes — the
        pix2pix stabilization the reference's ``utils/image_pool.py``
        provides; the engine builds it from ``gan_fakes`` of the SAME
        step. Returns (state, d_state, losses, fakes)."""
        del key
        return self._gan_step_impl(state, d_state, batch, pool_fakes)

    def _gan_step_impl(self, state, d_state, batch, pool_fakes):
        gt = batch["gt_patch"]

        pred, mutated = self._apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["sr_patch"], batch["ref_patches"], train=True)
        pred_sg = jax.lax.stop_gradient(pred)
        d_fake_in = pred_sg if pool_fakes is None else pool_fakes

        # refresh the spectral-norm power-iteration vectors ONCE per D
        # update (torch parity: u/v advance every D forward, outside
        # the gradient)
        _, d_mut = self.netD.apply(
            {"params": d_state["params"],
             "batch_stats": d_state["batch_stats"]},
            d_fake_in, update_stats=True, mutable=["batch_stats"])
        d_stats = jax.lax.stop_gradient(d_mut["batch_stats"])

        def d_apply(p, bs, x):
            return self.netD.apply({"params": p, "batch_stats": bs}, x,
                                   update_stats=False)

        def d_loss_fn(pd):
            fake = d_apply(pd, d_stats, d_fake_in)
            real = d_apply(pd, d_stats, gt)
            loss_fake = jnp.mean(fake ** 2)
            loss_real = jnp.mean((real - 1.0) ** 2)
            return 0.5 * (loss_fake + loss_real), (loss_real, loss_fake)

        (_, (d_real, d_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state["params"])
        d_updates, d_opt = self.txD.update(d_grads, d_state["opt_state"],
                                           d_state["params"])
        d_params = optax.apply_updates(d_state["params"], d_updates)

        def g_loss_fn(params):
            pred_g, mut = self._apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["sr_patch"], batch["ref_patches"], train=True)
            fake = d_apply(d_params, d_stats, pred_g)
            g_gan = jnp.mean((fake - 1.0) ** 2)
            # --lambda_L1 (reference models/refine_model.py:127; default 100)
            g_l1 = l1_loss(pred_g, gt) * self.opt.lambda_L1
            return g_gan + g_l1, (g_gan, g_l1, mut["batch_stats"])

        (_, (g_gan, g_l1, batch_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)
        g_updates, opt_state = self.tx.update(g_grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, g_updates)

        new_state = RefineState(step=state.step + 1, params=params,
                                batch_stats=batch_stats,
                                opt_state=opt_state)
        new_d = {"params": d_params, "batch_stats": d_stats,
                 "opt_state": d_opt}
        losses = {"G_GAN": g_gan, "G_L1": g_l1, "D_real": d_real,
                  "D_fake": d_fake}
        return new_state, new_d, losses, pred_sg

    def _pool_query(self, pool_buf, pool_n, imgs, key):
        """In-jit pix2pix ImagePool (``utils/image_pool.py`` semantics,
        sequential per image): while the buffer has free slots the
        image is stored and returned as-is; once full, with p=1/2 the
        image swaps with (and the D trains on) a uniformly random
        buffered one, else it passes through untouched. RNG stream
        differs from the host pool's numpy (training stochasticity
        only, like ``_sample_patch_batch``)."""
        pool_size = pool_buf.shape[0]

        def body(carry, x):
            buf, n = carry
            img, k = x
            k1, k2 = jax.random.split(k)
            not_full = n < pool_size
            swap = jax.random.uniform(k1) > 0.5
            ridx = jax.random.randint(k2, (), 0, pool_size)
            idx = jnp.where(not_full, n, ridx)
            old = jax.lax.dynamic_index_in_dim(buf, idx, keepdims=False)
            out = jnp.where(not_full | ~swap, img, old)
            # store the image at idx when inserting or swapping; a
            # no-swap step writes `old` back (identity update)
            entry = jnp.where(not_full | swap, img, old)
            buf = jax.lax.dynamic_update_index_in_dim(buf, entry, idx, 0)
            return (buf, n + not_full.astype(n.dtype)), out

        keys = jax.random.split(key, imgs.shape[0])
        (pool_buf, pool_n), outs = jax.lax.scan(
            body, (pool_buf, pool_n), (imgs, keys))
        return pool_buf, pool_n, outs

    @functools.partial(jax.jit, static_argnums=(0, 6),
                       donate_argnums=(1, 2, 3))
    def train_steps_scan_gan(self, state: RefineState, d_state, pool,
                             buffers, key, n_steps: int):
        """``n_steps`` --refine_as_gan G+D update pairs inside ONE
        compiled program: in-jit patch sampling
        (``_sample_patch_batch``), the pix2pix fake-history pool as
        scan-carried device state (``_pool_query``), and the lsgan+L1
        update (``_gan_step_impl``) — the GAN sibling of
        ``train_steps_scan`` (the host loop pays a per-step host batch
        build + pool query + dispatch round trip instead).

        ``pool``: {"buf": (pool_size, P, P, 3), "n": ()} device state;
        pass the returned pool back in on the next chunk. Engine
        ordering parity: the pool is queried with THIS step's fakes
        before the update consumes its result (``gan_fakes`` note).
        Returns (state, d_state, pool, last-step losses)."""

        def body(carry, _):
            state, d_state, pbuf, pn = carry
            step_key = jax.random.fold_in(key, state.step)
            bk, pk = jax.random.split(step_key)
            batch = self._sample_patch_batch(buffers, bk)
            fakes, _ = self._apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats},
                batch["sr_patch"], batch["ref_patches"], train=True)
            fakes = jax.lax.stop_gradient(fakes)
            pbuf, pn, pool_fakes = self._pool_query(pbuf, pn, fakes, pk)
            state, d_state, losses, _ = self._gan_step_impl(
                state, d_state, batch, pool_fakes)
            return (state, d_state, pbuf, pn), losses

        (state, d_state, pbuf, pn), losses = jax.lax.scan(
            body, (state, d_state, pool["buf"], pool["n"]), None,
            length=n_steps)
        losses = jax.tree_util.tree_map(lambda x: x[-1], losses)
        return state, d_state, {"buf": pbuf, "n": pn}, losses

    # ------------------------------------------------------------------
    def refine_image(self, state, tiles, batch=8):
        """Refine all tiles of one image and stitch (reference test,
        :205-232). Returns (refined, sr, gt_or_None) as (H, W, 3) in
        (-1, 1)."""
        w, h = [int(x) for x in tiles["wh"]]
        plen = int(tiles["patch_len"])
        n = tiles["sr_patch"].shape[0]
        preds = []
        for s in range(0, n, batch):
            e = min(s + batch, n)
            sr = tiles["sr_patch"][s:e]
            refs = tiles["ref_patches"][s:e]
            pad = batch - (e - s)
            if pad:
                sr = np.concatenate([sr, np.repeat(sr[-1:], pad, 0)])
                refs = np.concatenate([refs, np.repeat(refs[-1:], pad, 0)])
            out = np.asarray(self.predict(state, jnp.asarray(sr),
                                          jnp.asarray(refs)))
            preds.append(out[: e - s])
        preds = np.concatenate(preds)

        refined = np.zeros((h, w, 3), np.float32)
        sr_img = np.zeros_like(refined)
        gt_img = np.zeros_like(refined) if "gt_patch" in tiles else None
        for p in range(n):
            x, y = [int(v) for v in tiles["start_locs"][p]]
            refined[y:y + plen, x:x + plen] = preds[p]
            sr_img[y:y + plen, x:x + plen] = tiles["sr_patch"][p]
            if gt_img is not None:
                gt_img[y:y + plen, x:x + plen] = tiles["gt_patch"][p]
        return refined, sr_img, gt_img

    def eval_image_metrics(self, refined, sr_img, gt_img):
        """SSIM of sr vs refined against gt, on (-1,1) images
        (reference uses SSIM(data_range=(-1,1)), :63)."""
        return {
            "ssim_input": float(ssim_fn(
                jnp.asarray(sr_img), jnp.asarray(gt_img), max_val=2.0)),
            "ssim_refine": float(ssim_fn(
                jnp.asarray(refined), jnp.asarray(gt_img), max_val=2.0)),
            "psnr_input": float(psnr_fn(
                jnp.asarray((sr_img + 1) / 2),
                jnp.asarray((gt_img + 1) / 2))),
            "psnr_refine": float(psnr_fn(
                jnp.asarray((refined + 1) / 2),
                jnp.asarray((gt_img + 1) / 2))),
        }
