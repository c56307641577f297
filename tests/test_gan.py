"""GAN objectives + downX adversarial patch training."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.models import create_model
from nerfsr_tpu.models.criterions import gan_loss, wgan_gradient_penalty


class TestGANLoss:
    def test_lsgan_values(self):
        logits = jnp.array([[0.5], [1.5]])
        np.testing.assert_allclose(
            float(gan_loss(logits, True, "lsgan")),
            np.mean((np.array([0.5, 1.5]) - 1) ** 2), rtol=1e-6)
        np.testing.assert_allclose(
            float(gan_loss(logits, False, "lsgan")),
            np.mean(np.array([0.5, 1.5]) ** 2), rtol=1e-6)

    def test_vanilla_is_bce(self):
        logits = jnp.array([[0.3], [-0.7]])
        got = float(gan_loss(logits, True, "vanilla"))
        expected = np.mean(np.log1p(np.exp(-np.array([0.3, -0.7]))))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_wgangp_signs(self):
        logits = jnp.array([[2.0]])
        assert float(gan_loss(logits, True, "wgangp")) == -2.0
        assert float(gan_loss(logits, False, "wgangp")) == 2.0

    def test_gradient_penalty_zero_for_linear_unit_grad(self):
        # D(x) = sum over last axis => grad norm = sqrt(dim); penalty is
        # positive and differentiable
        def d_apply(x):
            return jnp.sum(x, axis=(1, 2, 3))

        rng = np.random.RandomState(0)
        real = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        fake = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        gp = wgan_gradient_penalty(d_apply, jax.random.PRNGKey(0), real,
                                   fake, lam=10.0)
        expected = 10.0 * (np.sqrt(4 * 4 * 3) - 1) ** 2
        np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


class TestDownXGanStep:
    def test_gan_step_runs_and_updates(self, tmp_path):
        from tools.make_synthetic_llff import make_llff_scene
        from nerfsr_tpu.data import create_dataset

        scene = str(tmp_path / "s")
        make_llff_scene(scene, hw=(64, 64), n_imgs=3)
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=scene, img_wh=(64, 64), downscale=2,
            batch_size=8, N_coarse=4, N_importance=4, D=2, W=16,
            deg_pos=2, deg_dir=1, precision="f32", n_epochs=1,
            n_epochs_decay=0, with_netD=True, patch_len=32,
            gan_mode="lsgan")
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=5)
        d_state = sys_.create_gan_state(jax.random.PRNGKey(1))
        ds = create_dataset(opt, "train")
        rng = np.random.RandomState(0)
        patch = jax.tree_util.tree_map(jnp.asarray, ds.gan_patch(rng))
        assert patch["rgbs"].shape == (32, 32, 3)
        old_d = jax.tree_util.tree_leaves(d_state["params"])[0].copy()
        old_bs = [np.asarray(x).copy() for x in
                  jax.tree_util.tree_leaves(d_state["batch_stats"])]
        state, d_state, losses = sys_.gan_step(
            state, d_state, patch, jax.random.PRNGKey(2))
        for k in ("G_GAN", "D_real", "D_fake"):
            assert np.isfinite(float(losses[k])), k
        new_d = jax.tree_util.tree_leaves(d_state["params"])[0]
        assert not np.allclose(np.asarray(old_d), np.asarray(new_d))
        # the spectral-norm power-iteration vectors must ADVANCE each
        # D update (torch parity; regression: u/v frozen at init while
        # D trained, silently degrading the Lipschitz normalization)
        new_bs = jax.tree_util.tree_leaves(d_state["batch_stats"])
        assert len(new_bs) > 0
        assert any(not np.array_equal(a, np.asarray(b))
                   for a, b in zip(old_bs, new_bs))

    def test_use_grad_d_input(self, tmp_path):
        from tools.make_synthetic_llff import make_llff_scene

        scene = str(tmp_path / "s2")
        make_llff_scene(scene, hw=(64, 64), n_imgs=3)
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=scene, img_wh=(64, 64), downscale=2,
            batch_size=8, N_coarse=4, N_importance=4, D=2, W=16,
            deg_pos=2, deg_dir=1, precision="f32", n_epochs=1,
            n_epochs_decay=0, with_netD=True, patch_len=32,
            use_grad=True)
        sys_ = create_model(opt)
        img = jnp.asarray(
            np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
        mag = sys_._img_grad_mag(img)
        assert mag.shape == img.shape
        # far edges zero by construction
        np.testing.assert_allclose(np.asarray(mag[0, -1, -1]), 0,
                                   atol=1e-5)


class TestDeviceGanScan:
    """In-scan adversarial / reg-patch updates with device raygen
    (train_steps_scan_gan / train_steps_scan_reg): the patch is built
    on device from (direction grid, pose) instead of a host
    _pose_rays_grouped + upload per firing."""

    def _setup(self, tmp_path, **kw):
        from tools.make_synthetic_llff import make_llff_scene
        from nerfsr_tpu.data import create_dataset

        scene = str(tmp_path / "s")
        make_llff_scene(scene, hw=(64, 64), n_imgs=3)
        base = dict(model="nerf_downX", dataset_mode="llff_downX",
                    dataset_root=scene, img_wh=(64, 64), downscale=2,
                    batch_size=8, N_coarse=4, N_importance=4, D=2, W=16,
                    deg_pos=2, deg_dir=1, precision="f32", n_epochs=1,
                    n_epochs_decay=0, with_netD=True, patch_len=32,
                    gan_mode="lsgan", noise_std=0.0, randomized=False)
        base.update(kw)
        opt = default_options("train", **base)
        sys_ = create_model(opt)
        ds = create_dataset(opt, "train")
        return opt, sys_, ds

    def test_device_patch_raygen_matches_host(self, tmp_path):
        """_gan_patch_at at a FIXED (view, r0, c0) reproduces the host
        gan_patch's ray fields and real pixels exactly (same NDC math,
        same source image)."""
        from nerfsr_tpu.data.downx_common import ungroup_subpixels

        opt, sys_, ds = self._setup(tmp_path)
        bufs_np, geom = ds.gan_raygen_buffers()
        bufs = jax.tree_util.tree_map(jnp.asarray, bufs_np)
        view_i, r0_lr, c0_lr = 1, 2, 3
        rays, real = sys_._gan_patch_at(
            bufs, geom, jnp.int32(view_i), jnp.int32(r0_lr),
            jnp.int32(c0_lr))

        # host counterpart at the same location (gan_patch internals
        # with the randomness pinned)
        plen, ds_f = opt.patch_len, opt.downscale
        pl_lr, wl = plen // ds_f, opt.img_wh[0] // ds_f
        usable = ds._usable_views()
        g = ds._pose_rays_grouped(ds.poses[usable[view_i]])
        idx = ((r0_lr + np.arange(pl_lr))[:, None] * wl
               + (c0_lr + np.arange(pl_lr))[None, :]).reshape(-1)
        host = {k: ungroup_subpixels(v[idx], (plen, plen), ds_f)
                for k, v in g.items()}
        np.testing.assert_allclose(
            np.asarray(rays.origins).reshape(plen, plen, 3),
            host["origins"], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rays.directions).reshape(plen, plen, 3),
            host["directions"], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rays.near).reshape(plen, plen, 1),
            host["near"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rays.far).reshape(plen, plen, 1),
            host["far"], atol=1e-6)
        # real pixels: the reference view's HR crop at the HR location
        from nerfsr_tpu.data.blender import load_image
        img = load_image(ds.image_paths[0], opt.img_wh)
        r0, c0 = r0_lr * ds_f, c0_lr * ds_f
        np.testing.assert_allclose(
            np.asarray(real)[0], img[r0:r0 + plen, c0:c0 + plen],
            atol=1e-6)

    def test_scan_gan_cadence(self, tmp_path):
        """The in-scan D+G update fires exactly at the --gan_iter
        cadence: no firing -> D params bit-identical and zero GAN
        losses; firing -> D params move and losses are finite."""
        from nerfsr_tpu.parallel.mesh import to_device_buffer

        opt, sys_, ds = self._setup(tmp_path, gan_iter=10)
        bufs_np, geom = ds.gan_raygen_buffers()
        bufs = jax.tree_util.tree_map(jnp.asarray, bufs_np)
        buffer = to_device_buffer(ds.ray_buffer(), None)
        key = jax.random.PRNGKey(3)

        # it0=0, 3 steps -> iterations 1..3, no multiple of 10
        state = sys_.create_state(jax.random.PRNGKey(0), 5)
        d_state = sys_.create_gan_state(jax.random.PRNGKey(1))
        d_before = jax.device_get(d_state["params"])
        st, d_st, losses = sys_.train_steps_scan_gan(
            state, d_state, buffer, bufs, 3, geom, key, jnp.int32(0),
            False)
        assert float(losses["G_GAN"]) == 0.0
        for a, b in zip(jax.tree_util.tree_leaves(d_before),
                        jax.tree_util.tree_leaves(
                            jax.device_get(d_st["params"]))):
            np.testing.assert_array_equal(a, b)
        assert int(st.step) == 3  # no extra step increments

        # it0=7, 4 steps -> iterations 8..11, fires once at 10
        state = sys_.create_state(jax.random.PRNGKey(0), 5)
        d_state = sys_.create_gan_state(jax.random.PRNGKey(1))
        st, d_st, losses = sys_.train_steps_scan_gan(
            state, d_state, buffer, bufs, 4, geom, key, jnp.int32(7),
            False)
        for k in ("G_GAN", "D_real", "D_fake", "tot"):
            assert np.isfinite(float(losses[k])), k
        changed = any(
            not np.array_equal(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(d_before),
                jax.tree_util.tree_leaves(
                    jax.device_get(d_st["params"]))))
        assert changed
        assert int(st.step) == 5  # 4 main + 1 gan step increment

    def test_scan_reg_matches_host_reg_step(self, tmp_path):
        """The device-raygen TV update reproduces the host
        reg_patch_step's loss at the same patch location (tests BOTH
        the raygen parity and the grouped->spatial ungrouping fix —
        the reference TVs the SPATIAL patch,
        llff_downX_dataset.py:436-437)."""
        opt, sys_, ds = self._setup(tmp_path, reg_patch=True,
                                    reg_patch_len=4, reg_lambda_tv=1.0)
        bufs_np, geom = ds.gan_raygen_buffers()
        bufs = jax.tree_util.tree_map(jnp.asarray, bufs_np)
        view_i, r0_lr, c0_lr = 0, 1, 2
        plen_lr, ds_f = opt.reg_patch_len, opt.downscale
        wl = opt.img_wh[0] // ds_f

        state = sys_.create_state(jax.random.PRNGKey(0), 5)
        rays = sys_._patch_rays_at(
            bufs, geom, jnp.int32(view_i), jnp.int32(r0_lr * ds_f),
            jnp.int32(c0_lr * ds_f), plen_lr * ds_f)
        _, la = sys_._reg_update_impl(state, rays, jax.random.PRNGKey(7))

        usable = ds._usable_views()
        g = ds._pose_rays_grouped(ds.poses[usable[view_i]])
        idx = ((r0_lr + np.arange(plen_lr))[:, None] * wl
               + (c0_lr + np.arange(plen_lr))[None, :]).reshape(-1)
        pb = {k: jnp.asarray(v[idx]) for k, v in g.items()}
        state2 = sys_.create_state(jax.random.PRNGKey(0), 5)
        _, lb = sys_.reg_patch_step(state2, pb, jax.random.PRNGKey(9))
        np.testing.assert_allclose(float(la["patch"]),
                                   float(lb["patch"]), rtol=1e-5)

    def test_scan_reg_runs_and_updates(self, tmp_path):
        from nerfsr_tpu.parallel.mesh import to_device_buffer

        opt, sys_, ds = self._setup(tmp_path, reg_patch=True,
                                    reg_patch_len=4, reg_patch_freq=2)
        bufs_np, geom = ds.gan_raygen_buffers()
        bufs = jax.tree_util.tree_map(jnp.asarray, bufs_np)
        buffer = to_device_buffer(ds.ray_buffer(), None)
        state = sys_.create_state(jax.random.PRNGKey(0), 5)
        st, losses = sys_.train_steps_scan_reg(
            state, buffer, bufs, 4, geom, jax.random.PRNGKey(3),
            jnp.int32(0))
        assert np.isfinite(float(losses["patch"]))
        assert float(losses["patch"]) != 0.0  # fired at its 2,4
        assert np.isfinite(float(losses["tot"]))


class TestDevicePoolQuery:
    def test_pool_semantics(self):
        """In-jit pix2pix pool (RefineSystem._pool_query): fill phase
        passes images through while storing them; full phase returns
        either the input or a previously-buffered image, and buffer
        rows only ever change to images that were queried."""
        opt = default_options(
            "train", model="refine", dataset_mode="llff_refine",
            patch_len=32, batch_size=2, num_ref_patches=2,
            refine_network="unetgenerator", ngf=8, num_downs=3,
            refine_with_l1=True, n_epochs=1, n_epochs_decay=0)
        sys_ = create_model(opt)
        S, P = 4, 8
        pool = jnp.zeros((S, P, P, 3))
        n = jnp.int32(0)

        def imgs(vals):  # constant-valued, identifiable patches
            return jnp.stack([jnp.full((P, P, 3), float(v))
                              for v in vals])

        # fill phase: 4 distinct images -> returned as-is, stored in order
        pool, n, out = sys_._pool_query(pool, n, imgs([1, 2, 3, 4]),
                                        jax.random.PRNGKey(0))
        assert int(n) == 4
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(imgs([1, 2, 3, 4])))
        np.testing.assert_array_equal(np.asarray(pool),
                                      np.asarray(imgs([1, 2, 3, 4])))

        # full phase: every output is the input or a buffered value;
        # buffer rows afterwards hold only values ever queried
        queried = {1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0}
        pool2, n2, out2 = sys_._pool_query(
            pool, n, imgs([5, 6, 7, 8]), jax.random.PRNGKey(1))
        assert int(n2) == 4
        for i, v in enumerate([5.0, 6.0, 7.0, 8.0]):
            got = float(np.asarray(out2)[i, 0, 0, 0])
            assert got in queried, got
        for row in np.asarray(pool2)[:, 0, 0, 0]:
            assert float(row) in queried
        # across many keys the full-phase pool DOES sometimes swap
        swapped = False
        for s in range(8):
            p3, _, o3 = sys_._pool_query(
                pool, n, imgs([9]), jax.random.PRNGKey(100 + s))
            if float(np.asarray(o3)[0, 0, 0, 0]) != 9.0:
                swapped = True
        assert swapped


class TestRefineGanPool:
    def test_refine_gan_step_with_image_pool(self):
        """--refine_as_gan D-step trains on history-mixed fakes via
        ImagePool (pix2pix stabilization, utils/image_pool.py)."""
        import numpy as np
        from nerfsr_tpu.config import default_options
        from nerfsr_tpu.models import create_model
        from nerfsr_tpu.utils.image_pool import ImagePool

        # tiny U-Net: the pool/D wiring under test is network-agnostic,
        # and the VNPCAT maxpooling net costs ~1 min of CPU XLA compile
        # (maxpooling itself is covered in test_refine_warp.py)
        opt = default_options(
            "train", model="refine", dataset_mode="llff_refine",
            patch_len=32, batch_size=2, num_ref_patches=2,
            refine_network="unetgenerator", ngf=8, num_downs=3,
            refine_as_gan=True,
            refine_with_l1=True, n_epochs=1, n_epochs_decay=0)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=5)
        d_state = system.create_gan_state(jax.random.PRNGKey(1))
        rng = np.random.RandomState(0)
        batch = {
            "sr_patch": jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
            "ref_patches": jnp.asarray(
                rng.rand(2, 2, 32, 32, 3).astype(np.float32) * 2 - 1),
            "gt_patch": jnp.asarray(
                rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        }
        pool = ImagePool(pool_size=4, seed=0)
        for _ in range(3):
            # engine ordering (reference backward_D semantics): the pool
            # is queried with THIS step's fakes before the G+D update
            fakes = system.gan_fakes(state, batch)
            pool_fakes = jnp.asarray(pool.query(np.asarray(fakes)))
            state, d_state, losses, _ = system.gan_train_step(
                state, d_state, batch, jax.random.PRNGKey(2), pool_fakes)
        assert fakes.shape == (2, 32, 32, 3)
        assert len(pool.images) > 0
        for v in losses.values():
            assert np.isfinite(float(v))
