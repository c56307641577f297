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
        state, d_state, losses = sys_.gan_step(
            state, d_state, patch, jax.random.PRNGKey(2))
        for k in ("G_GAN", "D_real", "D_fake"):
            assert np.isfinite(float(losses[k])), k
        new_d = jax.tree_util.tree_leaves(d_state["params"])[0]
        assert not np.allclose(np.asarray(old_d), np.asarray(new_d))

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
