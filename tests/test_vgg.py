"""VGG perceptual-loss execution tests (VERDICT r1 gap: the path had
never run). A synthetic VGG19-shaped weights archive
(``write_synthetic_vgg_npz``) lets CI exercise forward + grad + the
``--refine_with_vgg`` and patch-VGG train steps without ImageNet
weights. Parity surface: reference ``models/criterions.py:140-187``
and ``models/nerf_model.py:292-304``."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.models.criterions import (VGGPerceptualLoss,
                                          write_synthetic_vgg_npz)


@pytest.fixture(scope="module")
def vgg_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("vgg") / "vgg19_synthetic.npz"
    return str(write_synthetic_vgg_npz(str(path), seed=0))


def _patches(n, hw, seed):
    return jnp.asarray(
        np.random.RandomState(seed).rand(n, hw, hw, 3).astype(np.float32)
        * 2 - 1)


class TestVGGLoss:
    def test_archive_shapes(self, vgg_npz):
        z = np.load(vgg_npz)
        assert len(z.files) == 28  # 14 convs x (w, b)
        assert z["w0"].shape == (3, 3, 3, 64)
        assert z["w13"].shape == (3, 3, 512, 512)

    def test_zero_for_identical(self, vgg_npz):
        loss = VGGPerceptualLoss(vgg_npz)
        x = _patches(1, 32, 0)
        assert float(loss(x, x)) == 0.0

    def test_positive_and_grad_flows(self, vgg_npz):
        loss = VGGPerceptualLoss(vgg_npz)
        x, y = _patches(1, 32, 1), _patches(1, 32, 2)
        val = float(loss(x, y))
        assert val > 0
        g = jax.grad(lambda p: loss(p, y))(x)
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    def test_missing_archive_raises(self):
        with pytest.raises(FileNotFoundError):
            VGGPerceptualLoss(None)(_patches(1, 32, 3), _patches(1, 32, 4))


class TestRefineWithVGG:
    def test_loss_descends_under_mse_plus_vgg(self, vgg_npz):
        """--refine_with_vgg end-to-end: UNet refine steps on a fixed
        batch must reduce the combined mse+vgg objective."""
        from nerfsr_tpu.models import create_model

        opt = default_options(
            "train", model="refine", dataset_mode="llff_refine",
            patch_len=64, batch_size=2, num_ref_patches=2,
            refine_with_mse=True, refine_with_vgg=True,
            lambda_refine_vgg=0.1, vgg_weights=vgg_npz,
            n_epochs=1, n_epochs_decay=0, lr=1e-3)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=10)
        rng = np.random.RandomState(0)
        batch = {
            "sr_patch": jnp.asarray(
                rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1),
            "ref_patches": jnp.asarray(
                rng.rand(2, 2, 64, 64, 3).astype(np.float32) * 2 - 1),
            "gt_patch": jnp.asarray(
                rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1),
        }
        key = jax.random.PRNGKey(1)
        first = None
        for _ in range(4):
            state, losses = system.train_step(
                state, jax.tree_util.tree_map(jnp.copy, batch), key)
            tot = float(losses["tot"])
            assert "vgg" in losses and np.isfinite(tot)
            if first is None:
                first = tot
        assert tot < first


class TestPatchVGGTrainStep:
    def test_patch_mode_vgg_executes(self, vgg_npz):
        """train_step_patches with lambda_fine_vgg and ps>=32 runs the
        perceptual term (reference gates VGG at patch_size>=32,
        models/nerf_model.py:292-304)."""
        from nerfsr_tpu.models import create_model

        ps = 32
        opt = default_options(
            "train", model="nerf", dataset_mode="llff",
            batch_size=ps * ps, N_coarse=4, N_importance=4, D=2, W=32,
            precision="f32", patch_size=ps, lambda_fine_vgg=0.1,
            lambda_coarse_vgg=0.0, vgg_weights=vgg_npz,
            white_bkgd=False, noise_std=0.0, n_epochs=1, n_epochs_decay=0)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=5)
        rng = np.random.RandomState(0)
        h = w = ps
        d = rng.randn(2, h, w, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        img_buffer = {
            "origins": jnp.asarray(
                rng.randn(2, h, w, 3).astype(np.float32) * 0.1),
            "directions": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
            "near": jnp.zeros((2, h, w, 1), jnp.float32),
            "far": jnp.ones((2, h, w, 1), jnp.float32),
            "rgbs": jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32)),
        }
        state, losses = system.train_step_patches(
            state, img_buffer, jax.random.PRNGKey(1), ps)
        assert "fine_vgg" in losses
        assert np.isfinite(float(losses["fine_vgg"]))
        assert np.isfinite(float(losses["tot"]))
