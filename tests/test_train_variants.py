"""Coverage for the train-step variants VERDICT r1 flagged as untested:
``train_step_with_ref`` (--with_ref loss, reference
``models/nerf_model.py:267-270``) and ``train_step_patches`` (patch
sampling + depth-laplacian losses, reference :276-290)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.models import create_model


def _ray_buffer(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "origins": jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1),
        "directions": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "near": jnp.zeros((n, 1), jnp.float32),
        "far": jnp.ones((n, 1), jnp.float32),
        "rgbs": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }


def _tiny_opt(**kw):
    base = dict(model="nerf", dataset_mode="llff", batch_size=32,
                N_coarse=8, N_importance=8, D=2, W=32, precision="f32",
                white_bkgd=False, noise_std=0.0, n_epochs=2,
                n_epochs_decay=1)
    base.update(kw)
    return default_options("train", **base)


class TestTrainStepWithRef:
    def test_ref_losses_present_and_descend(self):
        opt = _tiny_opt(with_ref=True, downscale=2)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        buffer = _ray_buffer(256, 0)
        ref_buffer = _ray_buffer(128, 1)
        key = jax.random.PRNGKey(2)
        tots = []
        for _ in range(30):
            state, losses = system.train_step_with_ref(
                state, buffer, ref_buffer, key)
            tots.append(float(losses["tot"]))
        assert "ref_coarse_mse" in losses and "ref_fine_mse" in losses
        assert all(np.isfinite(t) for t in tots)
        assert np.mean(tots[-5:]) < np.mean(tots[:5])

    def test_with_ref_fast_sampling_no_coarse_level(self):
        """--with_ref + --fast_sampling: render_rays_fast emits no
        coarse level, so _ref_losses must supervise the fine level only
        (regression: KeyError 'coarse_rgb' at jit trace)."""
        opt = _tiny_opt(with_ref=True, downscale=2, fast_sampling=True,
                        n_prop=8)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        state, losses = system.train_step_with_ref(
            state, _ray_buffer(64, 0), _ray_buffer(32, 1),
            jax.random.PRNGKey(2))
        assert "ref_fine_mse" in losses
        assert "ref_coarse_mse" not in losses
        assert np.isfinite(float(losses["tot"]))

    def test_ref_loss_scaled_by_downscale_sq(self):
        """The ref mse enters at weight 1/ds^2 (reference :267-270)."""
        buffer = _ray_buffer(64, 0)
        ref = _ray_buffer(64, 1)
        vals = {}
        for ds in (1, 2):
            opt = _tiny_opt(with_ref=True, downscale=ds, randomized=False,
                            noise_std=0.0)
            system = create_model(opt)
            params = system.init_params(jax.random.PRNGKey(0))
            _, losses = system._ref_losses(params, ref,
                                           jax.random.PRNGKey(1))
            vals[ds] = float(losses["ref_coarse_mse"])
        np.testing.assert_allclose(vals[1] / 4.0, vals[2], rtol=1e-5)
        del buffer


class TestTrainStepPatches:
    def _img_buffer(self, n_img, h, w, seed=0):
        rng = np.random.RandomState(seed)
        d = rng.randn(n_img, h, w, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return {
            "origins": jnp.asarray(
                rng.randn(n_img, h, w, 3).astype(np.float32) * 0.1),
            "directions": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
            "near": jnp.zeros((n_img, h, w, 1), jnp.float32),
            "far": jnp.ones((n_img, h, w, 1), jnp.float32),
            "rgbs": jnp.asarray(
                rng.rand(n_img, h, w, 3).astype(np.float32)),
        }

    def test_depth_lap_losses_present_and_descend(self):
        ps = 4
        opt = _tiny_opt(batch_size=ps * ps * 4, patch_size=ps,
                        lambda_coarse_depth_lap=1e-3,
                        lambda_fine_depth_lap=1e-3)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        img_buffer = self._img_buffer(2, 12, 12)
        key = jax.random.PRNGKey(3)
        tots = []
        for _ in range(30):
            state, losses = system.train_step_patches(
                state, img_buffer, key, ps)
            tots.append(float(losses["tot"]))
        assert "coarse_depth_lap" in losses and "fine_depth_lap" in losses
        assert all(np.isfinite(t) for t in tots)
        assert np.mean(tots[-5:]) < np.mean(tots[:5])

    def test_patches_fast_sampling_skips_coarse_lap(self):
        """--fast_sampling patch mode: no coarse level, so only the
        fine depth-laplacian term is emitted (regression: KeyError
        'coarse_depth' at jit trace)."""
        ps = 4
        opt = _tiny_opt(batch_size=ps * ps * 2, patch_size=ps,
                        fast_sampling=True, n_prop=8,
                        lambda_coarse_depth_lap=1e-3,
                        lambda_fine_depth_lap=1e-3)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=5)
        img_buffer = self._img_buffer(1, 8, 8)
        state, losses = system.train_step_patches(
            state, img_buffer, jax.random.PRNGKey(4), ps)
        assert "coarse_depth_lap" not in losses
        assert "fine_depth_lap" in losses
        assert np.isfinite(float(losses["tot"]))

    def test_small_patch_skips_lap(self):
        """ps <= 2 must not emit depth-laplacian terms (reference gate
        patch_size > 2, models/nerf_model.py:276)."""
        ps = 2
        opt = _tiny_opt(batch_size=ps * ps * 2, patch_size=ps,
                        lambda_coarse_depth_lap=1e-3)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=5)
        img_buffer = self._img_buffer(1, 8, 8)
        state, losses = system.train_step_patches(
            state, img_buffer, jax.random.PRNGKey(4), ps)
        assert "coarse_depth_lap" not in losses


class TestScannedVariants:
    """The scanned with-ref / patch chunks (VERDICT r4 weak #4) must be
    step-for-step identical to the single-dispatch jits they amortize."""

    def test_scan_with_ref_matches_single_steps(self):
        opt = _tiny_opt(with_ref=True, downscale=2)
        system = create_model(opt)
        buffer = _ray_buffer(256, 0)
        ref_buffer = _ray_buffer(128, 1)
        key = jax.random.PRNGKey(2)
        s_single = system.create_state(jax.random.PRNGKey(0),
                                       steps_per_epoch=50)
        s_scan = system.create_state(jax.random.PRNGKey(0),
                                     steps_per_epoch=50)
        for _ in range(3):
            s_single, l_single = system.train_step_with_ref(
                s_single, buffer, ref_buffer, key)
        s_scan, l_scan = system.train_steps_scan_with_ref(
            s_scan, buffer, ref_buffer, 3, 1, key, jnp.int32(0))
        assert int(s_scan.step) == int(s_single.step) == 3
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s_single.params, s_scan.params)
        for k in l_single:
            np.testing.assert_array_equal(np.asarray(l_single[k]),
                                          np.asarray(l_scan[k]))

    def test_scan_with_ref_freq_masks_off_steps(self):
        """--ref_freq 2: the ref contribution is zeroed on off-steps
        (parity with engine.py's it % ref_freq gate)."""
        opt = _tiny_opt(with_ref=True, downscale=2)
        system = create_model(opt)
        buffer = _ray_buffer(128, 0)
        ref_buffer = _ray_buffer(64, 1)
        key = jax.random.PRNGKey(2)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        # 2 steps from it0=1: i=0 -> it 1 (off), i=1 -> it 2 (on);
        # returned losses are the LAST step's -> ref term present
        state, losses = system.train_steps_scan_with_ref(
            state, buffer, ref_buffer, 2, 2, key, jnp.int32(1))
        assert float(losses["ref_fine_mse"]) > 0.0
        # 2 steps from it0=0: last step is it 1 (off) -> ref term zero
        state2 = system.create_state(jax.random.PRNGKey(0),
                                     steps_per_epoch=50)
        state2, losses2 = system.train_steps_scan_with_ref(
            state2, buffer, ref_buffer, 2, 2, key, jnp.int32(0))
        assert float(losses2["ref_fine_mse"]) == 0.0
        assert np.isfinite(float(losses2["tot"]))

    def test_scan_patches_matches_single_steps(self):
        ps = 4
        opt = _tiny_opt(batch_size=ps * ps * 4, patch_size=ps,
                        lambda_coarse_depth_lap=1e-3,
                        lambda_fine_depth_lap=1e-3)
        system = create_model(opt)
        img_buffer = TestTrainStepPatches._img_buffer(None, 2, 12, 12)
        key = jax.random.PRNGKey(3)
        s_single = system.create_state(jax.random.PRNGKey(0),
                                       steps_per_epoch=50)
        s_scan = system.create_state(jax.random.PRNGKey(0),
                                     steps_per_epoch=50)
        for _ in range(3):
            s_single, l_single = system.train_step_patches(
                s_single, img_buffer, key, ps)
        s_scan, l_scan = system.train_steps_scan_patches(
            s_scan, img_buffer, 3, ps, key)
        assert int(s_scan.step) == int(s_single.step) == 3
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s_single.params, s_scan.params)
        for k in l_single:
            np.testing.assert_array_equal(np.asarray(l_single[k]),
                                          np.asarray(l_scan[k]))


class TestInitGain:
    def test_normal_init_std_scales_with_gain(self):
        """--init_gain drives the normal-init std (reference
        models/networks.py:28: init.normal_(w, 0, init_gain))."""
        stds = {}
        for gain in (0.02, 0.2):
            opt = _tiny_opt(init_type="normal", init_gain=gain,
                            D=4, W=128)
            system = create_model(opt)
            params = system.init_params(jax.random.PRNGKey(0))
            w = np.asarray(
                params["coarse"]["params"]["xyz_encoding_2"]["kernel"])
            stds[gain] = w.std()
        np.testing.assert_allclose(stds[0.2] / stds[0.02], 10.0, rtol=0.2)

    def test_xavier_gain_matches_torch_formula(self):
        opt = _tiny_opt(init_type="xavier", init_gain=1.0, D=4, W=128)
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        w = np.asarray(
            params["coarse"]["params"]["xyz_encoding_2"]["kernel"])
        fan_in, fan_out = w.shape
        want = np.sqrt(2.0 / (fan_in + fan_out))
        np.testing.assert_allclose(w.std(), want, rtol=0.1)
