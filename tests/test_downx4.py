"""x4 supersampling (downscale=4) coverage — VERDICT r2 missing #1.

The reference documents the x4 config ("if downscale=4, change
batchsize=128", ``scripts/train_llff_downX.sh:19``) and ships x4
pretrained models (``README.md:29-45``); every prior quality run here
used ds=2. These tests pin the ds=4 grouping/_ungroup/device-raygen
paths that the ds=4 flagship runs (STATUS.md) exercise at scale:
16 sub-rays per LR pixel, '(h s1)(w s2) c -> (h w)(s1 s2) c' with
s1=s2=4 (``data/llff_downX_dataset.py:351-357``).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.data import create_dataset
from nerfsr_tpu.data.downx_common import group_subpixels, ungroup_subpixels
from nerfsr_tpu.models import create_model

_TINY = dict(N_coarse=4, N_importance=4, D=2, W=16, deg_pos=2,
             deg_dir=1, precision="f32", white_bkgd=False, noise_std=0.0)


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    from tools.make_synthetic_llff import make_llff_scene
    d = tmp_path_factory.mktemp("llff_x4")
    make_llff_scene(str(d), hw=(24, 24), n_imgs=4)
    return str(d)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("bl_x4")
    make_scene(str(d), hw=(24, 24), n_train=2, n_val=1, n_test=1)
    return str(d)


class TestGroupingDs4:
    def test_round_trip(self):
        rng = np.random.RandomState(0)
        x = rng.rand(16, 24, 3).astype(np.float32)
        g = group_subpixels(x, 4)
        assert g.shape == (4 * 6, 16, 3)
        np.testing.assert_array_equal(
            ungroup_subpixels(g, (16, 24), 4), x)

    def test_block_order_row_major_16(self):
        # block (0,0) holds HR pixels rows 0-3 x cols 0-3 in row-major
        # order — the einops convention at s1=s2=4
        x = np.arange(8 * 8).reshape(8, 8, 1)
        g = group_subpixels(x, 4)
        want = (np.arange(4)[:, None] * 8 + np.arange(4)).ravel()
        np.testing.assert_array_equal(g[0, :, 0], want)
        np.testing.assert_array_equal(g[1, :, 0], want + 4)


class TestDatasetDs4:
    def test_buffer_shapes_and_lr_mean(self, blender_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="blender_downX",
            dataset_root=blender_scene, img_wh=(24, 24), downscale=4,
            batch_size=8, ds_method="avg", **_TINY)
        buf = create_dataset(opt, "train").ray_buffer()
        n_lr = 2 * 6 * 6
        assert buf["origins"].shape == (n_lr, 16, 3)
        assert buf["rgbs_ori"].shape == (n_lr, 16, 3)
        assert buf["rgbs"].shape == (n_lr, 3)
        # avg-pool LR gt == mean over the 16 grouped sub-pixels
        np.testing.assert_allclose(buf["rgbs"], buf["rgbs_ori"].mean(1),
                                   atol=1e-5)

    def test_ungroup_matches_common(self, llff_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), downscale=4,
            batch_size=8, **_TINY)
        sys_ = create_model(opt)
        rng = np.random.RandomState(2)
        g = rng.rand(6 * 6, 16, 3).astype(np.float32)
        np.testing.assert_array_equal(
            sys_._ungroup(g),
            ungroup_subpixels(g, (24, 24), 4).reshape(-1, 3))


class TestRaygenDs4:
    """Device raygen must serve the GROUPED row order at ds=4 (the
    grouped-eval-dirs round trip VERDICT asks to pin)."""

    def _check(self, opt, idx=0):
        system = create_model(opt)
        ds = create_dataset(opt, "val")
        params = system.init_params(jax.random.PRNGKey(0))
        sample = ds.image_rays(idx)
        assert sample["origins"].shape[1] == 16
        want = system.render_image(params, sample, chunk=64)
        got = system._post_grouped(
            system.render_pose(params, ds.eval_raygen_spec(idx),
                               ds.eval_dirs(), chunk=64))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-4,
                                       atol=2e-5, err_msg=k)
        return want

    def test_llff_downx_ds4(self, llff_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), downscale=4,
            batch_size=8, **_TINY)
        out = self._check(opt)
        assert out["fine_rgb"].shape == (6 * 6, 3)       # LR
        assert out["fine_rgb_ori"].shape == (24 * 24, 3)  # HR
        assert out["fine_depth_ori"].shape == (24 * 24,)

    def test_blender_downx_ds4(self, blender_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="blender_downX",
            dataset_root=blender_scene, img_wh=(24, 24), downscale=4,
            batch_size=8, **_TINY)
        self._check(opt)


class TestTrainDs4:
    def test_fast_lv2_primary_descends(self, llff_scene):
        """The bench-primary two-round proposal config trains at ds=4."""
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), downscale=4,
            batch_size=8, fast_sampling=True, n_prop=6, n_prop_levels=2,
            n_prop2=4, prop_pad=0.01, prop_D=2, prop_W=16,
            include_var=True, **_TINY)
        sys_ = create_model(opt)
        ds = create_dataset(opt, "train")
        buffer = jax.tree_util.tree_map(jnp.asarray, ds.ray_buffer())
        state = sys_.create_state(jax.random.PRNGKey(0),
                                  steps_per_epoch=50)
        key = jax.random.PRNGKey(1)
        first = None
        for _ in range(30):
            state, losses = sys_.train_step_from_buffer(state, buffer,
                                                        key)
            if first is None:
                first = float(losses["fine_mse"])
        assert np.isfinite(float(losses["tot"]))
        assert float(losses["fine_mse"]) < first
