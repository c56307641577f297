"""Supersampling (downX) tests: grouping conventions, subpixel averaging,
variance losses, end-to-end training + dual-resolution eval."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.data import create_dataset
from nerfsr_tpu.data.downx_common import group_subpixels, ungroup_subpixels
from nerfsr_tpu.models import create_model
from nerfsr_tpu.models.nerf_downx_system import subpixel_mean, subpixel_var


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("blender_dx")
    make_scene(str(d), hw=(24, 24), n_train=3, n_val=1, n_test=1)
    return str(d)


def dx_opt(scene, **kw):
    base = dict(
        model="nerf_downX", dataset_mode="blender_downX",
        dataset_root=scene, img_wh=(24, 24), downscale=2, batch_size=16,
        N_coarse=8, N_importance=8, D=2, W=32, deg_pos=4, deg_dir=2,
        precision="f32", n_epochs=2, n_epochs_decay=1,
        white_bkgd=True, noise_std=0.0)
    base.update(kw)
    return default_options("train", **base)


class TestGrouping:
    def test_round_trip(self):
        rng = np.random.RandomState(0)
        x = rng.rand(8, 12, 3).astype(np.float32)
        g = group_subpixels(x, 2)
        assert g.shape == (4 * 6, 4, 3)
        np.testing.assert_array_equal(ungroup_subpixels(g, (8, 12), 2), x)

    def test_block_order_matches_reference_einops(self):
        # '(h s1) (w s2) c -> (h w) (s1 s2) c': block (0,0) holds pixels
        # [(0,0),(0,1),(1,0),(1,1)] in row-major order
        x = np.arange(4 * 4).reshape(4, 4, 1)
        g = group_subpixels(x, 2)
        np.testing.assert_array_equal(g[0, :, 0], [0, 1, 4, 5])
        np.testing.assert_array_equal(g[1, :, 0], [2, 3, 6, 7])

    def test_subpixel_mean_var(self):
        rng = np.random.RandomState(1)
        x = rng.rand(6 * 4, 3).astype(np.float32)  # 6 LR px, ds2=4
        m = np.asarray(subpixel_mean(jnp.asarray(x), 4))
        np.testing.assert_allclose(m, x.reshape(6, 4, 3).mean(1),
                                   rtol=1e-6)
        v = float(subpixel_var(jnp.asarray(x), 4))
        np.testing.assert_allclose(
            v, x.reshape(6, 4, 3).var(1, ddof=1).sum() *
            0 + np.sum(np.var(x.reshape(6, 4, 3), axis=1, ddof=1)),
            rtol=1e-5)


class TestDownXDataset:
    def test_buffer_shapes(self, blender_scene):
        opt = dx_opt(blender_scene)
        ds = create_dataset(opt, "train")
        buf = ds.ray_buffer()
        n_lr = 3 * (24 // 2) * (24 // 2)
        assert buf["origins"].shape == (n_lr, 4, 3)
        assert buf["rgbs"].shape == (n_lr, 3)
        assert buf["rgbs_ori"].shape == (n_lr, 4, 3)

    def test_lr_gt_is_block_mean_with_avg(self, blender_scene):
        opt = dx_opt(blender_scene, ds_method="avg")
        buf = create_dataset(opt, "train").ray_buffer()
        np.testing.assert_allclose(
            buf["rgbs"], buf["rgbs_ori"].mean(1), atol=1e-5)

    def test_subray_geometry(self, blender_scene):
        # the 4 sub-rays of one LR pixel share an origin and have close
        # but distinct directions
        opt = dx_opt(blender_scene)
        buf = create_dataset(opt, "train").ray_buffer()
        o = buf["origins"][0]
        np.testing.assert_allclose(o, np.broadcast_to(o[0], o.shape),
                                   atol=1e-6)
        d = buf["directions"][0]
        assert not np.allclose(d[0], d[1])
        assert np.dot(d[0], d[1]) > 0.99  # nearly parallel

    def test_train_crop_is_quarter(self, blender_scene):
        opt = dx_opt(blender_scene, precrop_frac=0.5)
        full = create_dataset(opt, "train").ray_buffer()
        crop = create_dataset(opt, "train_crop").ray_buffer()
        assert len(crop["rgbs"]) == len(full["rgbs"]) // 4

    def test_crop_bounds_block_aligned_when_center_is_not(self):
        """h//2 not a multiple of ds (h=36, ds=4 -> 18 % 4 == 2): the
        crop window START must round to a ds block, or the grouped
        'LR pixels' of the cropped rays straddle two real ds x ds
        blocks and the LR crop shifts by h//2 % ds HR pixels relative
        to them (regression)."""
        from types import SimpleNamespace

        from nerfsr_tpu.data.blender_downx import BlenderDownXDataset

        d = object.__new__(BlenderDownXDataset)
        d.img_wh = (36, 36)
        d.ds = 4
        d.opt = SimpleNamespace(precrop_frac=0.5)
        y0, y1, x0, x1 = d._hr_crop_bounds()
        for v in (y0, x0, y1 - y0, x1 - x0):
            assert v % 4 == 0, (y0, y1, x0, x1)
        assert 0 <= y0 and y1 <= 36 and y1 > y0
        # LR crop derives from the SAME bounds (exact /ds relation)
        hr = np.arange(36 * 36 * 3, dtype=np.float32).reshape(36, 36, 3)
        lr = hr.reshape(9, 4, 9, 4, 3).mean((1, 3))
        hr_c = d._crop_hr(hr)
        lr_c = d._crop_lr(lr)
        np.testing.assert_allclose(
            lr_c, hr_c.reshape(lr_c.shape[0], 4, lr_c.shape[1], 4,
                               3).mean((1, 3)), rtol=1e-6)


class TestDownXSystem:
    def test_train_descends_and_var_losses(self, blender_scene):
        opt = dx_opt(blender_scene, use_var_loss=True,
                     use_depth_var_loss=True)
        sys_ = create_model(opt)
        ds = create_dataset(opt, "train")
        buffer = jax.tree_util.tree_map(jnp.asarray, ds.ray_buffer())
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=50)
        key = jax.random.PRNGKey(1)
        first = None
        for _ in range(25):
            state, losses = sys_.train_step_from_buffer(state, buffer, key)
            if first is None:
                first = float(losses["fine_mse"])
        assert np.isfinite(float(losses["tot"]))
        assert float(losses["fine_mse"]) < first
        for name in ("out_coarse_var", "out_fine_var", "coarse_depth_var",
                     "fine_depth_var", "coarse_psnr_ori", "fine_psnr_ori"):
            assert name in losses and np.isfinite(float(losses[name]))

    def test_eval_dual_resolution(self, blender_scene):
        opt = dx_opt(blender_scene)
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        val = create_dataset(opt, "val")
        sample = val.image_rays(0)
        out = sys_.render_image(state.params, sample, chunk=256)
        hl = wl = 12
        assert out["fine_rgb"].shape == (hl * wl, 3)
        assert out["fine_rgb_ori"].shape == (24 * 24, 3)
        assert out["fine_depth_ori"].shape == (24 * 24,)
        m = sys_.eval_metrics(out, sample)
        assert "fine_psnr_ori" in m and np.isfinite(m["fine_psnr_ori"])
        vis = sys_.eval_visuals(out, sample, 0, True, val.depth_bounds)
        names = [v.name for v in vis]
        assert "0-fine-ori" in names
        assert "0-fine-depth-ori" in names  # the warp.py input artifact

    def test_ungroup_matches_common(self, blender_scene):
        opt = dx_opt(blender_scene)
        sys_ = create_model(opt)
        rng = np.random.RandomState(2)
        g = rng.rand(12 * 12, 4, 3).astype(np.float32)
        np.testing.assert_array_equal(
            sys_._ungroup(g),
            ungroup_subpixels(g, (24, 24), 2).reshape(-1, 3))

    def test_reg_patch_step(self, blender_scene):
        opt = dx_opt(blender_scene, reg_patch_len=3)
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        # build one fake grouped patch batch (plen^2 LR px)
        rng = np.random.RandomState(3)
        n = 9
        d = rng.randn(n, 4, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {
            "origins": jnp.asarray(rng.randn(n, 4, 3).astype(np.float32)),
            "directions": jnp.asarray(d),
            "near": jnp.full((n, 4, 1), 2.0),
            "far": jnp.full((n, 4, 1), 6.0),
        }
        state, losses = sys_.reg_patch_step(state, batch,
                                            jax.random.PRNGKey(4))
        assert np.isfinite(float(losses["patch"]))


class TestLLFFDownXOptions:
    @pytest.fixture(scope="class")
    def llff_scene(self, tmp_path_factory):
        from tools.make_synthetic_llff import make_llff_scene
        d = tmp_path_factory.mktemp("llff_dx")
        make_llff_scene(str(d), hw=(24, 24), n_imgs=4)
        return str(d)

    def _opt(self, scene, **kw):
        base = dict(dataset_mode="llff_downX", dataset_root=scene,
                    img_wh=(24, 24), downscale=2, model="nerf_downX")
        base.update(kw)
        from nerfsr_tpu.config import default_options
        return default_options("train", **base)

    def test_unified_dir_repeats_lr_grid(self, llff_scene):
        from nerfsr_tpu.data import create_dataset

        ds = create_dataset(self._opt(llff_scene, unified_dir=True),
                            "train")
        d = ds.directions  # (24, 24, 3) HR grid of repeated LR dirs
        np.testing.assert_allclose(d[0, 0], d[0, 1], atol=1e-7)
        np.testing.assert_allclose(d[0, 0], d[1, 1], atol=1e-7)
        assert not np.allclose(d[0, 0], d[0, 2])

    def test_sisr_supervision_buffer(self, llff_scene, tmp_path):
        from PIL import Image
        from nerfsr_tpu.data import create_dataset

        sisr = tmp_path / "sisr"
        sisr.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray((rng.rand(24, 24, 3) * 255).astype(
                np.uint8)).save(sisr / f"{i:03d}.png")
        ds = create_dataset(
            self._opt(llff_scene, sisr_path=str(sisr)), "train")
        buf = ds.ray_buffer()
        assert "rgbs_sr" in buf
        assert buf["rgbs_sr"].shape == buf["rgbs_ori"].shape

    def test_use_subset(self, llff_scene):
        from nerfsr_tpu.data import create_dataset

        ds = create_dataset(
            self._opt(llff_scene, use_subset=True, subset_num=2,
                      include_var=True), "train")
        buf = ds.ray_buffer()
        assert buf["rgbs"].shape[0] == 2 * 12 * 12

    def test_ref_buffer_flat(self, llff_scene):
        from nerfsr_tpu.data import create_dataset

        ds = create_dataset(self._opt(llff_scene), "train")
        ref = ds.ref_buffer()
        assert ref["origins"].shape == (24 * 24, 3)
        assert ref["rgbs"].shape == (24 * 24, 3)

    def test_ref_buffer_rows_pair_rays_with_their_pixels(self,
                                                         llff_scene):
        """Every ref_buffer row must hold a ray AND the color of the
        pixel that ray shoots through — both flatten in GROUPED order
        (the reference groups both, llff_downX_dataset.py:327-333 +
        :355-359). Regression: rgbs used raster order while the rays
        were grouped, silently mis-pairing nearly every --with_ref
        supervision sample for ds>1."""
        from nerfsr_tpu.data import create_dataset
        from nerfsr_tpu.data.blender import load_image
        from nerfsr_tpu.data.downx_common import ungroup_subpixels

        ds = create_dataset(self._opt(llff_scene), "train")
        ref = ds.ref_buffer()
        dsf = 2
        # ungrouping the flat rows must recover RASTER-order data:
        # directions -> the NDC-warped full-image grid, rgbs -> the
        # image itself (if either were flattened in a different order
        # the ungroup would scramble it)
        grouped_dirs = ref["directions"].reshape(-1, dsf * dsf, 3)
        raster_dirs = ungroup_subpixels(grouped_dirs, (24, 24), dsf)
        full = ds._pose_rays_grouped(ds.poses[0])
        expect_dirs = ungroup_subpixels(full["directions"], (24, 24),
                                        dsf)
        np.testing.assert_allclose(raster_dirs, expect_dirs, atol=1e-6)
        grouped_rgb = ref["rgbs"].reshape(-1, dsf * dsf, 3)
        raster_rgb = ungroup_subpixels(grouped_rgb, (24, 24), dsf)
        img = load_image(ds.image_paths[0], (24, 24))
        np.testing.assert_allclose(raster_rgb, img, atol=1e-6)
