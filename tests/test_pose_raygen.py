"""Device-side eval raygen (render_eval / render_pose) must match the
host-ray upload path (render_image) on every dataset family and split:
rays are generated on-chip from (direction grid, pose) instead of
shipping the full ray bundle per image (SURVEY.md §7 'Data pipeline
memory'; upload measured at 520 ms/image vs 284 ms compute on the
tunneled v5e)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.data import create_dataset
from nerfsr_tpu.models import create_model


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    from tools.make_synthetic_llff import make_llff_scene
    d = tmp_path_factory.mktemp("llff_pr")
    make_llff_scene(str(d), hw=(24, 24), n_imgs=4)
    return str(d)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("bl_pr")
    make_scene(str(d), hw=(16, 16), n_train=2, n_val=2, n_test=2)
    return str(d)


_TINY = dict(N_coarse=4, N_importance=4, D=2, W=16, deg_pos=2,
             deg_dir=1, precision="f32", white_bkgd=False, noise_std=0.0)


def _assert_paths_match(system, dataset, idx, chunk=64):
    params = system.init_params(jax.random.PRNGKey(0))
    sample = dataset.image_rays(idx)
    want = system.render_image(params, sample, chunk=chunk)
    spec = dataset.eval_raygen_spec(idx)
    if hasattr(system, "_post_grouped"):
        got = system._post_grouped(
            system.render_pose(params, spec, dataset.eval_dirs(),
                               chunk=chunk))
    else:
        got = system.render_pose(params, spec, dataset.eval_dirs(),
                                 chunk=chunk)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4,
                                   atol=2e-5, err_msg=k)
    # the dispatching front door picks the pose path and agrees too
    via_eval = system.render_eval(params, dataset, idx, sample)
    for k in want:
        np.testing.assert_allclose(via_eval[k], want[k], rtol=1e-4,
                                   atol=2e-5, err_msg=k)


class TestBlender:
    def test_val_image(self, blender_scene):
        opt = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
            **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)


class TestLLFF:
    def test_val_ndc(self, llff_scene):
        opt = default_options(
            "train", model="nerf", dataset_mode="llff",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
            **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)

    def test_spiral_test_split(self, llff_scene):
        opt = default_options(
            "test", model="nerf", dataset_mode="llff",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
            **_TINY)
        ds = create_dataset(opt, "test")
        _assert_paths_match(create_model(opt), ds, 3)

    def test_spheric(self, llff_scene):
        opt = default_options(
            "test", model="nerf", dataset_mode="llff",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
            spheric_poses=True, **_TINY)
        ds = create_dataset(opt, "test")
        _assert_paths_match(create_model(opt), ds, 1)

    def test_test_viewdir_fixed_pose(self, llff_scene):
        opt = default_options(
            "test", model="nerf", dataset_mode="llff",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
            **_TINY)
        ds = create_dataset(opt, "test_viewdir")
        _assert_paths_match(create_model(opt), ds, 2)


class TestDirsCache:
    def test_same_shape_different_grid_not_stale(self, blender_scene):
        """Two datasets with identically-shaped but different direction
        grids must not serve each other's cached device upload (the
        cache compares the host array by identity, not address reuse)."""
        opt_a = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
            use_pixel_centers=True, **_TINY)
        opt_b = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
            use_pixel_centers=False, **_TINY)
        ds_a = create_dataset(opt_a, "val")
        ds_b = create_dataset(opt_b, "val")
        system = create_model(opt_a)
        params = system.init_params(jax.random.PRNGKey(0))
        # prime the cache with A's grid, then render B at the same shape
        system.render_pose(params, ds_a.eval_raygen_spec(0),
                           ds_a.eval_dirs(), chunk=64)
        got_b = system.render_pose(params, ds_b.eval_raygen_spec(0),
                                   ds_b.eval_dirs(), chunk=64)
        want_b = system.render_image(params, ds_b.image_rays(0),
                                     chunk=64)
        np.testing.assert_allclose(got_b["fine_rgb"], want_b["fine_rgb"],
                                   rtol=1e-4, atol=2e-5)
        # bounded: one entry per (n, chunk), replaced not appended
        assert len(system._eval_dirs_cache) == 1


class TestMeshEval:
    def test_sharded_pose_render_matches_single(self, llff_scene):
        """8-virtual-device mesh eval: each chunk's rays row-shard over
        the data mesh; result must match the unsharded render."""
        from nerfsr_tpu.parallel.mesh import make_mesh, replicate

        opt = default_options(
            "train", model="nerf", dataset_mode="llff",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
            **_TINY)
        ds = create_dataset(opt, "val")
        single = create_model(opt)
        params = single.init_params(jax.random.PRNGKey(0))
        want = single.render_pose(params, ds.eval_raygen_spec(0),
                                  ds.eval_dirs(), chunk=64)

        mesh = make_mesh(8)
        sharded_sys = create_model(opt).use_mesh(mesh)
        params_r = replicate(params, mesh)
        got = sharded_sys.render_pose(params_r, ds.eval_raygen_spec(0),
                                      ds.eval_dirs(), chunk=64)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)


class TestDownX:
    def test_llff_downx_grouped(self, llff_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
            downscale=2, **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)

    def test_llff_downx_unified_dir(self, llff_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
            downscale=2, unified_dir=True, **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)

    def test_blender_downx_grouped(self, blender_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="blender_downX",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=16,
            downscale=2, **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)

    def test_llff_downx_spiral_test_split(self, llff_scene):
        opt = default_options(
            "test", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
            downscale=2, **_TINY)
        ds = create_dataset(opt, "test")
        _assert_paths_match(create_model(opt), ds, 5)

    def test_fast_sampling_pose_path(self, llff_scene):
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
            downscale=2, fast_sampling=True, n_prop=4, prop_D=2,
            prop_W=16, **_TINY)
        ds = create_dataset(opt, "val")
        _assert_paths_match(create_model(opt), ds, 0)
