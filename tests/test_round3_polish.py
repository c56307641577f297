"""Round-3 polish regressions (VERDICT r2 items):

- warm-up x patch-mode routing (weak #1)
- gifs emitted by engine.validate (missing #4)
- gan_patch honors --include_var like patch_buffer (weak #4)
- wgangp gan_step applies the gradient penalty (missing #5)
- vectorized tiles_for_image correspondence lookup is bit-identical to
  the reference's per-pixel scan order (weak #5)
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("bl_r3")
    make_scene(str(d), hw=(16, 16), n_train=2, n_val=2, n_test=1)
    return str(d)


class TestWarmupPatchMode:
    def test_warmup_with_patch_mode_runs(self, blender_scene, tmp_path):
        """--patch_size>1 + train_crop warm-up: warm steps use the flat
        step (the warm buffer has no image structure), patch sampling
        starts after warm-up — previously fed a flat (N, 3) buffer into
        train_step_patches (engine.py warm routing)."""
        from nerfsr_tpu.engine import train

        opt = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
            patch_size=4, N_coarse=4, N_importance=4, D=2, W=16,
            deg_pos=2, deg_dir=1, precision="f32", n_epochs=1,
            n_epochs_decay=0, steps_per_epoch=6, log_every=3,
            save_epoch_freq=0, val_epoch_freq=0, vis_epoch_freq=0,
            val_freq=0, checkpoints_dir=str(tmp_path / "ck"),
            summary_dir=str(tmp_path / "runs"), name="warm_patch")
        state = train(opt, warmup_mode="train_crop", warmup_iters=3)
        assert int(state.step) == 6

    def test_blender_image_buffer_structure(self, blender_scene):
        from nerfsr_tpu.data import create_dataset

        opt = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16))
        ds = create_dataset(opt, "train")
        buf = ds.image_buffer()
        flat = ds.ray_buffer()
        assert buf["rgbs"].shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(
            buf["origins"].reshape(-1, 3), flat["origins"])


class TestValidateGifs:
    def test_validate_emits_gif_per_level(self, blender_scene, tmp_path):
        """engine.validate writes per-level gifs alongside the stills
        (parity: models/nerf_model.py:355-392)."""
        from nerfsr_tpu.engine import validate
        from nerfsr_tpu.data import create_dataset
        from nerfsr_tpu.models import create_model

        opt = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
            N_coarse=4, N_importance=4, D=2, W=16, deg_pos=2, deg_dir=1,
            precision="f32")
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=10)
        val_ds = create_dataset(opt, "val")
        assert len(val_ds) >= 2
        out_dir = str(tmp_path / "val_vis")
        metrics = validate(opt, system, state.params, val_ds,
                           out_dir=out_dir)
        assert np.isfinite(metrics["fine_psnr"])
        names = os.listdir(out_dir)
        assert any(n.endswith(".gif") for n in names), names


class TestGanPatchIncludeVar:
    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        from tools.make_synthetic_llff import make_llff_scene
        d = tmp_path_factory.mktemp("llff_r3")
        make_llff_scene(str(d), hw=(32, 32), n_imgs=3)
        return str(d)

    def _ds(self, scene, include_var):
        from nerfsr_tpu.data import create_dataset
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=scene, img_wh=(32, 32), downscale=2,
            include_var=include_var, patch_len=16)
        return create_dataset(opt, "train")

    def test_usable_views_honor_include_var(self, scene):
        ds_ex = self._ds(scene, include_var=False)
        ds_in = self._ds(scene, include_var=True)
        assert ds_ex.val_idx not in ds_ex._usable_views()
        assert ds_in.val_idx in ds_in._usable_views()
        assert sorted(ds_in._usable_views()) == [0, 1, 2]

    def test_gan_patch_can_draw_val_view_with_include_var(self, scene):
        """gan_patch and patch_buffer share the view pool (previously
        gan_patch excluded the val view unconditionally)."""
        ds = self._ds(scene, include_var=True)

        class FixedRng:
            def randint(self, n):
                # first call selects the view: pick the val view's slot
                if not hasattr(self, "_first_done"):
                    self._first_done = True
                    return ds._usable_views().index(ds.val_idx)
                return 0

        patch = ds.gan_patch(FixedRng())
        assert patch["rgbs"].shape == (16, 16, 3)


class TestWganGpWired:
    def test_wgangp_gan_step_runs(self, tmp_path):
        from tools.make_synthetic_llff import make_llff_scene
        from nerfsr_tpu.data import create_dataset
        from nerfsr_tpu.models import create_model

        scene = str(tmp_path / "s")
        make_llff_scene(scene, hw=(64, 64), n_imgs=3)
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            dataset_root=scene, img_wh=(64, 64), downscale=2,
            batch_size=8, N_coarse=4, N_importance=4, D=2, W=16,
            deg_pos=2, deg_dir=1, precision="f32", n_epochs=1,
            n_epochs_decay=0, with_netD=True, patch_len=32,
            gan_mode="wgangp")
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0),
                                  steps_per_epoch=5)
        d_state = sys_.create_gan_state(jax.random.PRNGKey(1))
        ds = create_dataset(opt, "train")
        patch = jax.tree_util.tree_map(
            jnp.asarray, ds.gan_patch(np.random.RandomState(0)))
        old_d = jax.tree_util.tree_leaves(d_state["params"])[0].copy()
        state, d_state, losses = sys_.gan_step(
            state, d_state, patch, jax.random.PRNGKey(2))
        for k in ("G_GAN", "D_real", "D_fake"):
            assert np.isfinite(float(losses[k])), k
        new_d = jax.tree_util.tree_leaves(d_state["params"])[0]
        assert not np.allclose(np.asarray(old_d), np.asarray(new_d))


class TestTilesVectorized:
    @pytest.fixture(scope="class")
    def setup_scene(self, tmp_path_factory):
        """Scene + syntheses + RANDOM locs (mix of valid/invalid) so the
        first-k-valid selection order is actually exercised."""
        from tools.make_synthetic_llff import make_llff_scene
        from PIL import Image

        d = tmp_path_factory.mktemp("refine_r3")
        scene = str(d / "scene")
        make_llff_scene(scene, hw=(96, 96), n_imgs=3)
        syn = str(d / "syn")
        os.makedirs(syn)
        rng = np.random.RandomState(7)
        for i in range(3):
            img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(syn, f"{i}-fine-ori.png"))
            # ~60% of correspondences land outside the image => invalid
            locs = rng.uniform(-80, 176, size=(96, 96, 2)) \
                .astype(np.float32)
            np.savez(os.path.join(syn, f"{i}_locs.npz"), locs)
        return scene, syn

    def test_bit_identical_to_reference_scan_order(self, setup_scene):
        """The vectorized first-k-valid lookup must reproduce the
        reference's per-pixel double loop (x outer, y inner;
        llff_refine_dataset.py:273-285) patch for patch."""
        from nerfsr_tpu.data import create_dataset

        scene, syn = setup_scene
        opt = default_options(
            "train", model="refine", dataset_mode="llff_refine",
            dataset_root=scene, syn_dataroot=syn, img_wh=(96, 96),
            patch_len=32)
        ds = create_dataset(opt, "test_train")
        tiles = ds.tiles_for_image(0)

        # reference-semantics reimplementation (the old python loop)
        plen, k = 32, opt.num_ref_patches
        w, h = 96, 96
        locs = ds.locs[0]
        sr_img, ref_img = ds.sr_imgs[0], ds.ref_img
        expected = []
        for i in range(0, w, plen):
            for j in range(0, h, plen):
                xs, ys = min(w - plen, i), min(h - plen, j)
                ref_patch = []
                for m in range(xs, xs + plen):
                    for n in range(ys, ys + plen):
                        loc = locs[n, m]
                        if 0 <= loc[0] < w and 0 <= loc[1] < h:
                            rx = min(w - plen, int(loc[0]))
                            ry = min(h - plen, int(loc[1]))
                            ref_patch.append(
                                ref_img[ry:ry + plen, rx:rx + plen])
                            if len(ref_patch) >= k:
                                break
                    if len(ref_patch) >= k:
                        break
                while len(ref_patch) < k:
                    ref_patch.append(sr_img[ys:ys + plen, xs:xs + plen])
                expected.append(np.stack(ref_patch))
        np.testing.assert_array_equal(
            tiles["ref_patches"], np.stack(expected).astype(np.float32))
