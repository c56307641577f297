"""Data-layer tests: blender + LLFF datasets on synthetic scenes,
COLMAP round trip, pose math invariants."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.data import create_dataset
from nerfsr_tpu.data.colmap import (Camera, ColmapImage, Point3D,
                                    qvec2rotmat, rotmat2qvec, read_model,
                                    write_cameras_binary,
                                    write_images_binary,
                                    write_points3d_binary)
from nerfsr_tpu.data.llff import average_pose, center_poses, spiral_path


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("blender")
    make_scene(str(d), hw=(24, 24), n_train=3, n_val=1, n_test=1)
    return str(d)


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    from tools.make_synthetic_llff import make_llff_scene
    d = tmp_path_factory.mktemp("llff")
    make_llff_scene(str(d), hw=(24, 24), n_imgs=5)
    return str(d)


class TestColmapRoundTrip:
    def test_qvec_rotmat_inverse(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = qvec2rotmat(q)
            q2 = rotmat2qvec(R)
            np.testing.assert_allclose(np.abs(q2), np.abs(q), atol=1e-6)
            np.testing.assert_allclose(qvec2rotmat(q2), R, atol=1e-6)

    def test_write_read(self, tmp_path):
        d = str(tmp_path)
        cams = [Camera(1, "SIMPLE_PINHOLE", 64, 48,
                       np.array([50.0, 32.0, 24.0]))]
        q = np.array([1.0, 0, 0, 0])
        imgs = [ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png"),
                ColmapImage(2, q, np.array([0.4, 0.5, 0.6]), 1, "b.png")]
        pts = [Point3D(7, np.array([1.0, 2, 3]),
                       np.array([10, 20, 30], np.uint8), 0.5,
                       np.array([1, 2], np.int32),
                       np.array([0, 0], np.int32))]
        write_cameras_binary(cams, os.path.join(d, "cameras.bin"))
        write_images_binary(imgs, os.path.join(d, "images.bin"))
        write_points3d_binary(pts, os.path.join(d, "points3D.bin"))
        rc, ri, rp = read_model(d)
        assert rc[1].params[0] == 50.0 and rc[1].width == 64
        assert ri[2].name == "b.png"
        np.testing.assert_allclose(ri[1].tvec, [0.1, 0.2, 0.3])
        np.testing.assert_allclose(rp[7].xyz, [1.0, 2, 3])
        assert list(rp[7].image_ids) == [1, 2]

    def test_images_text_zero_observation_image(self, tmp_path):
        """COLMAP's images.txt has TWO lines per image; the POINTS2D
        line is EMPTY for an image with zero observations. Regression:
        filtering blank lines desynced the header/points pairing from
        the first unobserved image on (crash or silently dropped
        images)."""
        from nerfsr_tpu.data.colmap import read_images_text

        txt = (
            "# images.txt\n"
            "1 1 0 0 0 0.1 0.2 0.3 1 a.png\n"
            "\n"  # zero observations
            "2 1 0 0 0 0.4 0.5 0.6 1 b.png\n"
            "1.5 2.5 7\n")
        p = tmp_path / "images.txt"
        p.write_text(txt)
        imgs = read_images_text(str(p))
        assert set(imgs) == {1, 2}
        assert imgs[1].name == "a.png" and len(imgs[1].xys) == 0
        assert imgs[2].name == "b.png" and len(imgs[2].xys) == 1
        np.testing.assert_allclose(imgs[2].xys[0], [1.5, 2.5])
        assert list(imgs[2].point3d_ids) == [7]


class TestPoseMath:
    def test_center_poses_average_is_identity(self):
        rng = np.random.RandomState(1)
        poses = []
        for _ in range(6):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            R = qvec2rotmat(q)
            t = rng.randn(3)
            poses.append(np.concatenate([R, t[:, None]], 1))
        poses = np.stack(poses)
        centered, _ = center_poses(poses)
        avg = average_pose(centered)
        np.testing.assert_allclose(avg, np.eye(4)[:3], atol=1e-6)

    def test_spiral_orthonormal(self):
        poses = spiral_path(np.array([0.5, 0.5, 0.2]), 3.5, n_poses=10)
        assert poses.shape == (10, 3, 4)
        for p in poses:
            R = p[:, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)


class TestBlenderDataset:
    def test_buffer_and_eval(self, blender_scene):
        opt = default_options("train", dataset_mode="blender",
                              dataset_root=blender_scene, img_wh=(24, 24))
        ds = create_dataset(opt, "train")
        buf = ds.ray_buffer()
        assert buf["origins"].shape == (3 * 24 * 24, 3)
        np.testing.assert_allclose(
            np.linalg.norm(buf["directions"], axis=-1), 1.0, rtol=1e-5)
        assert buf["near"][0, 0] == 2.0 and buf["far"][0, 0] == 6.0
        assert buf["rgbs"].min() >= 0 and buf["rgbs"].max() <= 1

        val = create_dataset(opt, "val")
        s = val.image_rays(0)
        assert s["rgbs"].shape == (24 * 24, 3)
        assert s["valid_mask"].shape == (24 * 24,)

    def test_train_crop_smaller(self, blender_scene):
        opt = default_options("train", dataset_mode="blender",
                              dataset_root=blender_scene, img_wh=(24, 24),
                              precrop_frac=0.5)
        full = create_dataset(opt, "train").ray_buffer()
        crop = create_dataset(opt, "train_crop").ray_buffer()
        assert len(crop["origins"]) == len(full["origins"]) // 4


class TestLLFFDataset:
    def test_train_buffer_ndc(self, llff_scene):
        opt = default_options("train", dataset_mode="llff",
                              dataset_root=llff_scene, img_wh=(24, 24))
        ds = create_dataset(opt, "train")
        buf = ds.ray_buffer()
        # one image held out for val
        assert buf["origins"].shape == (4 * 24 * 24, 3)
        # NDC near/far
        assert buf["near"][0, 0] == 0.0 and buf["far"][0, 0] == 1.0
        # NDC origins live on the near plane cube
        assert np.abs(buf["origins"]).max() < 4.0
        # viewdirs == post-NDC directions (reference 11-col packing)
        np.testing.assert_array_equal(buf["viewdirs"], buf["directions"])

    def test_include_var_keeps_all(self, llff_scene):
        opt = default_options("train", dataset_mode="llff",
                              dataset_root=llff_scene, img_wh=(24, 24),
                              include_var=True)
        buf = create_dataset(opt, "train").ray_buffer()
        assert buf["origins"].shape == (5 * 24 * 24, 3)

    def test_val_and_test_paths(self, llff_scene):
        opt = default_options("train", dataset_mode="llff",
                              dataset_root=llff_scene, img_wh=(24, 24))
        val = create_dataset(opt, "val")
        s = val.image_rays(0)
        assert s["rgbs"].shape == (24 * 24, 3)

        test = create_dataset(opt, "test")
        assert len(test) == 120  # spiral path
        s = test.image_rays(0)
        assert s["rgbs"] is None
        assert s["origins"].shape == (24 * 24, 3)

        tt = create_dataset(opt, "test_train")
        assert len(tt) == 5
        assert tt.image_rays(2)["rgbs"] is not None

    def test_depth_bounds_scaled(self, llff_scene):
        opt = default_options("train", dataset_mode="llff",
                              dataset_root=llff_scene, img_wh=(24, 24))
        ds = create_dataset(opt, "train")
        # world rescale puts nearest depth at 1/0.75 ~= 1.33
        np.testing.assert_allclose(ds.bounds.min(), 1.0 / 0.75, rtol=1e-5)
