"""Native (C++) ray builder vs the numpy reference implementations."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu import native
from nerfsr_tpu.data.blender import _ray_dirs_np, rays_from_pose
from nerfsr_tpu.data.llff import ndc_rays_np


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    root = os.path.join(os.path.dirname(__file__), "..")
    if not native.available():
        subprocess.run(["sh", os.path.join(root, "tools",
                                           "build_native.sh")],
                       check=True)
        # force reload of the lazy handle
        native._lib = None
    assert native.available()


def _poses(n, rng):
    from nerfsr_tpu.data.colmap import qvec2rotmat
    out = []
    for _ in range(n):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = qvec2rotmat(q)
        t = rng.randn(3)
        out.append(np.concatenate([R, t[:, None]], 1))
    return np.stack(out).astype(np.float32)


def test_world_rays_match_numpy():
    rng = np.random.RandomState(0)
    c2w = _poses(3, rng)
    h, w, focal = 12, 16, 20.0
    o_nat, d_nat = native.build_rays(c2w, h, w, focal)
    cam = _ray_dirs_np(h, w, focal, True)
    for i in range(3):
        ro, rd = rays_from_pose(cam, c2w[i])
        np.testing.assert_allclose(o_nat[i], ro, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(d_nat[i], rd, rtol=1e-5, atol=1e-6)


def test_ndc_rays_match_numpy():
    rng = np.random.RandomState(1)
    # forward-facing poses: camera at +z looking at origin
    from tools.make_synthetic_llff import nerf_pose
    c2w = np.stack([
        nerf_pose(np.array([0.2 * i - 0.2, 0.1, 4.0]), np.zeros(3))
        for i in range(3)]).astype(np.float32)
    h, w, focal = 10, 14, 18.0
    o_nat, d_nat = native.build_rays(c2w, h, w, focal, apply_ndc=True)
    cam = _ray_dirs_np(h, w, focal, True)
    for i in range(3):
        ro, rd = rays_from_pose(cam, c2w[i])
        ro, rd = ndc_rays_np(h, w, focal, 1.0, ro.reshape(-1, 3),
                             rd.reshape(-1, 3))
        np.testing.assert_allclose(o_nat[i].reshape(-1, 3), ro,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(d_nat[i].reshape(-1, 3), rd,
                                   rtol=1e-4, atol=1e-5)


def test_no_pixel_centers():
    rng = np.random.RandomState(2)
    c2w = _poses(1, rng)
    o, d = native.build_rays(c2w, 6, 6, 9.0, use_pixel_centers=False)
    cam = _ray_dirs_np(6, 6, 9.0, False)
    ro, rd = rays_from_pose(cam, c2w[0])
    np.testing.assert_allclose(d[0], rd, rtol=1e-5, atol=1e-6)
