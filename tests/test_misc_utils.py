"""HTML gallery, image pool, infer-phase parsing, rand_dir."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_write_gallery(tmp_path):
    from PIL import Image
    from nerfsr_tpu.utils.html import write_gallery

    for i in range(3):
        Image.fromarray(
            (np.random.rand(8, 8, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"{i}-fine.png")
    page = write_gallery(str(tmp_path), title="t")
    html = open(page).read()
    assert "0-fine.png" in html and "<table>" in html


def test_image_pool_mixes():
    from nerfsr_tpu.utils.image_pool import ImagePool

    pool = ImagePool(pool_size=4, seed=0)
    a = np.zeros((4, 2, 2, 3), np.float32)
    out = pool.query(a)
    np.testing.assert_array_equal(out, a)  # buffer filling: passthrough
    b = np.ones((4, 2, 2, 3), np.float32)
    out = pool.query(b)
    assert out.shape == b.shape
    # after the pool is full, some returns may be historical zeros
    assert out.min() == 0.0 or out.max() == 1.0


def test_infer_phase_parses():
    from nerfsr_tpu.config import parse_options

    argv = ("--name x --dataset_mode llff --dataset_root /d "
            "--img_wh 8 8 --model nerf --load_epoch 3").split()
    opt = parse_options("infer", argv)
    assert opt.isInfer and not opt.isTrain
    assert hasattr(opt, "results_dir")


def test_blender_downx_rand_dir(tmp_path):
    from tools.make_synthetic_scene import make_scene
    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.data import create_dataset

    scene = str(tmp_path / "s")
    make_scene(scene, hw=(16, 16), n_train=2, n_val=1, n_test=1)
    kw = dict(dataset_mode="blender_downX", dataset_root=scene,
              img_wh=(16, 16), downscale=2)
    d1 = create_dataset(default_options("train", **kw), "train")
    d2 = create_dataset(default_options("train", rand_dir=True, **kw),
                        "train")
    # jittered dirs differ from pixel-center dirs but stay normalized
    assert not np.allclose(d1.directions, d2.directions)
    b = d2.ray_buffer()
    np.testing.assert_allclose(
        np.linalg.norm(b["directions"], axis=-1), 1.0, rtol=1e-5)


def test_scene_generator_golden_and_texture():
    """Guard the synthetic-scene generators: the DEFAULT (texture=False)
    render is the substrate of most e2e tests — its statistics must not
    drift — and the --texture variant must add real high-frequency
    content (it exists purely to give quality comparisons discriminating
    power; see tools/make_synthetic_scene.py:field)."""
    from tools.make_synthetic_llff import nerf_pose
    from tools.make_synthetic_scene import render_view

    c2w = nerf_pose(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    # 96px with the width-scaled focal (1.125*w) resolves the finest
    # texture component; the smooth render's stats are golden.
    img = render_view(c2w, (96, 96), 1.125 * 96, near=2.0, far=6.5)
    assert abs(float(img.mean()) - 0.82038) < 2e-3
    tex = render_view(c2w, (96, 96), 1.125 * 96, near=2.0, far=6.5,
                      texture=True)
    g_s = np.abs(np.diff(img, axis=1)).mean()
    g_t = np.abs(np.diff(tex, axis=1)).mean()
    assert g_t > 1.4 * g_s, (g_s, g_t)


def test_scene_generator_clutter_occludes():
    """--clutter adds thin near-opaque rods IN FRONT of the blobs (depth
    complexity: the blob-only scene has one soft surface per ray and
    rewards degenerate N_importance; see CLAUDE.md quality notes). The
    rods must change a meaningful fraction of pixels, and the LLFF
    generator must emit COLMAP points ON the rods, else the dataset's
    percentile near-bound clips them out of the sample range."""
    from tools.make_synthetic_llff import nerf_pose
    from tools.make_synthetic_scene import RODS, render_view

    c2w = nerf_pose(np.array([0.0, 0.0, 4.0]), np.zeros(3))
    tex = render_view(c2w, (64, 64), 1.125 * 64, near=2.0, far=6.5,
                      texture=True, n_samples=160)
    clut = render_view(c2w, (64, 64), 1.125 * 64, near=2.0, far=6.5,
                       texture=True, clutter=True, n_samples=160)
    changed = (np.abs(clut - tex).max(-1) > 0.1).mean()
    assert 0.05 < changed < 0.8, changed
    # rods sit in front of the blob cluster (z up to 1.4 - 2r, looking
    # from z=+4): their z range must not intersect the blob depths
    ra, rb, rr, _ = RODS
    assert float(min(ra[:, 2].min(), rb[:, 2].min())) > -0.5
    assert float(rr.min()) >= 0.03


def test_clutter_rods_clear_near_plane():
    """No rod surface may cross the render quadrature's near plane: the
    LLFF rig's cameras sit at world z ~ 4.0+-0.1 and quadrature starts
    at ray distance 2.0, so rod content above z ~ 1.7 would be clipped
    in some views and rendered in others — view-INCONSISTENT training
    images exactly on the occluders the cluttered benchmark exists to
    measure (tools/make_synthetic_scene.py:_make_rods)."""
    from tools.make_synthetic_scene import RODS

    ra, rb, rr, _ = RODS
    surf_z = np.maximum(ra[:, 2], rb[:, 2]) + 2 * rr  # quartic falloff
    # worst-case camera: eye z = 3.7 (-3 sigma), near = 2.0
    assert float(surf_z.max()) <= 3.7 - 2.0 - 0.2, surf_z.max()


def test_scene_generator_specular_is_view_dependent():
    """--specular (the third benchmark scene family) must (a) leave
    density untouched (geometry is view-independent; proposal sampling
    sees the same scene), (b) make radiance depend on the view
    direction with meaningful magnitude across the LLFF rig's ~17-deg
    camera span, and (c) keep the numpy/jax field twins bit-close."""
    from tools.make_synthetic_scene import field, render_view, \
        render_view_jax
    from tools.make_synthetic_llff import nerf_pose

    # shell points on blob 0 facing the camera rig (z > 0)
    rng = np.random.RandomState(0)
    n = rng.randn(256, 3)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = n[n[:, 2] > 0.2]
    pts = (n * 0.45).astype(np.float32)

    def vdirs(eye):
        d = pts - eye
        return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
            np.float32)

    e1 = np.array([0.65, 0.3, 4.0])
    e2 = np.array([-0.65, -0.25, 4.0])
    s1, r1 = field(pts, viewdirs=vdirs(e1))
    s2, r2 = field(pts, viewdirs=vdirs(e2))
    assert np.allclose(s1, s2)                       # (a)
    d = np.abs(r1 - r2)
    assert d.mean() > 0.01 and d.max() > 0.2, (d.mean(), d.max())  # (b)

    c2w = nerf_pose(np.array([0.3, -0.2, 4.0]), np.zeros(3))
    kw = dict(near=2.0, far=6.5, texture=True, specular=True,
              n_samples=64)
    a = render_view(c2w, (24, 32), 1.125 * 32, **kw)
    b = render_view_jax(c2w, (24, 32), 1.125 * 32, **kw)
    assert float(np.abs(a - b).max()) < 5e-3         # (c)


def test_render_view_jax_matches_numpy():
    """The jax twin of render_view generates every full-size benchmark
    scene; any drift in its duplicated field/compositing math would
    silently change the benchmark while the numpy-path tests stay
    green. Compare the twins pixelwise at a small size (all features
    on: texture + clutter)."""
    from tools.make_synthetic_llff import nerf_pose
    from tools.make_synthetic_scene import render_view, render_view_jax

    c2w = nerf_pose(np.array([0.3, -0.2, 4.0]), np.zeros(3))
    kw = dict(near=2.0, far=6.5, texture=True, clutter=True,
              n_samples=64)
    a = render_view(c2w, (32, 40), 1.125 * 40, **kw)
    b = render_view_jax(c2w, (32, 40), 1.125 * 40, **kw)
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 5e-3, np.abs(a - b).max()


def test_llff_generator_clutter_points_cover_rod_depths(tmp_path):
    """COLMAP points3D include rod-surface points when clutter=True so
    near/far percentile bounds (data/llff.py) span the occluders."""
    from nerfsr_tpu.data.colmap import read_points3d_binary
    from tools.make_synthetic_llff import make_llff_scene

    scene = make_llff_scene(str(tmp_path / "s"), hw=(24, 32), n_imgs=2,
                            texture=True, clutter=True)
    pts = read_points3d_binary(
        os.path.join(scene, "sparse/0/points3D.bin"))
    xyz = np.array([p.xyz for p in
                    (pts.values() if isinstance(pts, dict) else pts)])
    # rods live at z in [0.6 - len, 2.2 + len]; blobs at |z| < 1 —
    # points must reach in front of the blobs
    assert float(xyz[:, 2].max()) > 1.0, xyz[:, 2].max()


def test_llff_generator_focal_scales_with_width(tmp_path):
    """make_llff_scene writes a width-proportional focal (53-degree FOV
    at every size; the old fixed 45.0 framed full-size scenes as a dot)
    and the 40px test-scene focal is unchanged."""
    from nerfsr_tpu.data.colmap import read_cameras_binary
    from tools.make_synthetic_llff import make_llff_scene

    scene = make_llff_scene(str(tmp_path / "s"), hw=(30, 40), n_imgs=2)
    cams = read_cameras_binary(os.path.join(scene, "sparse/0/cameras.bin"))
    cam = cams[1] if isinstance(cams, dict) else cams[0]
    assert abs(float(cam.params[0]) - 45.0) < 1e-6
