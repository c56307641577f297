#!/usr/bin/env python
"""Generate a tiny synthetic LLFF-format scene (COLMAP binaries + images).

Forward-facing cameras on a small grid render the analytic blob field from
``make_synthetic_scene``; the COLMAP sparse model (cameras.bin /
images.bin / points3D.bin) is written with our own writer, so loading it
exercises the full parser + pose pipeline end to end.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfsr_tpu.data.colmap import (Camera, ColmapImage, Point3D,
                                    rotmat2qvec, write_cameras_binary,
                                    write_images_binary,
                                    write_points3d_binary)
from tools.make_synthetic_scene import BLOBS, render_view


def nerf_pose(eye, target):
    """c2w in NeRF convention (right, up, back; looks along -z)."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    z = -forward
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], 1)


def make_llff_scene(out_dir, hw=(40, 40), n_imgs=6, seed=0,
                    texture=False, clutter=False, specular=False):
    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = hw
    # scale focal with width: ~53 degree horizontal FOV, so the blob
    # cluster fills the frame at ANY resolution (identical to the old
    # fixed 45.0 at the 40px test size; at 504px the old value framed
    # the scene as a ~16px dot in a white field — trivially learnable,
    # which silently capped what flagship quality runs could measure).
    focal = 1.125 * w
    sparse = os.path.join(out_dir, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    cams = [Camera(1, "SIMPLE_PINHOLE", w, h,
                   np.array([focal, w / 2, h / 2], float))]
    write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))

    # forward-facing rig: cameras at z ~ +4 with small lateral offsets,
    # all looking at the origin region.
    images = []
    poses = []
    for i in range(n_imgs):
        eye = np.array([
            (i % 3 - 1) * 0.6 + rng.randn() * 0.05,
            (i // 3 - 0.5) * 0.5 + rng.randn() * 0.05,
            4.0 + rng.randn() * 0.1])
        c2w = nerf_pose(eye, np.zeros(3))
        poses.append(c2w)
        # clutter rods are thin (radius >= 0.035 world units): step the
        # generator's own quadrature down to ~0.014 so they are resolved
        rv = render_view
        if h * w >= 128 * 128:
            # full-size generation is ~8 min/image in numpy on this
            # 1-core host; the jitted twin renders it in seconds
            # (tiny test scenes keep numpy — not worth a compile)
            try:
                from tools.make_synthetic_scene import render_view_jax
                rv = render_view_jax
            except Exception:
                pass
        img = rv(c2w, hw, focal, near=2.0, far=6.5,
                 texture=texture, clutter=clutter, specular=specular,
                 n_samples=320 if clutter else
                 (256 if (texture or specular) else 96))
        name = f"img_{i:03d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))

        # NeRF c2w -> COLMAP w2c (x right, y down, z forward)
        colmap_c2w_r = np.stack(
            [c2w[:, 0], -c2w[:, 1], -c2w[:, 2]], 1)
        R = colmap_c2w_r.T
        t = -R @ c2w[:, 3]
        images.append(ColmapImage(
            i + 1, rotmat2qvec(R), t, 1, name))

    # 3D points sampled inside the blobs, visible from all images
    pts = []
    pid = 1
    for c, r, col, _ in BLOBS:
        for _ in range(40):
            xyz = c + rng.randn(3) * (r / 3)
            pts.append(Point3D(
                pid, xyz, (np.asarray(col) * 255).astype(np.uint8), 0.1,
                np.arange(1, n_imgs + 1, dtype=np.int32),
                np.zeros(n_imgs, np.int32)))
            pid += 1
    if clutter:
        # rod-surface points too: the LLFF near/far bounds are depth
        # PERCENTILES of these points (data/llff.py), and the rods sit
        # well in FRONT of the blobs — without points on them the near
        # plane would clip the rods out of every ray's sample range.
        from tools.make_synthetic_scene import RODS
        ra, rb, rr, rcol = RODS
        for k in range(len(rr)):
            for _ in range(12):
                xyz = (ra[k] + rng.rand() * (rb[k] - ra[k])
                       + rng.randn(3) * rr[k] * 0.5)
                pts.append(Point3D(
                    pid, xyz, (rcol[k] * 255).astype(np.uint8), 0.1,
                    np.arange(1, n_imgs + 1, dtype=np.int32),
                    np.zeros(n_imgs, np.int32)))
                pid += 1
    write_images_binary(images, os.path.join(sparse, "images.bin"))
    write_points3d_binary(pts, os.path.join(sparse, "points3D.bin"))
    return out_dir


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--hw", type=int, nargs=2, default=[40, 40])
    p.add_argument("--n_imgs", type=int, default=6)
    p.add_argument("--texture", action="store_true",
                   help="high-frequency procedural albedo (needed for "
                        "config-discriminating quality comparisons)")
    p.add_argument("--clutter", action="store_true",
                   help="thin near-opaque occluder rods (depth "
                        "complexity; discriminates sample counts)")
    p.add_argument("--specular", action="store_true",
                   help="Phong-shaded blobs with tight view-dependent "
                        "highlights (stresses the dir-conditioned MLP)")
    args = p.parse_args()
    make_llff_scene(args.out_dir, tuple(args.hw), args.n_imgs,
                    texture=args.texture, clutter=args.clutter,
                    specular=args.specular)
    print(f"llff scene written to {args.out_dir}")
