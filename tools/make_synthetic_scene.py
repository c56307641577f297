#!/usr/bin/env python
"""Generate a tiny procedural NeRF-synthetic (blender-format) scene.

Renders an analytic radiance field (three colored gaussian density blobs)
with our own volume renderer from inward-facing cameras on a sphere, and
writes ``transforms_{train,val,test}.json`` + PNGs in the layout
``data/blender_dataset.py`` expects. Used by the e2e smoke tests and CLI
verification — no external datasets exist in this environment.
"""

from __future__ import annotations

import json
import os

import numpy as np

BLOBS = [  # (center, radius, color, peak density)
    (np.array([0.0, 0.0, 0.0]), 0.7, np.array([0.9, 0.2, 0.2]), 12.0),
    (np.array([0.9, 0.3, 0.2]), 0.45, np.array([0.2, 0.8, 0.3]), 15.0),
    (np.array([-0.6, -0.5, 0.5]), 0.5, np.array([0.2, 0.3, 0.9]), 15.0),
]


def field(pts, texture=False):
    """Analytic sigma/rgb at world points (N, 3).

    ``texture=True`` multiplies each blob's albedo by a multi-frequency
    procedural 3-D texture (incommensurate sinusoid products down to
    ~0.15 world units ~ 1-2 HR pixels at the default camera rigs). The
    smooth blobs alone are so easy that ANY NeRF config saturates the
    supersampling data ceiling within ~100 steps (measured: every
    config converges to val PSNR 30.8198 on the 504x378 LLFF scene, to
    five decimals) — quality comparisons between configs need the
    textured variant to have discriminating power.
    """
    sigma = np.zeros(pts.shape[:-1], np.float32)
    rgb = np.zeros(pts.shape, np.float32)
    if texture:
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        # wavelengths span ~0.025-0.10 world units: at the default
        # forward-facing rig (focal 1.125*w, blobs ~4 units out) that is
        # ~3.5-14 HR pixels at 504px — content on both sides of the LR
        # Nyquist, so supersampling quality differences are visible. The
        # finest component is (x, y)-only: rays travel mostly along -z,
        # keeping the generator's own quadrature faithful.
        tex = (0.55
               + 0.20 * np.sin(2 * np.pi * x / 0.10)
               * np.sin(2 * np.pi * y / 0.081)
               + 0.15 * np.sin(2 * np.pi * (x + y) / 0.061)
               * np.sin(2 * np.pi * z / 0.43)
               + 0.15 * np.sin(2 * np.pi * x / 0.025)
               * np.sin(2 * np.pi * y / 0.0253)
               ).astype(np.float32)
        tex = np.clip(tex, 0.05, 1.0)[..., None]
    for c, r, col, peak in BLOBS:
        d2 = np.sum((pts - c) ** 2, -1)
        s = peak * np.exp(-d2 / (2 * (r / 2) ** 2)).astype(np.float32)
        blob_col = col * tex if texture else col
        rgb += s[..., None] * blob_col
        sigma += s
    rgb = rgb / np.maximum(sigma[..., None], 1e-8)
    return np.clip(sigma, 0, None), np.clip(rgb, 0.0, 1.0)


def look_at_pose(eye):
    """c2w with -z pointing at origin, y up-ish (blender convention)."""
    forward = -eye / np.linalg.norm(eye)          # camera looks along -z
    z_axis = -forward
    up = np.array([0.0, 0.0, 1.0])
    x_axis = np.cross(up, z_axis)
    x_axis /= np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    return np.stack([x_axis, y_axis, z_axis, eye], axis=1)  # (3, 4)


def render_view(c2w, hw, focal, n_samples=96, near=2.0, far=6.0,
                texture=False):
    h, w = hw
    i, j = np.meshgrid(np.arange(w, dtype=np.float32) + 0.5,
                       np.arange(h, dtype=np.float32) + 0.5,
                       indexing="xy")
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:, :3].T.astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.broadcast_to(c2w[:, 3].astype(np.float32), rd.shape)
    t = np.linspace(near, far, n_samples, dtype=np.float32)
    delta = (far - near) / (n_samples - 1)
    # chunk over rows: the full (h, w, S, 3) point tensor at eval sizes
    # (504x378x256) is ~0.5 GB of temps — enough to swap on this host.
    out_rows = []
    rows_per_chunk = max(1, (1 << 22) // (w * n_samples))
    for r0 in range(0, h, rows_per_chunk):
        rd_c = rd[r0:r0 + rows_per_chunk]
        ro_c = ro[r0:r0 + rows_per_chunk]
        pts = ro_c[..., None, :] + t[..., None] * rd_c[..., None, :]
        sigma, rgb = field(pts, texture=texture)
        alpha = 1 - np.exp(-sigma * delta)
        trans = np.cumprod(1 - alpha + 1e-10, axis=-1)
        trans = np.concatenate([np.ones_like(trans[..., :1]),
                                trans[..., :-1]], -1)
        weights = alpha * trans
        img = (weights[..., None] * rgb).sum(-2)
        acc = weights.sum(-1)
        out_rows.append(img + (1 - acc[..., None]))  # white background
    return np.clip(np.concatenate(out_rows, axis=0), 0, 1)


def make_scene(out_dir, hw=(40, 40), n_train=8, n_val=2, n_test=2,
               radius=4.0, seed=0, texture=False):
    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = hw
    camera_angle_x = 0.8
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

    splits = {"train": n_train, "val": n_val, "test": n_test}
    idx = 0
    for split, n in splits.items():
        frames = []
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        for k in range(n):
            theta = rng.uniform(0, 2 * np.pi)
            phi = rng.uniform(0.2, 1.2)
            eye = radius * np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                np.sin(phi)])
            c2w = look_at_pose(eye)
            img = render_view(c2w, hw, focal, texture=texture)
            rel = f"./{split}/r_{idx}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{rel[2:]}.png"))
            c2w44 = np.concatenate(
                [c2w, np.array([[0, 0, 0, 1.0]])], 0)
            frames.append({"file_path": rel,
                           "transform_matrix": c2w44.tolist()})
            idx += 1
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(out_dir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump(meta, f)
    return out_dir


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--hw", type=int, nargs=2, default=[40, 40])
    p.add_argument("--n_train", type=int, default=8)
    p.add_argument("--texture", action="store_true",
                   help="high-frequency procedural albedo (needed for "
                        "config-discriminating quality comparisons)")
    args = p.parse_args()
    make_scene(args.out_dir, tuple(args.hw), args.n_train,
               texture=args.texture)
    print(f"scene written to {args.out_dir}")
