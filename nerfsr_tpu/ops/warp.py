"""Depth-guided cross-view warping (the offline tool between the
supersampling and refinement stages).

Capability parity with the reference's ``warp.py:17-189``, which loops
over every pixel in Python (minutes per image); here the whole
unproject -> world -> reproject -> gather pipeline is one vectorized JAX
function (jitted batched gather on TPU, milliseconds per image), with the
same numerics:

- NDC depth -> metric depth via ``1 / (1 - d + 1e-6)`` (``warp.py:118``)
- camera-space point ``((i+.5-w/2)/f * z, -(j+.5-h/2)/f * z, -z)``
  (-z forward, y-flip in K; ``warp.py:128-141``)
- perspective divide by ``-z`` and intrinsics ``x*f + w/2`` /
  ``y*(-f) + h/2`` with truncation to int (``warp.py:164-168``)

Outputs per view: ``{i}_locs.npz`` — an (H, W, 3) array whose [..., 0:2]
are the reference-view pixel coords of each source pixel (the
correspondence map the refine dataset consumes) — and ``{i}-wrapped.png``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ndc_depth_to_metric(depth, eps: float = 1e-6):
    """Invert the NDC z mapping (reference ``warp.py:118``)."""
    return 1.0 / (1.0 - depth + eps)


import functools


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _warp_coords(depth, c2w, ref_w2c, focal, w, h):
    """depth (H, W) metric -> ref-view pixel coords (H, W, 2) float."""
    i = jnp.arange(w, dtype=jnp.float32) + 0.5
    j = jnp.arange(h, dtype=jnp.float32) + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    x = (ii - w / 2) / focal * depth
    y = -(jj - h / 2) / focal * depth
    z = -depth
    pts = jnp.stack([x, y, z], -1)                       # camera space
    pts = pts @ c2w[:, :3].T + c2w[:, 3]                 # world
    pts = pts @ ref_w2c[:, :3].T + ref_w2c[:, 3]         # ref camera
    pts = pts / -pts[..., 2:3]                           # perspective div
    # trunc (toward zero), NOT floor: the reference casts with int()
    # (warp.py:167-168), so a coordinate at -0.4 maps to column 0
    # (valid) — floor would send it to -1 and mask a border pixel the
    # reference samples. (Coordinates <= -1 stay masked here; the
    # reference's negative-index numpy lookup silently WRAPS to the
    # opposite border — a bug not reproduced.)
    px = jnp.trunc(pts[..., 0] * focal + w / 2)
    py = jnp.trunc(pts[..., 1] * (-focal) + h / 2)
    return jnp.stack([px, py], -1)


def warp_view(depth, c2w, ref_w2c, ref_rgb, focal, wh, ndc_depth=True):
    """Warp one view onto the reference view.

    Args:
      depth: (H, W) rendered depth of view i (NDC when ndc_depth).
      c2w: (3, 4) pose of view i; ref_w2c: (3, 4) world->ref-camera.
      ref_rgb: (H, W, 3) reference image.
    Returns:
      locs: (H, W, 3) float array, [..., 0]=x, [..., 1]=y in the ref
        view, [..., 2]=-1 filler (byte-compatible with the reference's
        saved coords array).
      warped: (H, W, 3) ref colors gathered at locs (0 where invalid).
    """
    w, h = wh
    depth = jnp.asarray(depth, jnp.float32)
    if ndc_depth:
        depth = ndc_depth_to_metric(depth)
    coords = _warp_coords(depth, jnp.asarray(c2w), jnp.asarray(ref_w2c),
                          float(focal), w, h)
    coords = np.asarray(coords)
    px, py = coords[..., 0], coords[..., 1]
    valid = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    xi = np.clip(px.astype(np.int32), 0, w - 1)
    yi = np.clip(py.astype(np.int32), 0, h - 1)
    warped = np.where(valid[..., None], np.asarray(ref_rgb)[yi, xi], 0.0)
    locs = np.concatenate(
        [coords, -np.ones_like(coords[..., :1])], axis=-1)
    return locs.astype(np.float32), warped.astype(np.float32)


def ref_world_to_cam(ref_c2w):
    """(3,4) c2w -> (3,4) w2c by homogeneous inversion (``warp.py:107``)."""
    m = np.concatenate([ref_c2w, np.array([[0, 0, 0, 1.0]])], 0)
    return np.linalg.inv(m)[:3]


def generate_correspondences(root_dir, result_dir, img_wh,
                             spheric_poses=False, ref_idx=0,
                             use_pixel_centers=True):
    """Run the full warp over every ``{i}-fine-depth-ori.npz`` in
    result_dir, writing ``{i}_locs.npz`` + ``{i}-wrapped.png``.

    Mirrors the reference driver (``warp.py:95-176``) minus its
    hardcoded scene paths.
    """
    import glob
    import os
    import re

    from PIL import Image

    from nerfsr_tpu.data.blender import load_image
    from nerfsr_tpu.data.llff import load_colmap_scene

    poses, bounds, focal, image_paths = load_colmap_scene(root_dir, img_wh)
    ref_rgb = load_image(image_paths[ref_idx], img_wh)
    ref_w2c = ref_world_to_cam(poses[ref_idx])

    depth_files = sorted(glob.glob(
        os.path.join(result_dir, "*fine-depth-ori.npz")))
    written = []
    for path in depth_files:
        # parse the view index FROM the filename (a subset render may
        # start at a nonzero index; iterating range(len(files)) would
        # silently warp nothing)
        m = re.match(r"(\d+)-fine-depth-ori\.npz$",
                     os.path.basename(path))
        if not m:
            continue
        i = int(m.group(1))
        if i >= len(poses):
            continue
        z = np.load(path)
        key = "matrix" if "matrix" in z else list(z.keys())[0]
        depth = np.squeeze(z[key])
        locs, warped = warp_view(
            depth, poses[i], ref_w2c, ref_rgb, focal, img_wh,
            ndc_depth=not spheric_poses)
        np.savez(os.path.join(result_dir, f"{i}_locs.npz"), locs)
        Image.fromarray(
            (np.clip(warped, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(result_dir, f"{i}-wrapped.png"))
        written.append(i)
    return written
