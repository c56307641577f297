"""Ray generation and camera-space geometry.

Pure JAX reimplementation of the reference ray math (behavioral parity with
``models/utils.py:98-196`` in cwchenwang/NeRF-SR) designed so the whole thing
can run *inside* a jitted training step: rays are a cheap function of camera
parameters, so on TPU we keep images + poses on device and synthesize ray
batches on the fly instead of materializing every ray in host RAM like the
reference datasets do.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Rays(NamedTuple):
    """A bundle of rays as a pytree of arrays with a common leading shape.

    Replaces the reference's packed 8/11-column ray tensors
    (``models/nerf_model.py:209-213``): ``origins``/``directions`` are world
    space, ``viewdirs`` is what the direction embedding consumes (the
    normalized pre-NDC direction for LLFF; equal to ``directions`` for the
    supersampling model, cf. ``models/nerf_downX_model.py:286``).
    """

    origins: jnp.ndarray      # (..., 3)
    directions: jnp.ndarray   # (..., 3)
    near: jnp.ndarray         # (..., 1)
    far: jnp.ndarray          # (..., 1)
    viewdirs: jnp.ndarray     # (..., 3)

    @property
    def batch_shape(self):
        return self.origins.shape[:-1]


def get_ray_directions(h: int, w: int, focal, use_pixel_centers: bool = True,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel ray directions in camera space, -z forward, y up.

    Parity: ``models/utils.py:98-126`` (including the ``use_pixel_centers``
    +0.5 offset, which the reference credits with ~+1 PSNR).

    Returns: (h, w, 3).
    """
    center = 0.5 if use_pixel_centers else 0.0
    i = jnp.arange(w, dtype=dtype) + center          # x / column
    j = jnp.arange(h, dtype=dtype) + center          # y / row
    ii, jj = jnp.meshgrid(i, j, indexing="xy")       # (h, w)
    directions = jnp.stack(
        [(ii - w / 2) / focal, -(jj - h / 2) / focal, -jnp.ones_like(ii)],
        axis=-1,
    )
    return directions


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Transform camera-space directions into world-space rays.

    Parity: ``models/utils.py:129-152`` — directions are rotated by the
    camera-to-world rotation and normalized; origins broadcast from the
    camera center.

    Args:
      directions: (..., 3) camera-space directions.
      c2w: (3, 4) camera-to-world matrix.
    Returns:
      rays_o, rays_d: (..., 3) each (NOT flattened — callers reshape).
    """
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(h: int, w: int, focal, near, rays_o: jnp.ndarray,
             rays_d: jnp.ndarray):
    """Shift rays to the near plane and project into NDC.

    Parity: ``models/utils.py:155-196`` (used for forward-facing LLFF
    scenes; after this transform the scene is bounded in [-1, 1]^3 and rays
    are sampled with near=0, far=1).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def make_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, near, far,
              viewdirs: Optional[jnp.ndarray] = None) -> Rays:
    """Assemble a Rays bundle, broadcasting scalar near/far."""
    shape = rays_o.shape[:-1] + (1,)
    near = jnp.broadcast_to(jnp.asarray(near, rays_o.dtype), shape)
    far = jnp.broadcast_to(jnp.asarray(far, rays_o.dtype), shape)
    if viewdirs is None:
        viewdirs = rays_d
    return Rays(rays_o, rays_d, near, far, viewdirs)
