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


def _make_rods(n=14, seed=7):
    """Deterministic thin near-opaque capsules scattered in front of /
    between the blobs: occluders with REAL depth complexity. The smooth
    gaussian blobs have essentially one soft surface per ray, which is
    why degenerate big-MLP sample counts (N_importance 8) can look
    BETTER there than realistic ones — thin structures at distinct
    depths restore the sampling difficulty real LLFF scenes (foliage,
    railings) have. Radii 0.03-0.06 world units = ~4-9 HR px at the
    504px forward-facing rig.

    Every rod is kept BEHIND the render quadrature's near plane: the
    LLFF rig's cameras sit at world z ~ 4.0+-0.1 (+-3 sigma ~ 3.7) and
    quadrature starts at ray distance near=2.0, so any rod surface
    above z ~ 1.7 would be silently clipped in SOME views but rendered
    in others — view-inconsistent supervision exactly on the thin
    occluders this scene exists to test. Endpoint z is clamped to
    1.4 - 2r (quartic falloff reaches ~0 by 2r), giving >= 0.24 world
    units of margin past the near plane for all cameras."""
    rng = np.random.RandomState(seed)
    a, b, r, col = [], [], [], []
    for _ in range(n):
        c = np.array([rng.uniform(-1.1, 1.1), rng.uniform(-0.9, 0.9),
                      rng.uniform(0.6, 2.2)])
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        half = rng.uniform(0.4, 0.8)
        rad = rng.uniform(0.035, 0.06)
        ai, bi = c - d * half, c + d * half
        z_max = 1.4 - 2 * rad
        ai[2] = min(ai[2], z_max)  # the segment between the clamped
        bi[2] = min(bi[2], z_max)  # endpoints stays below z_max too
        a.append(ai)
        b.append(bi)
        r.append(rad)
        col.append(rng.uniform(0.1, 1.0, 3))
    return (np.array(a, np.float32), np.array(b, np.float32),
            np.array(r, np.float32), np.array(col, np.float32))


RODS = _make_rods()
ROD_PEAK = 80.0

# Specular scene family: two fixed directional lights + Phong lobes of
# MIXED width. The broad lobe (shininess 8, half-width ~21 deg) puts
# view-dependent gloss on a large fraction of every blob's visible
# surface; the tight lobe (shininess 60, half-width ~8 deg — at or below
# the deg_dir=4 posenc resolution, whose finest band period is ~22 deg)
# adds small hard highlights that MOVE across the surface between
# training views (the LLFF rig's cameras span ~17 deg of view angle per
# world point). This is the adversarial axis neither the textured nor
# the cluttered scene stresses: radiance that changes strongly with view
# direction while density stays view-independent (so proposal sampling
# sees the same geometry but the dir-conditioned big MLP must carry the
# lobes).
SPEC_LIGHTS = [  # (unit direction TO the light, intensity, shininess)
    (np.array([0.4, 0.7, 0.6]) / np.linalg.norm([0.4, 0.7, 0.6]),
     0.75, 8.0),
    (np.array([-0.6, 0.2, 0.75]) / np.linalg.norm([-0.6, 0.2, 0.75]),
     0.9, 60.0),
]
SPEC_KS = 0.9
SPEC_DIFF = 0.45
SPEC_AMB = 0.5


def _phong(n, v, xp):
    """Per-point Phong shading terms. ``n``: (..., 3) unit normals,
    ``v``: (..., 3) unit directions toward the camera. Returns
    (diffuse, specular) scalars (...,). ``xp`` = numpy or jax.numpy —
    the math is written once so the twins cannot drift."""
    diff = xp.zeros(n.shape[:-1], n.dtype)
    spec = xp.zeros(n.shape[:-1], n.dtype)
    for light, inten, shin in SPEC_LIGHTS:
        light = xp.asarray(light, n.dtype)
        ndl = xp.sum(n * light, -1)
        refl = 2.0 * ndl[..., None] * n - light   # mirror of L about n
        rdv = xp.clip(xp.sum(refl * v, -1), 0.0, None)
        diff = diff + inten * xp.clip(ndl, 0.0, None)
        spec = spec + inten * rdv ** shin
    return diff, spec


def field(pts, texture=False, clutter=False, viewdirs=None):
    """Analytic sigma/rgb at world points (N, 3).

    ``texture=True`` multiplies each blob's albedo by a multi-frequency
    procedural 3-D texture (incommensurate sinusoid products down to
    ~0.15 world units ~ 1-2 HR pixels at the default camera rigs). The
    smooth blobs alone are so easy that ANY NeRF config saturates the
    supersampling data ceiling within ~100 steps (measured: every
    config converges to val PSNR 30.8198 on the 504x378 LLFF scene, to
    five decimals) — quality comparisons between configs need the
    textured variant to have discriminating power.

    ``viewdirs`` (broadcastable to ``pts``, unit vectors along the ray)
    enables the SPECULAR scene family: blob albedo is Phong-shaded with
    per-blob radial normals and two directional lights, making emitted
    radiance strongly view-dependent while density stays geometric.
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
        off = pts - c
        d2 = np.sum(off ** 2, -1)
        s = peak * np.exp(-d2 / (2 * (r / 2) ** 2)).astype(np.float32)
        blob_col = col * tex if texture else col
        if viewdirs is not None:
            n = off / np.maximum(
                np.sqrt(d2)[..., None], 1e-8).astype(np.float32)
            v = -np.broadcast_to(viewdirs, pts.shape).astype(np.float32)
            diff, spec = _phong(n, v, np)
            blob_col = (blob_col * (SPEC_AMB
                                    + SPEC_DIFF * diff[..., None])
                        + SPEC_KS * spec[..., None])
        rgb += s[..., None] * blob_col
        sigma += s
    if clutter:
        ra, rb, rr, rcol = RODS
        # one rod at a time: the broadcast (..., R, 3) formulation costs
        # GB-scale temporaries at generator sizes (85M pts x 14 rods)
        # and swaps this 1-core host; per-rod temps are (..., 3).
        for k in range(len(rr)):
            ab = rb[k] - ra[k]
            inv = 1.0 / float(ab @ ab)
            # elementwise dot (BLAS matvec here costs more in thread
            # scheduling than the flops on this 1-core host)
            t = np.clip(
                ((pts[..., 0] - ra[k][0]) * (ab[0] * inv)
                 + (pts[..., 1] - ra[k][1]) * (ab[1] * inv)
                 + (pts[..., 2] - ra[k][2]) * (ab[2] * inv)),
                0.0, 1.0)
            d2 = ((pts[..., 0] - (ra[k][0] + t * ab[0])) ** 2
                  + (pts[..., 1] - (ra[k][1] + t * ab[1])) ** 2
                  + (pts[..., 2] - (ra[k][2] + t * ab[2])) ** 2)
            # quartic falloff: near-hard wall at the capsule radius
            s = ROD_PEAK * np.exp(
                -(d2 / float(rr[k] * rr[k])) ** 2).astype(np.float32)
            rgb += s[..., None] * rcol[k]
            sigma += s
    rgb = rgb / np.maximum(sigma[..., None], 1e-8)
    return np.clip(sigma, 0, None), np.clip(rgb, 0.0, 1.0)


def _field_jax(pts, texture: bool, clutter: bool, viewdirs=None):
    """jax.numpy twin of ``field`` (same constants, same math) — the
    analytic field is embarrassingly parallel, and this 1-core host
    takes ~8 min/image to evaluate it in numpy (sys-time bound on temp
    allocation) vs seconds on the TPU. Outputs match numpy to float32
    roundoff; generated scenes are cached as uint8 PNGs either way."""
    import jax.numpy as jnp

    sigma = jnp.zeros(pts.shape[:-1], jnp.float32)
    rgb = jnp.zeros(pts.shape, jnp.float32)
    if texture:
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        tex = (0.55
               + 0.20 * jnp.sin(2 * jnp.pi * x / 0.10)
               * jnp.sin(2 * jnp.pi * y / 0.081)
               + 0.15 * jnp.sin(2 * jnp.pi * (x + y) / 0.061)
               * jnp.sin(2 * jnp.pi * z / 0.43)
               + 0.15 * jnp.sin(2 * jnp.pi * x / 0.025)
               * jnp.sin(2 * jnp.pi * y / 0.0253))
        tex = jnp.clip(tex, 0.05, 1.0)[..., None]
    for c, r, col, peak in BLOBS:
        off = pts - c
        d2 = jnp.sum(off ** 2, -1)
        s = peak * jnp.exp(-d2 / (2 * (r / 2) ** 2))
        blob_col = jnp.asarray(col, jnp.float32) * tex if texture \
            else jnp.asarray(col, jnp.float32)
        if viewdirs is not None:
            n = off / jnp.maximum(jnp.sqrt(d2)[..., None], 1e-8)
            v = -jnp.broadcast_to(viewdirs, pts.shape)
            diff, spec = _phong(n, v, jnp)
            blob_col = (blob_col * (SPEC_AMB
                                    + SPEC_DIFF * diff[..., None])
                        + SPEC_KS * spec[..., None])
        rgb = rgb + s[..., None] * blob_col
        sigma = sigma + s
    if clutter:
        ra, rb, rr, rcol = RODS
        ab = rb - ra                                       # (R, 3)
        inv_len2 = 1.0 / np.sum(ab * ab, -1)               # (R,)
        t = jnp.clip(
            jnp.einsum("...rc,rc->...r", pts[..., None, :] - ra,
                       ab * inv_len2[:, None]), 0.0, 1.0)
        closest = ra + t[..., None] * ab                   # (..., R, 3)
        d2 = jnp.sum((pts[..., None, :] - closest) ** 2, -1)
        s = ROD_PEAK * jnp.exp(-(d2 / (rr * rr)) ** 2)     # (..., R)
        rgb = rgb + jnp.einsum("...r,rc->...c", s, rcol)
        sigma = sigma + jnp.sum(s, -1)
    rgb = rgb / jnp.maximum(sigma[..., None], 1e-8)
    return jnp.clip(sigma, 0, None), jnp.clip(rgb, 0.0, 1.0)


def _rows_jit(n_samples, near, far):
    """Module-level cache of the jitted row-chunk renderer: jax.jit's
    executable cache is keyed on the function OBJECT, so a closure
    defined inside render_view_jax would re-trace + recompile the
    identical program once per image."""
    import functools

    import jax
    import jax.numpy as jnp

    key = (n_samples, float(near), float(far))
    fn = _ROWS_CACHE.get(key)
    if fn is not None:
        return fn
    t = jnp.linspace(near, far, n_samples, dtype=jnp.float32)
    delta = (far - near) / (n_samples - 1)

    @functools.partial(jax.jit,
                       static_argnames=("texture", "clutter", "specular"))
    def rows(ro_c, rd_c, texture, clutter, specular=False):
        pts = ro_c[..., None, :] + t[..., None] * rd_c[..., None, :]
        vd = rd_c[..., None, :] if specular else None
        sigma, rgb = _field_jax(pts, texture, clutter, viewdirs=vd)
        alpha = 1 - jnp.exp(-sigma * delta)
        trans = jnp.cumprod(1 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                                 trans[..., :-1]], -1)
        weights = alpha * trans
        img = (weights[..., None] * rgb).sum(-2)
        acc = weights.sum(-1)
        return img + (1 - acc[..., None])  # white background

    _ROWS_CACHE[key] = rows
    return rows


_ROWS_CACHE = {}


def render_view_jax(c2w, hw, focal, n_samples=96, near=2.0, far=6.0,
                    texture=False, clutter=False, specular=False):
    """Device-accelerated twin of ``render_view`` (one jitted
    row-chunked quadrature pass). Used by the generators when JAX is
    importable; falls back to numpy otherwise."""
    import jax.numpy as jnp

    h, w = hw
    i, j = np.meshgrid(np.arange(w, dtype=np.float32) + 0.5,
                       np.arange(h, dtype=np.float32) + 0.5,
                       indexing="xy")
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:, :3].T.astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.broadcast_to(c2w[:, 3].astype(np.float32), rd.shape)
    rows = _rows_jit(n_samples, near, far)

    out_rows = []
    rows_per_chunk = max(1, (1 << 23) // (w * n_samples))
    pad_h = -(-h // rows_per_chunk) * rows_per_chunk
    for r0 in range(0, pad_h, rows_per_chunk):
        rd_c = np.zeros((rows_per_chunk, w, 3), np.float32)
        ro_c = np.zeros((rows_per_chunk, w, 3), np.float32)
        n = min(rows_per_chunk, h - r0)
        if n <= 0:
            break
        rd_c[:n] = rd[r0:r0 + n]
        ro_c[:n] = ro[r0:r0 + n]
        img = np.asarray(rows(jnp.asarray(ro_c), jnp.asarray(rd_c),
                              texture, clutter, specular))
        out_rows.append(img[:n])
    return np.clip(np.concatenate(out_rows, axis=0), 0, 1)


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
                texture=False, clutter=False, specular=False):
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
        vd = rd_c[..., None, :] if specular else None
        sigma, rgb = field(pts, texture=texture, clutter=clutter,
                           viewdirs=vd)
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

    # full-size generation is minutes/image in numpy on this 1-core
    # host; the jitted twin renders it in seconds (tiny test scenes
    # keep numpy — not worth a compile)
    rv = render_view
    if h * w >= 128 * 128:
        try:
            rv = render_view_jax
        except Exception:
            pass
    n_samples = 256 if texture else 96

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
            img = rv(c2w, hw, focal, texture=texture,
                     n_samples=n_samples)
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
