"""Stratified and hierarchical (inverse-CDF) sampling along rays.

Pure JAX, explicit PRNG keys, static shapes — the whole block lives inside
the jitted render step. Behavioral parity with ``models/utils.py:5-95`` of
cwchenwang/NeRF-SR including its eps/denominator edge cases, but expressed
with TPU-friendly vectorized searchsorted/gather instead of torch ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_rays(origins: jnp.ndarray, directions: jnp.ndarray,
              z_vals: jnp.ndarray) -> jnp.ndarray:
    """Points ``o + t * d``. Parity: ``models/utils.py:5-14``.

    origins/directions: (..., 3); z_vals: (..., S) -> (..., S, 3).
    """
    return origins[..., None, :] + z_vals[..., None] * directions[..., None, :]


def sample_along_rays(key, origins, directions, near, far, num_samples: int,
                      randomized: bool, lindisp: bool):
    """Stratified coarse sampling. Parity: ``models/utils.py:17-44``.

    Args:
      key: PRNG key (may be None when randomized=False).
      near/far: (..., 1).
    Returns:
      z_vals: (..., S); points: (..., S, 3).
    """
    dtype = origins.dtype
    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        z_mids = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
        upper = jnp.concatenate([z_mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], z_mids], axis=-1)
        u = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + u * (upper - lower)

    return z_vals, cast_rays(origins, directions, z_vals)


def select_along_axis(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched ``values[n, idx[n, q]]`` without a TPU gather.

    ``jnp.take_along_axis`` lowers to a dynamic gather that costs ~2 us
    PER ELEMENT on TPU (~8 ms for the four lookups of one flagship
    resample, measured); an exact one-hot mask + sum over the bin axis
    is a fully-parallel VPU reduction (~0.17 ms for the same work). The
    mask selects exactly one element per (n, q) and the other terms are
    an exact 0, so the result is bit-identical to the gather.

    values: (N, B); idx: int (N, Q) -> (N, Q).
    """
    iota = jnp.arange(values.shape[-1], dtype=idx.dtype)
    mask = idx[..., None] == iota                       # (N, Q, B)
    return jnp.sum(
        jnp.where(mask, values[..., None, :], 0), axis=-1)


def _invert_cdf(bins: jnp.ndarray, weights: jnp.ndarray,
                u: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Shared inverse-CDF tail of ``sample_pdf``/``sample_pdf_stratified``
    (only the construction of ``u`` differs between them).

    Parity with ``models/utils.py:61-92``: eps added to weights, CDF
    zero-padded, searchsorted right, below/above clamping, and degenerate
    bins (denom < eps) mapped to denom=1.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    n_bins = bins.shape[-1]
    # searchsorted(right) per ray as an all-pairs comparison reduction:
    # inds[n, q] = #{b : cdf[n, b] <= u[n, q]}. The (Q x B) bool cube is
    # tiny and fully parallel on the VPU — measured ~6-20x faster on TPU
    # than jnp.searchsorted's default sequential scan at NeRF shapes.
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins - 1)  # == N_samples_ in the reference

    cdf_below = select_along_axis(cdf, below)
    cdf_above = select_along_axis(cdf, above)
    bins_below = select_along_axis(bins, below)
    bins_above = select_along_axis(bins, above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray,
               num_samples: int, randomized: bool) -> jnp.ndarray:
    """Inverse-CDF sampling of ``num_samples`` new depths from a piecewise
    PDF over ``bins``. Parity: ``models/utils.py:61-92``.

    bins: (N, B); weights: (N, B-1) -> (N, num_samples).
    """
    n_rays = bins.shape[0]
    if randomized:
        u = jax.random.uniform(key, (n_rays, num_samples), dtype=bins.dtype)
    else:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, num_samples))
    return _invert_cdf(bins, weights, u)


def sample_pdf_stratified(key, bins: jnp.ndarray, weights: jnp.ndarray,
                          num_samples: int, randomized: bool):
    """Inverse-CDF sampling with STRATIFIED uniforms: u_i is jittered
    inside its own [i/N, (i+1)/N) cell, so u — and therefore the
    CDF-inverse output — is sorted per ray by construction. Used by the
    --fast_sampling path: removes the (N, S) sort the merge-free
    resample would otherwise need (~5 ms/step at flagship shapes) and
    lowers sampling variance. Same eps/denominator edge cases as
    ``sample_pdf``."""
    n_rays = bins.shape[0]
    base = jnp.arange(num_samples, dtype=bins.dtype)
    if randomized:
        jitter = jax.random.uniform(key, (n_rays, num_samples),
                                    dtype=bins.dtype)
    else:
        jitter = jnp.full((n_rays, num_samples), 0.5, bins.dtype)
    u = (base + jitter) / num_samples
    return _invert_cdf(bins, weights, u)


def resample_along_rays(key, origins, directions, z_vals, weights,
                        num_samples: int, randomized: bool):
    """Hierarchical fine resampling merged with the coarse depths.

    Parity: ``models/utils.py:47-95`` — bins are coarse interval midpoints,
    the first/last coarse weights are dropped, and the union of coarse and
    new depths is sorted. ``weights`` must already be detached
    (``jax.lax.stop_gradient``) by the caller, matching
    ``models/nerf_model.py:229``.

    z_vals: (N, S); weights: (N, S) -> z_vals: (N, S + num_samples).
    """
    bins = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    inner_weights = weights[..., 1:-1]
    z_new = sample_pdf(key, bins, inner_weights, num_samples, randomized)
    z_vals = jnp.sort(jnp.concatenate([z_vals, z_new], axis=-1), axis=-1)
    return z_vals, cast_rays(origins, directions, z_vals)
