"""Fused inverse-CDF resampling Pallas TPU kernel.

Fuses the whole ``sample_pdf_stratified`` tail (``core/sampling.py:
_invert_cdf``) into ONE VMEM-resident kernel per ray tile: eps pad,
PDF normalize, inclusive cumsum (a triangular matmul on the MXU, not a
length-B serial scan), zero-prefix CDF, searchsorted as a compare-all
reduction, the four below/above one-hot selects, and the final lerp.
The XLA lowering materializes several (N, Q, B) intermediates between
fusions; here each (T, Q, B) cube lives only in VMEM for its tile.

No backward pass is needed: every training consumer calls this on
``stop_gradient``-ed weights and non-trainable depth bins (parity with
the reference's detach, ``models/nerf_model.py:229``), so the output
never sits on a differentiation path. The wrapper stop_gradients its
output to keep that invariant explicit.

Numerics match ``core/sampling.py:_invert_cdf`` exactly (same eps, same
degenerate-denominator select); bit-parity is asserted in
``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _tri_lower_incl(s: int, dtype):
    """(s, s) upper-triangular ones INCLUDING the diagonal, so that
    ``pdf @ tri`` is an inclusive prefix sum along the bin axis:
    out[j] = sum_{k <= j} pdf[k] needs tri[k, j] = 1 iff k <= j."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (row <= col).astype(dtype)


def _invert_cdf_kernel(bins_ref, w_ref, u_ref, z_ref):
    """One ray tile: bins (T, B), weights (T, B-1), u (T, Q) -> z (T, Q)."""
    bins = bins_ref[:]
    w = w_ref[:] + EPS
    u = u_ref[:]
    n_bins = bins.shape[-1]

    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    tri = _tri_lower_incl(pdf.shape[-1], pdf.dtype)
    # inclusive cumsum via MXU instead of a serial scan
    cdf_tail = jax.lax.dot_general(
        pdf, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf_tail[:, :1]), cdf_tail], axis=-1)  # (T, B)

    # searchsorted(right): inds[t, q] = #{b : cdf[t, b] <= u[t, q]}
    le = (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32)  # (T, Q, B)
    inds = jnp.sum(le, axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins - 1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_bins), 2)
    sel = lambda v, i: jnp.sum(  # noqa: E731  exact one-hot select
        jnp.where(i[:, :, None] == iota, v[:, None, :], 0.0), axis=-1)
    cdf_b = sel(cdf, below)
    cdf_a = sel(cdf, above)
    bins_b = sel(bins, below)
    bins_a = sel(bins, above)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < EPS, 1.0, denom)
    t = (u - cdf_b) / denom
    z_ref[:] = bins_b + t * (bins_a - bins_b)


def _choose_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_invert_cdf(bins: jnp.ndarray, weights: jnp.ndarray,
                      u: jnp.ndarray, interpret: bool = False):
    """Fused twin of ``core/sampling.py:_invert_cdf``.

    bins: (N, B); weights: (N, B-1); u: (N, Q) -> z: (N, Q). Forward
    only (see module docstring); output is stop_gradient'ed.
    """
    n, b = bins.shape
    q = u.shape[-1]
    tile = _choose_tile(n)
    row = lambda i: (i, 0)  # noqa: E731
    # sever autodiff BEFORE the kernel: pallas_call has no AD rule, and
    # no training consumer needs gradients through the sampler (the
    # caller already detaches weights; bins/u are non-trainable).
    bins, weights, u = jax.lax.stop_gradient((bins, weights, u))
    z = pl.pallas_call(
        _invert_cdf_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, b), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, b - 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, q), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, q), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, q), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(bins, jnp.float32), jnp.asarray(weights, jnp.float32),
      jnp.asarray(u, jnp.float32))
    return jax.lax.stop_gradient(z)


def pallas_sample_pdf_stratified(key, bins: jnp.ndarray,
                                 weights: jnp.ndarray, num_samples: int,
                                 randomized: bool,
                                 interpret: bool = False):
    """Drop-in twin of ``core/sampling.py:sample_pdf_stratified`` with
    the CDF inversion fused (stratified-u construction stays in jnp for
    bit-identical PRNG consumption)."""
    n_rays = bins.shape[0]
    base = jnp.arange(num_samples, dtype=bins.dtype)
    if randomized:
        jitter = jax.random.uniform(key, (n_rays, num_samples),
                                    dtype=bins.dtype)
    else:
        jitter = jnp.full((n_rays, num_samples), 0.5, bins.dtype)
    u = (base + jitter) / num_samples
    return pallas_invert_cdf(bins, weights, u, interpret=interpret)
