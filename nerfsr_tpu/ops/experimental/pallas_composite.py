"""Fused volume-rendering (alpha compositing) Pallas TPU kernel.

Computes the whole composite — deltas, sigma activation, alpha,
exclusive transmittance, weights, and the rgb/depth/opacity reductions
(``models/rendering.py:88-109`` semantics) — in ONE VMEM-resident kernel
per ray tile, with an analytic custom VJP (a second fused kernel) so the
training step never materializes the intermediate alpha/transmittance
tensors in HBM.

TPU notes:
- the exclusive cumulative product is computed in log space as a matmul
  against a strictly-lower-triangular ones matrix: an (S x S) MXU op per
  tile instead of a length-S serial scan.
- the backward pass needs suffix sums over samples — the transposed
  triangular matmul, again on the MXU.
- every kernel ref is strictly 2-D (rgb handled as three (N, S) planes)
  — Mosaic lowers 2-D tiles most reliably.
- numerics match the jnp reference implementation: terminal delta 1e10,
  eps=1e-10 inside the cumulative product, relu / shifted-softplus
  activations.

Gradient formulas (w_i = a_i * T_i, T_i = prod_{j<i}(1-a_j+eps)):
  dL/da_j = T_j * gw_j - (sum_{i>j} gw_i w_i) / (1 - a_j + eps)
  a = 1 - exp(-delta * s),  ds = ga * delta * (1-a),  ddelta = ga * s * (1-a)
with gw collecting the rgb/depth/opacity/weights output cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10
TERMINAL_DELTA = 1e10


def _act(sigma, kind):
    if kind == "relu":
        return jax.nn.relu(sigma)
    return jax.nn.softplus(sigma - 1.0)  # softplus, shifted (rendering.py:73)


def _act_grad(sigma, kind):
    if kind == "relu":
        return (sigma > 0).astype(sigma.dtype)
    return jax.nn.sigmoid(sigma - 1.0)


def _deltas(z_vals):
    d = z_vals[:, 1:] - z_vals[:, :-1]
    return jnp.concatenate(
        [d, jnp.full_like(d[:, :1], TERMINAL_DELTA)], axis=-1)


def _tri_lower_strict(s, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (row < col).astype(dtype)


def _weights(sigma, z_vals, activation):
    sa = _act(sigma, activation)
    deltas = _deltas(z_vals)
    one_m_alpha = jnp.exp(-deltas * sa)
    alpha = 1.0 - one_m_alpha
    logt = jnp.log(one_m_alpha + EPS)
    tri = _tri_lower_strict(logt.shape[-1], logt.dtype)
    trans = jnp.exp(
        jnp.dot(logt, tri, preferred_element_type=jnp.float32))
    return alpha, one_m_alpha, trans, alpha * trans, sa, deltas, tri


def _fwd_kernel(r_ref, g_ref, b_ref, sigma_ref, z_ref,
                comp_ref, depth_ref, op_ref, w_ref, *,
                activation, white_bkgd):
    z_vals = z_ref[:]
    _, _, _, weights, _, _, _ = _weights(sigma_ref[:], z_vals, activation)
    w_ref[:] = weights
    comp = jnp.stack([
        jnp.sum(weights * r_ref[:], axis=-1),
        jnp.sum(weights * g_ref[:], axis=-1),
        jnp.sum(weights * b_ref[:], axis=-1),
    ], axis=-1)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    if white_bkgd:
        comp = comp + (1.0 - opacity)
    comp_ref[:] = comp
    depth_ref[:] = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
    op_ref[:] = opacity


def _bwd_kernel(r_ref, g_ref, b_ref, sigma_ref, z_ref,
                gc_ref, gd_ref, go_ref, gw_ref,
                gr_ref, gg_ref, gb_ref, gsigma_ref, gz_ref, *,
                activation, white_bkgd):
    sigma = sigma_ref[:]
    z_vals = z_ref[:]
    gc = gc_ref[:]                      # (N, 3)
    gd = gd_ref[:]                      # (N, 1)
    go = go_ref[:]                      # (N, 1)

    alpha, one_m_alpha, trans, weights, sa, deltas, tri = _weights(
        sigma, z_vals, activation)

    if white_bkgd:
        go = go - jnp.sum(gc, axis=-1, keepdims=True)

    gc_r, gc_g, gc_b = gc[:, 0:1], gc[:, 1:2], gc[:, 2:3]
    # cotangent on weights from every output
    gw = (gc_r * r_ref[:] + gc_g * g_ref[:] + gc_b * b_ref[:]
          + gd * z_vals + go + gw_ref[:])

    gr_ref[:] = weights * gc_r
    gg_ref[:] = weights * gc_g
    gb_ref[:] = weights * gc_b

    # da_j = T_j gw_j - (suffix-sum of gw*w) / (1 - a_j + eps)
    m = gw * weights
    suffix = jnp.dot(m, tri.T, preferred_element_type=jnp.float32)
    ga = gw * trans - suffix / (one_m_alpha + EPS)

    gsa = ga * deltas * one_m_alpha
    gdelta = ga * sa * one_m_alpha
    gsigma_ref[:] = gsa * _act_grad(sigma, activation)

    # z grads: direct depth term + through deltas (terminal delta const).
    # shift-adds via concatenated zero columns (no scatter in Mosaic).
    gz = weights * gd
    gd_inner = gdelta[:, :-1]
    zero_col = jnp.zeros_like(gdelta[:, :1])
    gz = gz + jnp.concatenate([zero_col, gd_inner], axis=-1)
    gz = gz - jnp.concatenate([gd_inner, zero_col], axis=-1)
    gz_ref[:] = gz


def _row2(i):
    return (i, 0)


def _specs_2d(tile_n, dims):
    return [pl.BlockSpec((tile_n, d), _row2, memory_space=pltpu.VMEM)
            for d in dims]


def _run_fwd(rgb, sigma, z_vals, activation, white_bkgd, tile_n,
             interpret):
    n, s = sigma.shape
    kernel = functools.partial(_fwd_kernel, activation=activation,
                               white_bkgd=white_bkgd)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    comp, depth, op, w = pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=_specs_2d(tile_n, [s, s, s, s, s]),
        out_specs=_specs_2d(tile_n, [3, 1, 1, s]),
        out_shape=[
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
        ],
        interpret=interpret,
    )(r, g, b, sigma, z_vals)
    return comp, depth[:, 0], op[:, 0], w


def _run_bwd(rgb, sigma, z_vals, gc, gd, go, gw, activation, white_bkgd,
             tile_n, interpret):
    n, s = sigma.shape
    kernel = functools.partial(_bwd_kernel, activation=activation,
                               white_bkgd=white_bkgd)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    gr, gg, gb, gsigma, gz = pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=_specs_2d(tile_n, [s, s, s, s, s, 3, 1, 1, s]),
        out_specs=_specs_2d(tile_n, [s, s, s, s, s]),
        out_shape=[jax.ShapeDtypeStruct((n, s), jnp.float32)
                   for _ in range(5)],
        interpret=interpret,
    )(r, g, b, sigma, z_vals, gc, gd[:, None], go[:, None], gw)
    grgb = jnp.stack([gr, gg, gb], axis=-1)
    return grgb, gsigma, gz


def _choose_tile(n):
    for t in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % t == 0:
            return t
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_volumetric_rendering(rgb, sigma, z_vals, white_bkgd,
                                activation="relu", interpret=False):
    """Drop-in fused replacement for
    ``nerfsr_tpu.core.rendering.volumetric_rendering`` (same outputs:
    comp_rgb, depth, opacity, weights). Inputs are promoted to f32."""
    out = _run_fwd(jnp.asarray(rgb, jnp.float32),
                   jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(z_vals, jnp.float32),
                   activation, white_bkgd, _choose_tile(sigma.shape[0]),
                   interpret)
    return tuple(out)


def _vjp_fwd(rgb, sigma, z_vals, white_bkgd, activation, interpret):
    out = pallas_volumetric_rendering(rgb, sigma, z_vals, white_bkgd,
                                      activation, interpret)
    return out, (jnp.asarray(rgb, jnp.float32),
                 jnp.asarray(sigma, jnp.float32),
                 jnp.asarray(z_vals, jnp.float32))


def _vjp_bwd(white_bkgd, activation, interpret, residuals, cotangents):
    rgb, sigma, z_vals = residuals
    gc, gd, go, gw = [jnp.asarray(g, jnp.float32) for g in cotangents]
    grgb, gsigma, gz = _run_bwd(
        rgb, sigma, z_vals, gc, gd, go, gw, activation, white_bkgd,
        _choose_tile(sigma.shape[0]), interpret)
    return grgb, gsigma, gz


pallas_volumetric_rendering.defvjp(_vjp_fwd, _vjp_bwd)
