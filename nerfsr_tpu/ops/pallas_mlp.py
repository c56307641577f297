"""Fully-fused NeRF MLP Pallas TPU megakernel.

The training-step profile on a v5e chip shows the MLP at ~22 ms for the
standard LLFF config (393K points/step) — HBM-bandwidth bound: every one
of the ~10 Dense layers round-trips a (points, 256) activation through
HBM. This kernel keeps EVERYTHING resident on-chip per point tile:

  raw points/dirs (6 floats/pt in) -> positional encoding -> 8-layer
  trunk with skip concat -> sigma head + dir branch -> rgb/sigma
  (4 floats/pt out)

All weights (~0.66M params, 1.3 MB bf16) live in VMEM for the whole
kernel; HBM traffic drops ~40x. The backward pass is a second fused
kernel that RECOMPUTES the forward activations per tile (flash-style)
and accumulates the weight gradients in f32 VMEM scratch across the
sequential TPU grid, writing them once at the last tile.

Gradients w.r.t. the point/dir inputs are not needed in NeRF training
(rays come from data; the fine-resample path is stop_gradient'ed,
``models/nerf_model.py:229``), so the custom VJP returns zeros for them.

Architecture fixed to the reference VanillaMLP defaults
(``models/networks.py:121-226``): D=8, W=256, skip at layer 4, dir
branch W/2, sigmoid rgb. The generic flax path remains the fallback for
other shapes.

STATUS (measured on v5e, 393K pts): XLA flax path fwd 8.8 ms / fwd+bwd
23.9 ms. Kernel fwd was 25 ms with in-kernel posenc ((T,3) tiles waste
the VPU); moving the encoding outside (v2, current) brings it to
9.9 ms ~= XLA — both sit at ~57 TFLOP/s, i.e. XLA already achieves the
practical matmul throughput for these shapes and activation-fusion buys
nothing further. The backward kernel matches flax gradients to 5e-3 in
interpreter mode (tests/test_pallas.py) but still trips an opaque
remote-Mosaic 500 on-device (tiny-dim matmuls were eliminated; single
tile still fails — bisection notes in CLAUDE.md). Stays OPT-IN
(--use_pallas_mlp); the benchmark path uses the XLA MLP.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 8
W = 256
SKIP = 4          # concat the input embedding before layer index 4
DEG_POS = 10
DEG_DIR = 4
C_POS = 3 + 3 * 2 * DEG_POS   # 63
C_DIR = 3 + 3 * 2 * DEG_DIR   # 27
W_HALF = W // 2

# parameter order in the flat tuple
PARAM_NAMES = tuple(
    [f"xyz_encoding_{i+1}" for i in range(D)]
    + ["xyz_encoding_final", "sigma", "dir_encoding", "rgb"])


def flatten_params(flax_params: Dict[str, Any]):
    """flax VanillaMLP params -> flat (kernel, bias) tuple in PARAM_NAMES
    order. Biases are reshaped to (1, C): TPU VMEM blocks want >=2D."""
    p = flax_params["params"]
    flat = []
    for name in PARAM_NAMES:
        flat.append(p[name]["kernel"])
        flat.append(p[name]["bias"].reshape(1, -1))
    return tuple(flat)


def unflatten_grads(flat_grads, flax_params):
    """flat grads -> pytree matching the flax params structure."""
    out = {"params": {}}
    for i, name in enumerate(PARAM_NAMES):
        out["params"][name] = {
            "kernel": flat_grads[2 * i],
            "bias": flat_grads[2 * i + 1].reshape(-1),
        }
    return out


def _posenc(x, n_freqs):
    """In-kernel positional encoding, matching
    ``core.encoding.positional_encoding`` channel order."""
    parts = [x]
    for k in range(n_freqs):
        fx = x * (2.0 ** k)
        parts.append(jnp.sin(fx))
        parts.append(jnp.cos(fx))
    return jnp.concatenate(parts, axis=-1)


def _fwd_pass(x0_in, dmb_in, ws, compute_dtype):
    """Shared forward math on PRE-EMBEDDED inputs (the positional
    encoding runs outside the kernel in XLA: its many (T, 3)-shaped
    sin/cos ops have 3-wide lane tiles that waste the VPU in Mosaic —
    measured 3x slower in-kernel). Returns rgb, sigma and every
    intermediate activation for the bwd recompute."""
    f32 = jnp.float32
    x0 = x0_in.astype(compute_dtype)                        # (T, 63)
    dmb = dmb_in.astype(compute_dtype)                      # (T, 27)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    acts = []
    h = x0
    for i in range(D):
        wk, bk = ws[2 * i], ws[2 * i + 1]
        if i == SKIP:
            h = jnp.concatenate([x0, h], axis=-1)
        pre = dot(h, wk) + bk
        h = jnp.maximum(pre, 0.0).astype(compute_dtype)
        acts.append(h)

    w_fin, b_fin = ws[2 * D], ws[2 * D + 1]
    feat = (dot(h, w_fin) + b_fin).astype(compute_dtype)     # (T, 256)
    w_sig, b_sig = ws[2 * D + 2], ws[2 * D + 3]
    sigma = dot(h, w_sig) + b_sig                            # (T, 1) f32

    w_dir, b_dir = ws[2 * D + 4], ws[2 * D + 5]
    din = jnp.concatenate([feat, dmb], axis=-1)              # (T, 283)
    gpre = dot(din, w_dir) + b_dir
    g = jnp.maximum(gpre, 0.0).astype(compute_dtype)         # (T, 128)

    w_rgb, b_rgb = ws[2 * D + 6], ws[2 * D + 7]
    rgb_pre = dot(g, w_rgb) + b_rgb                          # (T, 3) f32
    rgb = jax.nn.sigmoid(rgb_pre)
    return rgb, sigma, (x0, dmb, acts, feat, din, g)


def _fwd_kernel(pts_ref, dirs_ref, *refs, compute_dtype):
    ws = [r[:] for r in refs[:-2]]
    rgb_ref, sigma_ref = refs[-2], refs[-1]
    rgb, sigma, _ = _fwd_pass(pts_ref[:], dirs_ref[:], ws, compute_dtype)
    rgb_ref[:] = rgb
    sigma_ref[:] = sigma


def _bwd_kernel(pts_ref, dirs_ref, *refs, compute_dtype, n_w):
    """Recompute forward, backprop, accumulate dW in f32 scratch; write
    at the last grid step.

    Head gradients avoid ALL matmuls with <8-wide dimensions (Mosaic
    crashes on them): the rgb/sigma head dW are computed TRANSPOSED
    ((3,128)/(1,256), transposed back outside), and their input
    cotangents use broadcast-sums over the 3/1-sized axes instead of
    tiny-K contractions. Extra inputs: w_rgb^T (3,128), w_sig^T (1,256).
    """
    ws = [r[:] for r in refs[:n_w]]
    w_rgb_t = refs[n_w][:]          # (3, 128)
    w_sig_t = refs[n_w + 1][:]      # (1, 256)
    grgb_ref, gsig_ref = refs[n_w + 2], refs[n_w + 3]
    out_refs = refs[n_w + 4:n_w + 4 + n_w]
    scratch = refs[n_w + 4 + n_w:]

    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        for s in scratch:
            s[:] = jnp.zeros_like(s)

    rgb, _, (x0, dmb, acts, feat, din, g) = _fwd_pass(
        pts_ref[:], dirs_ref[:], ws, compute_dtype)

    f32 = jnp.float32

    def dotT_ab(a, b):
        # a^T @ b contracting the point axis: (Ca, T) x (T, Cb)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def dot_wT(a, w):
        # a @ w^T: contract last axis of a with last axis of w
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    grgb = grgb_ref[:]
    gsig = gsig_ref[:]

    grads = [None] * n_w

    # rgb head: rgb = sigmoid(g @ Wrgb + b); dW transposed (3, 128)
    grgb_pre = (grgb * rgb * (1.0 - rgb)).astype(compute_dtype)
    grads[2 * D + 6] = dotT_ab(grgb_pre, g)              # (3, 128)^T later
    grads[2 * D + 7] = jnp.sum(grgb_pre, axis=0, keepdims=True)
    # gg = grgb_pre @ Wrgb^T via broadcast-sum over the 3 channels
    gg = (grgb_pre[:, 0:1] * w_rgb_t[0:1, :]
          + grgb_pre[:, 1:2] * w_rgb_t[1:2, :]
          + grgb_pre[:, 2:3] * w_rgb_t[2:3, :])          # (T, 128)
    gg = (gg * (g > 0)).astype(compute_dtype)

    # dir branch: g = relu(din @ Wdir + b)
    grads[2 * D + 4] = dotT_ab(din, gg)
    grads[2 * D + 5] = jnp.sum(gg, axis=0, keepdims=True)
    gdin = dot_wT(gg, ws[2 * D + 4])                     # (T, 283)
    gfeat = gdin[:, :W].astype(compute_dtype)

    # feat = h8 @ Wfin + b ; sigma = h8 @ Wsig + b (dWsig as (1, 256))
    h_last = acts[-1]
    grads[2 * D] = dotT_ab(h_last, gfeat)
    grads[2 * D + 1] = jnp.sum(gfeat, axis=0, keepdims=True)
    gsig_c = gsig.astype(compute_dtype)
    grads[2 * D + 2] = jnp.sum(h_last.astype(f32) * gsig, axis=0,
                               keepdims=True)            # (1, 256)
    grads[2 * D + 3] = jnp.sum(gsig_c, axis=0, keepdims=True)
    gh = (dot_wT(gfeat, ws[2 * D])
          + gsig * w_sig_t).astype(compute_dtype)

    # trunk, reverse order
    for li in range(D - 1, -1, -1):
        h_in = x0 if li == 0 else acts[li - 1]
        if li == SKIP:
            h_in = jnp.concatenate([x0, h_in], axis=-1)
        gh = (gh * (acts[li] > 0)).astype(compute_dtype)
        grads[2 * li] = dotT_ab(h_in, gh)
        grads[2 * li + 1] = jnp.sum(gh, axis=0, keepdims=True)
        if li > 0:
            gh_full = dot_wT(gh, ws[2 * li])
            if li == SKIP:
                gh_full = gh_full[:, C_POS:]
            gh = gh_full

    for s, gval in zip(scratch, grads):
        s[:] += gval

    @pl.when(i == n_prog - 1)
    def _write():
        for o, s in zip(out_refs, scratch):
            o[:] = s[:]


def _pick_tile(n, largest=512):
    # bwd working set (8 trunk activations + f32 dW scratch + weights)
    # must stay well under the 16MB VMEM.
    for t in (largest, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= largest and n % t == 0:
            return t
    return n


def _weight_specs(ws):
    # full weight blocks broadcast to every grid step (nd bound early —
    # python lambdas in comprehensions capture late)
    return [pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM) for w in ws]


def _embed(points, viewdirs):
    from nerfsr_tpu.core.encoding import positional_encoding
    return (positional_encoding(points, DEG_POS),
            positional_encoding(viewdirs, DEG_DIR))


def _fwd(points, viewdirs, ws, compute_dtype, interpret):
    n = points.shape[0]
    t = _pick_tile(n, largest=1024)
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
    x0, dmb = _embed(points, viewdirs)
    return pl.pallas_call(
        kernel,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, C_POS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, C_DIR), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(ws),
        ],
        out_specs=[
            pl.BlockSpec((t, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x0, dmb, *ws)


def _grad_shape(idx, w):
    """dW shapes inside the kernel: rgb/sigma head kernels are emitted
    transposed to keep >=8-wide leading matmul dims."""
    if idx in (2 * D + 6, 2 * D + 2):
        return (w.shape[1], w.shape[0])
    return tuple(w.shape)


def _bwd(points, viewdirs, ws, grgb, gsigma, compute_dtype, interpret):
    n = points.shape[0]
    t = _pick_tile(n, largest=256)
    n_w = len(ws)
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype,
                               n_w=n_w)
    w_rgb_t = jnp.swapaxes(ws[2 * D + 6], 0, 1)   # (3, 128)
    w_sig_t = jnp.swapaxes(ws[2 * D + 2], 0, 1)   # (1, 256)
    x0, dmb = _embed(points, viewdirs)
    w_specs = _weight_specs(list(ws) + [w_rgb_t, w_sig_t])
    g_shapes = [_grad_shape(i, w) for i, w in enumerate(ws)]
    out_specs = [pl.BlockSpec(s, lambda i, _nd=len(s): (0,) * _nd,
                              memory_space=pltpu.VMEM) for s in g_shapes]
    out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in g_shapes]
    scratch = [pltpu.VMEM(s, jnp.float32) for s in g_shapes]
    grads = pl.pallas_call(
        kernel,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, C_POS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, C_DIR), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((t, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x0, dmb, *ws, w_rgb_t, w_sig_t, grgb, gsigma)
    grads = list(grads)
    for idx in (2 * D + 6, 2 * D + 2):
        grads[idx] = jnp.swapaxes(grads[idx], 0, 1)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_nerf_mlp(params_flat, points, viewdirs, compute_dtype,
                   interpret=False):
    """(rgb (N,3), sigma (N,)) from raw points/viewdirs (N,3).

    params_flat: flatten_params(flax_variables) tuple, f32 masters
    (cast to compute_dtype happens outside the kernel, once per step).
    """
    ws = tuple(jnp.asarray(w) for w in params_flat)
    rgb, sigma = _fwd(points, viewdirs, ws, compute_dtype, interpret)
    return rgb, sigma[:, 0]


def _vjp_fwd(params_flat, points, viewdirs, compute_dtype, interpret):
    out = fused_nerf_mlp(params_flat, points, viewdirs, compute_dtype,
                         interpret)
    return out, (params_flat, points, viewdirs)


def _vjp_bwd(compute_dtype, interpret, residuals, cotangents):
    params_flat, points, viewdirs = residuals
    grgb, gsigma = cotangents
    # weights enter the bwd kernel in the compute dtype (halves their
    # VMEM footprint); dW still accumulates in f32.
    ws = tuple(jnp.asarray(w, compute_dtype) for w in params_flat)
    grads = _bwd(points, viewdirs, ws, grgb,
                 gsigma[:, None], compute_dtype, interpret)
    return (tuple(grads), jnp.zeros_like(points),
            jnp.zeros_like(viewdirs))


fused_nerf_mlp.defvjp(_vjp_fwd, _vjp_bwd)
