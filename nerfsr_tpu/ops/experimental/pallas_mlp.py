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
the VPU); moving the encoding outside (v2) brings it to 9.9 ms ~= XLA —
both sit at ~57 TFLOP/s, i.e. XLA already achieves the practical matmul
throughput for these shapes. The v3 backward below is fully
tile-aligned (pre-split skip/dir weights — no 319/283 concats, no
activation slices, >=8-row outputs, zero-padded 64/32-lane inputs) and
matches flax gradients to 5e-3 in interpreter mode
(tests/test_pallas.py). On-device it still crashes the environment's
remote AOT Mosaic compiler (opaque HTTP 500) even single-tile, while
EVERY constituent op — narrow transposed dots, 26-output scratch
accumulation, the full forward — compiles standalone: the combined
program trips an internal compiler limit. Stays OPT-IN
(--use_pallas_mlp); the benchmark path uses the XLA MLP.

Because of that compiler limit the DEFAULT backward is now the 'xla'
fallback (``_bwd_xla``): recompute the identical forward math in pure
jnp and differentiate — always compiles, so --use_pallas_mlp trains on
device (fused fwd + XLA bwd). --pallas_mlp_bwd pallas selects the v3
kernel where the toolchain allows it.
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


# ---------------------------------------------------------------------------
# backward (v3): every kernel tensor is tile-aligned.
#
# Mosaic bisection showed the crash survives tiny-dim-matmul removal; the
# remaining unaligned citizens were the 319/283-wide skip/dir concats, the
# (T, 283)[:, :256] activation slice, and 1/3-row outputs. v3 removes them
# ALL: the skip and dir-branch weights enter PRE-SPLIT (concat-matmul ==
# sum of two matmuls), inputs are zero-padded to 64/32 lanes, and every
# dW/db output is emitted at >=8-row aligned shapes (padding stripped
# outside the kernel).
# ---------------------------------------------------------------------------

C_POS_P = 64   # x0 padded
C_DIR_P = 32   # dir emb padded
PAD8 = 8


def _rowpad(vec, rows=PAD8):
    """(C,) row vector -> (rows, C) with the value in row 0 (pure concat,
    no scatter)."""
    v = vec[None, :]
    return jnp.concatenate(
        [v, jnp.zeros((rows - 1, v.shape[1]), v.dtype)], axis=0)


def _bwd_kernel_v3(x0_ref, dmb_ref, grgb_ref, gsig_ref, *refs,
                   compute_dtype):
    """refs layout: 9 trunk kernels (li0..3, skip_x, skip_h, li5..7),
    w_fin, wdir_feat, wdir_d, w_rgb8, w_rgb_t8, w_sig_t,
    b1..b8, b_fin, b_dir, b_rgb8  (18 biases-ish: 8 trunk + fin + dir +
    rgb8) -> then 24 outputs -> then 24 scratch (same shapes)."""
    f32 = jnp.float32
    cd = compute_dtype
    n_w_in = 9 + 6 + 11               # trunk + head weights + biases
    wk = [r[:] for r in refs[:9]]     # trunk kernels (split skip)
    w_fin, wdir_feat, wdir_d, w_rgb8, w_rgb_t8 = \
        (r[:] for r in refs[9:14])
    w_sig_t = refs[14][:]
    biases = [r[:] for r in refs[15:15 + 11]]  # b1..b8, bfin, bdir, brgb8
    n_out = (len(refs) - n_w_in) // 2
    out_refs = refs[n_w_in:n_w_in + n_out]
    scratch = refs[n_w_in + n_out:]

    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        for s in scratch:
            s[:] = jnp.zeros_like(s)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def dotT(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def dot_wT(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    # ---- forward recompute (split weights, padded inputs) ----
    x0 = x0_ref[:].astype(cd)         # (T, 64)
    dmb = dmb_ref[:].astype(cd)       # (T, 32)
    acts = []
    h = x0
    ki = 0
    for li in range(D):
        if li == SKIP:
            pre = dot(x0, wk[ki]) + dot(h, wk[ki + 1]) + biases[li]
            ki += 2
        else:
            pre = dot(h, wk[ki]) + biases[li]
            ki += 1
        h = jnp.maximum(pre, 0.0).astype(cd)
        acts.append(h)
    feat = (dot(h, w_fin) + biases[8]).astype(cd)
    g = jnp.maximum(
        dot(feat, wdir_feat) + dot(dmb, wdir_d) + biases[9],
        0.0).astype(cd)
    rgb8 = jax.nn.sigmoid(dot(g, w_rgb8) + biases[10])   # (T, 8)

    # ---- backward ----
    grgb8 = grgb_ref[:]               # (T, 8), cols>=3 zero
    gsig8 = gsig_ref[:]               # (T, 8), col 0 real

    grads = []
    grgb_pre = (grgb8 * rgb8 * (1.0 - rgb8)).astype(cd)
    dwrgbT8 = dotT(grgb_pre, g)                       # (8, 128)
    dbrgb8 = _rowpad(jnp.sum(grgb_pre, axis=0))       # (8, 8)
    gg = (grgb_pre[:, 0:1] * w_rgb_t8[0:1, :]
          + grgb_pre[:, 1:2] * w_rgb_t8[1:2, :]
          + grgb_pre[:, 2:3] * w_rgb_t8[2:3, :])
    gg = (gg * (g > 0)).astype(cd)

    dwdir_feat = dotT(feat, gg)                       # (256, 128)
    dwdir_d = dotT(dmb, gg)                           # (32, 128)
    dbdir8 = _rowpad(jnp.sum(gg, axis=0))             # (8, 128)
    gfeat = dot_wT(gg, wdir_feat).astype(cd)          # (T, 256)

    h_last = acts[-1]
    dwfin = dotT(h_last, gfeat)                       # (256, 256)
    dbfin8 = _rowpad(jnp.sum(gfeat, axis=0))          # (8, 256)
    gsig_col = gsig8[:, 0:1]                          # (T, 1)
    dwsigT8 = _rowpad(jnp.sum(h_last.astype(f32) * gsig_col,
                              axis=0))                # (8, 256)
    dbsig8 = _rowpad(jnp.sum(gsig8, axis=0))          # (8, 8) col0 real
    gh = (dot_wT(gfeat, w_fin)
          + gsig_col * w_sig_t).astype(cd)            # (T, 256)

    trunk_grads = []
    ki = 9
    for li in range(D - 1, -1, -1):
        gh = (gh * (acts[li] > 0)).astype(cd)
        db8 = _rowpad(jnp.sum(gh, axis=0))            # (8, 256)
        if li == SKIP:
            h_prev = acts[li - 1]
            dwx = dotT(x0, gh)                        # (64, 256)
            dwh = dotT(h_prev, gh)                    # (256, 256)
            trunk_grads.append((li, [dwx, dwh, db8]))
            gh = dot_wT(gh, wk[SKIP + 1])             # via skip_h part
        else:
            h_in = x0 if li == 0 else acts[li - 1]
            dw = dotT(h_in, gh)
            trunk_grads.append((li, [dw, db8]))
            if li > 0:
                w_idx = li if li < SKIP else li + 1   # split-skip offset
                gh = dot_wT(gh, wk[w_idx])

    # flatten in ascending layer order, then heads — must match the
    # wrapper's output unpacking
    grads = []
    for li, gs in sorted(trunk_grads):
        grads.extend(gs)
    grads.extend([dwfin, dbfin8, dwsigT8, dbsig8,
                  dwdir_feat, dwdir_d, dbdir8, dwrgbT8, dbrgb8])

    for s, gval in zip(scratch, grads):
        s[:] += gval

    @pl.when(i == n_prog - 1)
    def _write():
        for o, s in zip(out_refs, scratch):
            o[:] = s[:]


def _pad_cols(x, total):
    pad = total - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)


def _pad_rows(x, total):
    pad = total - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _bwd(points, viewdirs, ws, grgb, gsigma, compute_dtype, interpret):
    """Prepare aligned/split inputs, run the v3 kernel, reassemble the
    standard flat gradient list."""
    n = points.shape[0]
    t = _pick_tile(n, largest=256)
    x0, dmb = _embed(points, viewdirs)
    x0p = _pad_cols(x0, C_POS_P)
    dmbp = _pad_cols(dmb, C_DIR_P)
    grgb8 = _pad_cols(grgb, PAD8)
    gsig8 = _pad_cols(gsigma, PAD8)

    cd = compute_dtype
    kernels = [jnp.asarray(ws[2 * li], cd) for li in range(D)]
    biases = [jnp.asarray(ws[2 * li + 1], cd) for li in range(D)]
    # split + pad trunk kernels
    trunk = [_pad_rows(kernels[0], C_POS_P)]          # li0 (64, 256)
    trunk += [kernels[li] for li in range(1, SKIP)]
    trunk += [_pad_rows(kernels[SKIP][:C_POS], C_POS_P),   # skip_x
              kernels[SKIP][C_POS:]]                        # skip_h
    trunk += [kernels[li] for li in range(SKIP + 1, D)]
    w_fin = jnp.asarray(ws[2 * D], cd)
    b_fin = jnp.asarray(ws[2 * D + 1], cd)
    w_sig = jnp.asarray(ws[2 * D + 2], cd)            # (256, 1)
    w_dir = jnp.asarray(ws[2 * D + 4], cd)            # (283, 128)
    b_dir = jnp.asarray(ws[2 * D + 5], cd)
    w_rgb = jnp.asarray(ws[2 * D + 6], cd)            # (128, 3)
    b_rgb = jnp.asarray(ws[2 * D + 7], cd)            # (1, 3)
    wdir_feat = w_dir[:W]
    wdir_d = _pad_rows(w_dir[W:], C_DIR_P)
    w_rgb8 = _pad_cols(w_rgb, PAD8)                   # (128, 8)
    w_rgb_t8 = _pad_rows(jnp.swapaxes(w_rgb, 0, 1), PAD8)  # (8, 128)
    w_sig_t = jnp.swapaxes(w_sig, 0, 1)               # (1, 256)
    b_rgb8 = _pad_cols(b_rgb, PAD8)

    w_inputs = trunk + [w_fin, wdir_feat, wdir_d, w_rgb8, w_rgb_t8,
                        w_sig_t] + biases + [b_fin, b_dir, b_rgb8]

    # output shapes, ascending trunk order then heads (kernel order)
    out_shapes = []
    for li in range(D):
        if li == SKIP:
            out_shapes += [(C_POS_P, W), (W, W), (PAD8, W)]
        elif li == 0:
            out_shapes += [(C_POS_P, W), (PAD8, W)]
        else:
            out_shapes += [(W, W), (PAD8, W)]
    out_shapes += [(W, W), (PAD8, W),            # fin
                   (PAD8, W), (PAD8, PAD8),      # sigma (dwT, db)
                   (W, W_HALF), (C_DIR_P, W_HALF), (PAD8, W_HALF),  # dir
                   (PAD8, W_HALF), (PAD8, PAD8)]  # rgb (dwT8, db8)

    kernel = functools.partial(_bwd_kernel_v3, compute_dtype=cd)
    data_specs = [
        pl.BlockSpec((t, C_POS_P), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, C_DIR_P), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, PAD8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t, PAD8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n // t,),
        in_specs=data_specs + _weight_specs(w_inputs),
        out_specs=[pl.BlockSpec(s, lambda i, _nd=len(s): (0,) * _nd,
                                memory_space=pltpu.VMEM)
                   for s in out_shapes],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32)
                   for s in out_shapes],
        scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in out_shapes],
        interpret=interpret,
    )(x0p, dmbp, grgb8, gsig8, *w_inputs)

    # reassemble the standard flat grads (kernel, bias) x PARAM_NAMES
    out = list(out)
    grads = []
    oi = 0
    for li in range(D):
        if li == SKIP:
            dwx, dwh, db8 = out[oi:oi + 3]
            oi += 3
            grads += [jnp.concatenate([dwx[:C_POS], dwh], axis=0),
                      db8[0:1]]
        else:
            dw, db8 = out[oi:oi + 2]
            oi += 2
            dw = dw[:C_POS] if li == 0 else dw
            grads += [dw, db8[0:1]]
    dwfin, dbfin8, dwsigT8, dbsig8, dwdf, dwdd, dbdir8, dwrgbT8, \
        dbrgb8 = out[oi:oi + 9]
    grads += [dwfin, dbfin8[0:1]]
    grads += [jnp.swapaxes(dwsigT8[0:1], 0, 1), dbsig8[0:1, 0:1]]
    grads += [jnp.concatenate([dwdf, dwdd[:C_DIR]], axis=0),
              dbdir8[0:1]]
    grads += [jnp.swapaxes(dwrgbT8[0:3], 0, 1), dbrgb8[0:1, 0:3]]
    return grads


def _bwd_xla(params_flat, points, viewdirs, grgb, gsigma, compute_dtype):
    """XLA fallback backward: recompute the forward with the SAME math
    (``_fwd_pass`` is pure jnp) and let XLA differentiate w.r.t. the
    weights. Keeps the fused Pallas forward usable for training on
    devices where the combined ~30-matmul backward kernel trips the
    Mosaic compiler (see module STATUS). Input grads stay zero — same
    contract as the Pallas backward."""
    x0, dmb = _embed(points, viewdirs)

    def f(ws):
        rgb, sigma, _ = _fwd_pass(x0, dmb, ws, compute_dtype)
        return rgb, sigma[:, 0]

    _, vjp = jax.vjp(f, params_flat)
    (grads,) = vjp((grgb, gsigma))
    return list(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp(params_flat, points, viewdirs, compute_dtype,
                   interpret=False, bwd_mode="xla"):
    """(rgb (N,3), sigma (N,)) from raw points/viewdirs (N,3).

    params_flat: flatten_params(flax_variables) tuple, f32 masters
    (cast to compute_dtype happens outside the kernel, once per step).
    bwd_mode: 'xla' (default; recompute-and-differentiate fallback that
    always compiles) or 'pallas' (the fused v3 backward kernel).
    """
    ws = tuple(jnp.asarray(w) for w in params_flat)
    rgb, sigma = _fwd(points, viewdirs, ws, compute_dtype, interpret)
    return rgb, sigma[:, 0]


def _vjp_fwd(params_flat, points, viewdirs, compute_dtype, interpret,
             bwd_mode):
    out = fused_nerf_mlp(params_flat, points, viewdirs, compute_dtype,
                         interpret, bwd_mode)
    return out, (params_flat, points, viewdirs)


def _vjp_bwd(compute_dtype, interpret, bwd_mode, residuals, cotangents):
    params_flat, points, viewdirs = residuals
    grgb, gsigma = cotangents
    if bwd_mode == "xla":
        grads = _bwd_xla(params_flat, points, viewdirs, grgb, gsigma,
                         compute_dtype)
    else:
        # weights enter the bwd kernel in the compute dtype (halves their
        # VMEM footprint); dW still accumulates in f32.
        ws = tuple(jnp.asarray(w, compute_dtype) for w in params_flat)
        grads = _bwd(points, viewdirs, ws, grgb,
                     gsigma[:, None], compute_dtype, interpret)
    return (tuple(grads), jnp.zeros_like(points),
            jnp.zeros_like(viewdirs))


fused_nerf_mlp.defvjp(_vjp_fwd, _vjp_bwd)
