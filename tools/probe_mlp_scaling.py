#!/usr/bin/env python
"""Isolate the superlinear batch scaling to the MLP backward (VERDICT
r3 weak #3, follow-up to tools/probe_batch_scaling.py which cleared
resample/interlevel/gather and implicated the fused fwd+bwd).

Times the production ``VanillaMLP`` forward and fwd+bwd at a sweep of
point counts and reports achieved TFLOP/s from analytic matmul FLOPs
(fwd = 2*m*n per 2-D kernel per point; bwd = 2x fwd), plus two control
experiments:

  - a bare 8-layer W-wide dense chain (no posenc/skips/heads) — if it
    degrades the same way the effect is XLA codegen on these shapes,
    not our model code;
  - the same MLP under ``jax.checkpoint`` (remat) — if backward HBM
    traffic from stored activations is the bottleneck, remat trades
    FLOPs for bandwidth and should close the gap at large N.

All timings amortize the tunnel's ~1 ms/dispatch submission cost over
``--iters`` queued dispatches with one scalar readback at the end.

Usage: python tools/probe_mlp_scaling.py [--pts 32768 65536 131072 262144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)  # ms
    return sorted(ts)[1]


def tree_matmul_flops(params):
    """2*m*n MACs->FLOPs per point for every 2-D kernel in the tree."""
    return sum(2 * int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params)
               if getattr(l, "ndim", 0) == 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, nargs="+",
                    default=[8192, 16384, 32768, 65536, 131072, 262144,
                             524288])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--W", type=int, default=256)
    ap.add_argument("--D", type=int, default=8)
    args = ap.parse_args()

    from nerfsr_tpu.models.mlp import ProposalMLP, VanillaMLP
    from nerfsr_tpu.core.encoding import positional_encoding
    from nerfsr_tpu.utils.devbench import enable_compile_cache

    enable_compile_cache()
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    rows = {}
    for n in args.pts:
        pts = jnp.asarray(rng.randn(n, 1, 3).astype(np.float32))
        emb = positional_encoding(pts, 10, True, True)
        dirs = rng.randn(n, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        demb = positional_encoding(jnp.asarray(dirs), 4, True, True)
        demb_b = demb[:, None, :]

        mlp = VanillaMLP(depth=args.D, width=args.W,
                         compute_dtype=jnp.bfloat16)
        params = mlp.init(key, emb, demb_b)
        fpp = tree_matmul_flops(params)  # fwd FLOPs per point

        # NOTE: inputs are passed as ARGUMENTS, not captured — captured
        # arrays become embedded HLO constants and overflow the remote
        # compile endpoint (HTTP 413) past ~100 MB.
        @jax.jit
        def fwd(p, emb, demb_b, mlp=mlp):
            return jnp.sum(mlp.apply(p, emb, demb_b)[0])

        @jax.jit
        def fwd_bwd(p, emb, demb_b, mlp=mlp):
            return jax.grad(lambda q: jnp.sum(
                mlp.apply(q, emb, demb_b)[0]))(p)

        @jax.jit
        def fwd_bwd_remat(p, emb, demb_b, mlp=mlp):
            f = jax.checkpoint(
                lambda q, e, d: jnp.sum(mlp.apply(q, e, d)[0]))
            return jax.grad(lambda q: f(q, emb, demb_b))(p)

        # bare dense chain control: D layers W->W in bf16 + relu
        Ws = [jnp.asarray(
            rng.randn(args.W, args.W).astype(np.float32) * 0.05)
            for _ in range(args.D)]
        x0 = jnp.asarray(rng.randn(n, args.W).astype(np.float32))

        @jax.jit
        def chain_bwd(ws, x0):
            def f(ws):
                x = x0.astype(jnp.bfloat16)
                for w in ws:
                    x = jax.nn.relu(x @ w.astype(jnp.bfloat16))
                return jnp.sum(x.astype(jnp.float32))
            return jax.grad(f)(ws)

        chain_fpp = args.D * 2 * args.W * args.W

        # the NI=16 primary's slim proposal net (W48/D3, posenc deg 6,
        # sigma-only): the skinny-matmul component the full-step probe
        # never isolated
        prop = ProposalMLP(depth=3, width=48,
                           compute_dtype=jnp.bfloat16)
        pemb = positional_encoding(pts, 6, True, True)
        pparams = prop.init(key, pemb)
        pfpp = tree_matmul_flops(pparams)

        @jax.jit
        def prop_bwd(p, pemb, prop=prop):
            return jax.grad(lambda q: jnp.sum(
                prop.apply(q, pemb)))(p)

        t_f = timeit(fwd, params, emb, demb_b, iters=args.iters)
        t_fb = timeit(fwd_bwd, params, emb, demb_b, iters=args.iters)
        t_fbr = timeit(fwd_bwd_remat, params, emb, demb_b,
                       iters=args.iters)
        t_ch = timeit(chain_bwd, Ws, x0, iters=args.iters)
        t_pr = timeit(prop_bwd, pparams, pemb, iters=args.iters)
        rows[n] = {
            "fwd": (t_f, n * fpp / t_f / 1e9),
            "fwd+bwd": (t_fb, 3 * n * fpp / t_fb / 1e9),
            "fwd+bwd remat": (t_fbr, 3 * n * fpp / t_fbr / 1e9),
            "chain bwd": (t_ch, 3 * n * chain_fpp / t_ch / 1e9),
            "prop bwd": (t_pr, 3 * n * pfpp / t_pr / 1e9),
        }
        print(f"n={n:>7}: " + "  ".join(
            f"{k} {v[0]:7.3f}ms {v[1]:6.1f}TF/s"
            for k, v in rows[n].items()), flush=True)


if __name__ == "__main__":
    main()
