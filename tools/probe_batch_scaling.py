#!/usr/bin/env python
"""Root-cause probe for the superlinear batch scaling (VERDICT r3 weak
#3): step time grows ~2.3x per 2x batch past 512 LR px, which caps both
the single-chip number and multi-chip reasoning (a v4-8 runs 8x the
global batch per chip... it shouldn't — DP splits the batch — but eval
renders DO run 16x the train batch per chunk, inheriting the same
degradation).

Times the FULL fast-path train step plus each isolated component at a
range of batch sizes and prints per-HR-ray-normalized times, so the
superlinear component self-identifies. All timings use scalar-readback
sync (block_until_ready is a no-op through the axon tunnel) and a long
inner repeat so tunnel RTT amortizes.

Usage: python tools/probe_batch_scaling.py [--batches 512 1024 2048 4096]
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


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, iters=30):
    sync(fn(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / iters * 1e3)  # ms
    return sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--N_importance", type=int, default=16)
    ap.add_argument("--n_prop", type=int, default=48)
    ap.add_argument("--n_prop2", type=int, default=24)
    ap.add_argument("--prop_W", type=int, default=48)
    ap.add_argument("--prop_D", type=int, default=3)
    args = ap.parse_args()

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.models.criterions import interlevel_loss
    from nerfsr_tpu.core.encoding import positional_encoding
    from nerfsr_tpu.core.sampling import sample_pdf_stratified
    from nerfsr_tpu.models.mlp import VanillaMLP
    from nerfsr_tpu.utils.devbench import (enable_compile_cache,
                                           grouped_buffer)

    enable_compile_cache()
    ds = 2
    buffer = grouped_buffer(1 << 16, ds * ds)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    rows = {}  # component -> {batch: ms}
    for batch_lr in args.batches:
        n_rays = batch_lr * ds * ds
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            batch_size=batch_lr, N_coarse=64,
            N_importance=args.N_importance, n_prop=args.n_prop,
            n_prop_levels=2, n_prop2=args.n_prop2, prop_W=args.prop_W,
            prop_D=args.prop_D, precision="mixed", white_bkgd=False,
            noise_std=1.0, downscale=ds, include_var=True,
            fast_sampling=True, img_wh=(504, 378), n_epochs=30,
            n_epochs_decay=10)
        system = create_model(opt)
        state = system.create_state(key, steps_per_epoch=2000)

        # full step via scan (the bench's program shape)
        n_scan = max(50, (1 << 16) // batch_lr)  # ~constant work/scan
        state, losses = system.train_steps_scan(state, buffer, n_scan,
                                                key)
        sync(losses["tot"])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = system.train_steps_scan(
                state, buffer, n_scan, key)
            sync(losses["tot"])
            ts.append((time.perf_counter() - t0) / n_scan * 1e3)
        rows.setdefault("full_step_scan", {})[batch_lr] = sorted(ts)[1]

        batch = jax.tree_util.tree_map(lambda x: x[:batch_lr], buffer)

        @jax.jit
        def fwd_loss(params):
            loss, _ = system._loss_fn(params, batch, key)
            return loss
        rows.setdefault("fwd_loss", {})[batch_lr] = timeit(
            fwd_loss, state.params, iters=args.iters)

        @jax.jit
        def fwd_bwd(params):
            return jax.grad(
                lambda p: system._loss_fn(p, batch, key)[0])(params)
        rows.setdefault("fwd+bwd", {})[batch_lr] = timeit(
            fwd_bwd, state.params, iters=args.iters)

        # buffer row-gather alone (the scan samples batch rows/step)
        idx = jax.random.randint(key, (batch_lr,), 0,
                                 buffer["rgbs"].shape[0])

        @jax.jit
        def row_gather(idx):
            b = jax.tree_util.tree_map(lambda x: x[idx], buffer)
            return jnp.sum(b["origins"])
        rows.setdefault("buffer_row_gather", {})[batch_lr] = timeit(
            row_gather, idx, iters=args.iters)

        # big MLP fwd+bwd alone at N_importance pts/ray
        mlp = VanillaMLP(compute_dtype=jnp.bfloat16)
        pts = jnp.asarray(rng.randn(
            n_rays, args.N_importance, 3).astype(np.float32))
        emb = positional_encoding(pts, 10, True, True)
        dirs = rng.randn(n_rays, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        demb = positional_encoding(jnp.asarray(dirs), 4, True, True)
        demb_b = jnp.broadcast_to(
            demb[:, None, :], (n_rays, args.N_importance, 27))
        params = mlp.init(key, emb, demb_b)

        @jax.jit
        def mlp_grad(params, emb=emb, demb_b=demb_b):
            return jax.grad(lambda p: jnp.sum(
                mlp.apply(p, emb, demb_b)[0]))(params)
        rows.setdefault("bigmlp_fwd+bwd", {})[batch_lr] = timeit(
            mlp_grad, params, iters=args.iters)

        # inverse-CDF resample alone (n_prop bins -> N_importance draws)
        z0 = jnp.sort(jnp.asarray(
            rng.rand(n_rays, args.n_prop + 1).astype(np.float32)), -1)
        w = jnp.asarray(rng.rand(
            n_rays, args.n_prop + 1).astype(np.float32))

        @jax.jit
        def resample(w):
            bins = 0.5 * (z0[..., :-1] + z0[..., 1:])
            z = sample_pdf_stratified(key, bins, w[..., 1:-1],
                                      args.N_importance, True)
            return jnp.sum(z)
        rows.setdefault("resample", {})[batch_lr] = timeit(
            resample, w, iters=args.iters)

        # interlevel loss fwd+bwd
        zf = jnp.sort(jnp.asarray(rng.rand(
            n_rays, args.N_importance + 1).astype(np.float32)), -1)
        wf = jnp.asarray(rng.rand(
            n_rays, args.N_importance + 1).astype(np.float32))

        @jax.jit
        def inter_grad(wp):
            return jax.grad(
                lambda ww: interlevel_loss(zf, wf, z0, ww))(wp)
        rows.setdefault("interlevel_fwd+bwd", {})[batch_lr] = timeit(
            inter_grad, w, iters=args.iters)

        del system, state

    print("\n=== per-step ms by batch (LR px) ===")
    batches = args.batches
    hdr = "component".ljust(24) + "".join(f"{b:>10}" for b in batches)
    print(hdr)
    for comp, vals in rows.items():
        print(comp.ljust(24) + "".join(
            f"{vals.get(b, float('nan')):>10.3f}" for b in batches))
    print("\n=== normalized: ms per 512 LR px (flat = linear scaling) ===")
    print(hdr)
    for comp, vals in rows.items():
        print(comp.ljust(24) + "".join(
            f"{vals.get(b, float('nan')) * 512 / b:>10.3f}"
            for b in batches))


if __name__ == "__main__":
    main()
