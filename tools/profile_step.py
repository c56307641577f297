#!/usr/bin/env python
"""Decompose the flagship train-step time on the real TPU.

Times (with a scalar-readback sync, since block_until_ready is a no-op
through the axon tunnel) each stage of the --fast_sampling step and the
parity step at flagship shapes, to show where the milliseconds go:

  - full step (fwd+bwd+adam) for parity and fast paths
  - fwd-only render for both
  - big-MLP-only fwd and fwd+bwd (matmuls at the same point count)
  - proposal level only (posenc + tiny MLP + weights)
  - inverse-CDF resample only
  - interlevel loss only

Usage: python tools/profile_step.py [--steps 50]
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
    """Force device completion via scalar readback."""
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, iters=20):
    sync(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch_lr", type=int, default=512)
    ap.add_argument("--N_importance", type=int, default=64,
                    help="fast-path big-MLP samples (a third config is "
                         "profiled when any of --N_importance/--n_prop/"
                         "--n_prop_levels/--n_prop2 differs from its "
                         "default)")
    ap.add_argument("--n_prop", type=int, default=64)
    ap.add_argument("--n_prop_levels", type=int, default=1)
    ap.add_argument("--n_prop2", type=int, default=32)
    args = ap.parse_args()

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.utils.devbench import (enable_compile_cache,
                                           grouped_buffer)

    enable_compile_cache()

    ds = 2
    n_rays = args.batch_lr * ds * ds  # 2048 HR rays

    buffer = grouped_buffer(1 << 16, ds * ds)

    results = {}
    configs = [("parity", {}), ("fast", dict(fast_sampling=True))]
    if (args.N_importance, args.n_prop,
            args.n_prop_levels, args.n_prop2) != (64, 64, 1, 32):
        configs.append((
            f"fast{args.N_importance}"
            f"{'lv' + str(args.n_prop_levels) if args.n_prop_levels > 1 else ''}",
            dict(fast_sampling=True, N_importance=args.N_importance,
                 n_prop=args.n_prop, n_prop_levels=args.n_prop_levels,
                 n_prop2=args.n_prop2)))
    for name, extra in configs:
        kwargs = dict(
            model="nerf_downX", dataset_mode="llff_downX",
            batch_size=args.batch_lr, N_coarse=64, N_importance=64,
            precision="mixed", white_bkgd=False, noise_std=1.0,
            downscale=ds, include_var=True, n_epochs=30,
            n_epochs_decay=10)
        kwargs.update(extra)
        opt = default_options("train", **kwargs)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=2000)
        key = jax.random.PRNGKey(0)

        # full step via the scan (amortizes dispatch like bench.py).
        # train_steps_scan donates state -> must thread it through.
        state, losses = system.train_steps_scan(state, buffer, 50, key)
        sync(losses["tot"])  # compile + settle
        t0 = time.perf_counter()
        state, losses = system.train_steps_scan(state, buffer, 50, key)
        sync(losses["tot"])
        results[f"{name}/full_step(scan50)"] = \
            (time.perf_counter() - t0) / 50 * 1e3

        # single dispatched step (state donated -> thread through)
        st2 = system.create_state(jax.random.PRNGKey(0),
                                  steps_per_epoch=2000)
        st2, losses = system.train_step_from_buffer(st2, buffer, key)
        sync(losses["tot"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st2, losses = system.train_step_from_buffer(st2, buffer, key)
        sync(losses["tot"])
        results[f"{name}/full_step(dispatch)"] = \
            (time.perf_counter() - t0) / args.iters * 1e3

        # fwd-only loss (no grad)
        batch = jax.tree_util.tree_map(lambda x: x[:args.batch_lr], buffer)

        @jax.jit
        def fwd_loss(params):
            loss, _ = system._loss_fn(params, batch, key)
            return loss
        results[f"{name}/fwd_loss"] = timeit(
            fwd_loss, state.params, iters=args.iters)

        # grad-only (no adam)
        @jax.jit
        def grad_only(params):
            g = jax.grad(lambda p: system._loss_fn(p, batch, key)[0])(params)
            return g
        results[f"{name}/fwd+bwd"] = timeit(
            grad_only, state.params, iters=args.iters)

        del system, state, st2

    # isolated pieces at fast-path shapes: 2048 rays
    from nerfsr_tpu.core.encoding import positional_encoding
    from nerfsr_tpu.core.rendering import compute_weights
    from nerfsr_tpu.core.sampling import (sample_along_rays,
                                          sample_pdf_stratified)
    from nerfsr_tpu.models.mlp import ProposalMLP, VanillaMLP

    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.randn(n_rays, 3).astype(np.float32) * 0.1)
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    near = jnp.zeros((n_rays, 1))
    far = jnp.ones((n_rays, 1))
    key = jax.random.PRNGKey(0)

    # big MLP fwd / fwd+bwd at 64 pts/ray (fast) and 192 (parity fine+coarse)
    mlp = VanillaMLP(compute_dtype=jnp.bfloat16)
    for s in (64, 192):
        pts = jnp.asarray(rng.randn(n_rays, s, 3).astype(np.float32))
        emb = positional_encoding(pts, 10, True, True)
        demb = positional_encoding(dirs, 4, True, True)
        demb_b = jnp.broadcast_to(demb[:, None, :], (n_rays, s, 27))
        params = mlp.init(key, emb, demb_b)

        @jax.jit
        def mlp_fwd(params, emb=emb, demb_b=demb_b):
            rgb, sigma = mlp.apply(params, emb, demb_b)
            return jnp.sum(rgb) + jnp.sum(sigma)
        results[f"bigmlp_fwd/{s}pts"] = timeit(mlp_fwd, params,
                                               iters=args.iters)

        @jax.jit
        def mlp_grad(params, emb=emb, demb_b=demb_b):
            return jax.grad(lambda p: jnp.sum(
                mlp.apply(p, emb, demb_b)[0]))(params)
        results[f"bigmlp_fwd+bwd/{s}pts"] = timeit(mlp_grad, params,
                                                   iters=args.iters)

    # proposal level: stratified sample + posenc(deg6) + tiny MLP + weights
    prop = ProposalMLP(compute_dtype=jnp.bfloat16)
    z0, pts0 = sample_along_rays(key, o, dirs, near, far, 64, True, False)
    pemb = positional_encoding(pts0, 6, True, True)
    pparams = prop.init(key, pemb)

    @jax.jit
    def prop_level(pparams):
        z, pts = sample_along_rays(key, o, dirs, near, far, 64, True, False)
        e = positional_encoding(pts, 6, True, True)
        sg = prop.apply(pparams, e)
        w = compute_weights(sg, z, "relu")
        return jnp.sum(w)
    results["prop_level_fwd"] = timeit(prop_level, pparams,
                                       iters=args.iters)

    @jax.jit
    def prop_level_grad(pparams):
        return jax.grad(lambda p: prop_level.__wrapped__(p))(pparams)
    results["prop_level_fwd+bwd"] = timeit(prop_level_grad, pparams,
                                           iters=args.iters)

    # resample only
    w = jnp.asarray(rng.rand(n_rays, 64).astype(np.float32))

    @jax.jit
    def resample(w):
        bins = 0.5 * (z0[..., :-1] + z0[..., 1:])
        z = sample_pdf_stratified(key, bins, w[..., 1:-1], 64, True)
        return jnp.sum(z)
    results["resample_stratified"] = timeit(resample, w, iters=args.iters)

    # interlevel loss only
    from nerfsr_tpu.models.criterions import interlevel_loss
    zf = jnp.sort(jnp.asarray(rng.rand(n_rays, 64).astype(np.float32)),
                  axis=-1)
    wf = jnp.asarray(rng.rand(n_rays, 64).astype(np.float32))

    # roles: (z_fine, w_fine, z_prop, w_prop); the training gradient
    # flows to w_prop only (w_fine is stop-gradient'ed inside the loss)
    @jax.jit
    def inter(wp):
        return interlevel_loss(zf, wf, z0, wp)
    results["interlevel_loss_fwd"] = timeit(inter, w, iters=args.iters)

    @jax.jit
    def inter_grad(wp):
        return jax.grad(lambda ww: interlevel_loss(zf, wf, z0, ww))(wp)
    results["interlevel_loss_fwd+bwd"] = timeit(inter_grad, w,
                                                iters=args.iters)

    # posenc deg10 alone at 131K pts
    pts = jnp.asarray(rng.randn(n_rays, 64, 3).astype(np.float32))

    @jax.jit
    def posenc(pts):
        return jnp.sum(positional_encoding(pts, 10, True, True))
    results["posenc_deg10_64pts"] = timeit(posenc, pts, iters=args.iters)

    # adam update alone
    import optax
    opt2 = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        batch_size=args.batch_lr, N_coarse=64, N_importance=64,
        precision="mixed", downscale=ds, fast_sampling=True,
        n_epochs=30, n_epochs_decay=10)
    system = create_model(opt2)
    state = system.create_state(jax.random.PRNGKey(0), steps_per_epoch=2000)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    @jax.jit
    def adam(state, grads):
        updates, opt_state = system.tx.update(grads, state.opt_state,
                                              state.params)
        return optax.apply_updates(state.params, updates)
    results["adam_update"] = timeit(adam, state, grads, iters=args.iters)

    print(f"\n=== step profile (ms), {n_rays} HR rays ===")
    for k, v in results.items():
        print(f"{k:36s} {v:8.3f}")


if __name__ == "__main__":
    main()
