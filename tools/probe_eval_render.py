#!/usr/bin/env python
"""Profile the eval render path (VERDICT r3 weak #4: eval is 45% slower
per ray than TRAINING at the same config, despite having no backward).

Decomposes one flagship-sized image render (504x378 = 190512 HR rays)
into:
  - device compute at a range of eval chunk sizes (the production path
    lax.map's fixed-size chunks inside ONE dispatch; if per-ray
    throughput degrades with chunk size, eval inherits the superlinear
    batch-size degradation the train step shows past 512 LR px)
  - dispatch + readback overhead (time with NO readback of rgb/depth vs
    full readback)
  - multi-pose batching: k poses rendered in one dispatch

Usage: python tools/probe_eval_render.py [--chunks 4096 8192 16384 32768]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[2048, 4096, 8192, 16384, 32768])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--poses", type=int, default=8,
                    help="multi-view loop length for the pipeline A/B")
    args = ap.parse_args()

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.utils.devbench import enable_compile_cache

    enable_compile_cache()
    ds = 2
    n_lr = (504 * 378) // (ds * ds)
    n = n_lr * ds * ds  # 190512 HR rays

    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        batch_size=512, N_coarse=64, N_importance=16, n_prop=48,
        n_prop_levels=2, n_prop2=24, prop_W=48, prop_D=3,
        precision="mixed", white_bkgd=False, noise_std=1.0,
        downscale=ds, include_var=True, fast_sampling=True,
        img_wh=(504, 378), n_epochs=30, n_epochs_decay=10)
    system = create_model(opt)
    state = system.create_state(jax.random.PRNGKey(0),
                                steps_per_epoch=2000)

    rng = np.random.RandomState(1)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
    spec = {"c2w": np.eye(3, 4, dtype=np.float32),
            "geom": ("world", 0.0, 1.0)}

    def timed(fn, reps):
        fn()  # compile/settle
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    print(f"image = {n} HR rays; production render_pose per chunk size:")
    for chunk in args.chunks:
        t = timed(lambda: system.render_pose(
            state.params, spec, dirs, chunk=chunk), args.reps)
        print(f"  chunk {chunk:>6}: {1e3*t:8.1f} ms  "
              f"{n/t/1e3:10.0f} K rays/s")

    # DEVICE-ONLY sweep (VERDICT r4 weak #3): scalar readback isolates
    # device compute from the tunnel's transfer cost at EVERY chunk
    # size — the render_pose sweep above confounds the two, and the
    # 4096 default was picked from the confounded numbers.
    c2w = jnp.asarray(np.stack([spec["c2w"], spec["c2w"]]))
    print("device-only (scalar readback) per chunk size:")
    t_by_chunk = {}
    for chunk in args.chunks:
        padded = dirs if n % chunk == 0 else np.concatenate(
            [dirs, np.repeat(dirs[-1:], (-n) % chunk, axis=0)])
        stacked = jnp.asarray(padded.reshape(-1, chunk, 3))

        def render_sum(params, dirs_stacked, chunk=chunk):
            out = system.eval_image_device_pose.__wrapped__(
                system, params, dirs_stacked, c2w, spec["geom"], chunk)
            return jnp.float32(sum(jnp.sum(v) for v in out.values()))

        rs = jax.jit(render_sum)
        t = timed(lambda: float(rs(state.params, stacked)), args.reps)
        t_by_chunk[chunk] = t
        print(f"  chunk {chunk:>6}: {1e3*t:8.1f} ms  "
              f"{n/t/1e3:10.0f} K rays/s")
    chunk = min(t_by_chunk, key=t_by_chunk.get)
    t_dev = t_by_chunk[chunk]
    print(f"best device-only chunk: {chunk} "
          f"({n/t_dev/1e3:.0f} K rays/s)")
    padded = dirs if n % chunk == 0 else np.concatenate(
        [dirs, np.repeat(dirs[-1:], (-n) % chunk, axis=0)])
    stacked = jnp.asarray(padded.reshape(-1, chunk, 3))

    def full():
        out = system.eval_image_device_pose(
            state.params, stacked, c2w, spec["geom"], chunk)
        out = jax.tree_util.tree_map(np.asarray, out)
        return out

    t_full = timed(full, args.reps)
    print(f"full readback @chunk {chunk}: {1e3*t_full:.1f} ms = "
          f"{n/t_full/1e3:.0f} K rays/s  "
          f"(readback+host {1e3*(t_full-t_dev):.1f} ms)")

    # pipelined multi-view path (render_eval_many): dispatch view i+1
    # before view i's readback — compute should overlap the transfer.
    k = args.poses

    class _DS:
        def eval_raygen_spec(self, idx):
            return {"c2w": np.eye(3, 4, dtype=np.float32),
                    "geom": ("world", 0.0, 1.0)}

        def eval_dirs(self_inner):
            return dirs

    ds_obj = _DS()

    def serial():
        for i in range(k):
            system.render_eval(state.params, ds_obj, i)

    def pipelined():
        for _ in system.render_eval_many(state.params, ds_obj, range(k)):
            pass

    def pipelined_q():
        # the artifact-loop config: uint8 rgb readback (1/4 payload;
        # the {i}-*-ori.png strips ARE uint8 — ADVICE r4 #3's question
        # is whether validate's extra quantized visual render costs
        # anything once metrics moved on device)
        for _ in system.render_eval_many(state.params, ds_obj, range(k),
                                         quantize_rgb=True):
            pass

    t_ser = timed(serial, max(2, args.reps // 2))
    t_pipe = timed(pipelined, max(2, args.reps // 2))
    t_pipe_q = timed(pipelined_q, max(2, args.reps // 2))
    print(f"{k}-pose loop serial render_eval: {1e3*t_ser:.0f} ms "
          f"({1e3*t_ser/k:.1f} ms/img, {k*n/t_ser/1e3:.0f} K rays/s)")
    print(f"{k}-pose loop render_eval_many:   {1e3*t_pipe:.0f} ms "
          f"({1e3*t_pipe/k:.1f} ms/img, {k*n/t_pipe/1e3:.0f} K rays/s, "
          f"{t_ser/t_pipe:.2f}x)")
    print(f"{k}-pose loop many+quantize_rgb:  {1e3*t_pipe_q:.0f} ms "
          f"({1e3*t_pipe_q/k:.1f} ms/img, {k*n/t_pipe_q/1e3:.0f} "
          f"K rays/s, {t_ser/t_pipe_q:.2f}x)")

    # device-metric path (eval_metrics_fast): scalars only. downX gt is
    # LR pixels (n / ds^2 rows); omit rgbs_ori (metrics then reduce to
    # the LR PSNR — the render dominates the timing either way).
    class _MDS(_DS):
        def image_rays(self, idx):
            rng2 = np.random.RandomState(2)
            return {"rgbs": rng2.rand(n // (ds * ds),
                                      3).astype(np.float32)}

    mds = _MDS()

    def metrics():
        m = system.eval_metrics_fast(state.params, mds, 0)
        assert m is not None

    # sweep the metric path across chunk sizes too (the production
    # default comes from _eval_chunk_size; --ray_chunk overrides it)
    for mc in args.chunks:
        system.opt.ray_chunk = mc
        t_m = timed(metrics, args.reps)
        print(f"eval_metrics_fast @chunk {mc:>6}: {1e3*t_m:8.1f} ms/img "
              f"= {n/t_m/1e3:.0f} K rays/s")


if __name__ == "__main__":
    main()
