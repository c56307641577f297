#!/usr/bin/env python
"""Flagship end-to-end run: LLFF x2 supersampling at the paper's real
config sizes (504x378 HR from 252x189 LR supervision, batch 512 LR px,
64+64 samples) on a synthetic COLMAP scene, trained to convergence on
the TPU, reporting LR/HR PSNR + SSIM.

This validates the full north-star configuration (BASELINE.md) in an
environment with no real datasets. Usage:

  python tools/flagship_run.py [out_dir] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # allow_abbrev=False: the preset/explicit-flag interplay compares
    # argv spellings; abbreviations would silently lose to the preset
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("out_dir", nargs="?", default="/tmp/flagship")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--wh", type=int, nargs=2, default=[504, 378])
    p.add_argument("--n_imgs", type=int, default=8)
    p.add_argument("--downscale", type=int, default=2,
                   help="supersampling factor ds (renders at --wh, "
                        "supervises at wh/ds; the reference's x4 config "
                        "is --wh 1008 756 --downscale 4 --batch_size "
                        "128, scripts/train_llff_downX.sh:19)")
    p.add_argument("--batch_size", type=int, default=512,
                   help="LR pixels per step (x ds^2 HR rays)")
    from nerfsr_tpu.config import FAST_PRESETS
    p.add_argument("--fast_preset", type=str, default=None,
                   choices=sorted(FAST_PRESETS),
                   help="expand a validated config preset "
                        "(see config.FAST_PRESETS); explicit flags "
                        "passed here still override preset values")
    p.add_argument("--fast_sampling", action="store_true",
                   help="proposal-MLP sampling (see config.py)")
    p.add_argument("--N_importance", type=int, default=64,
                   help="big-MLP samples/ray (fast path: the ONLY "
                        "big-MLP level)")
    p.add_argument("--n_prop", type=int, default=64,
                   help="proposal-MLP samples/ray (fast path)")
    p.add_argument("--n_prop_levels", type=int, default=1)
    p.add_argument("--n_prop2", type=int, default=32)
    p.add_argument("--prop_pad", type=float, default=0.01)
    p.add_argument("--prop_pad_anneal", type=int, default=0)
    p.add_argument("--prop_pad_final", type=float, default=0.0)
    p.add_argument("--fast_uniform_frac", type=float, default=0.0)
    p.add_argument("--prop_W", type=int, default=64,
                   help="proposal-MLP width (speed/quality experiments)")
    p.add_argument("--prop_D", type=int, default=4,
                   help="proposal-MLP depth")
    p.add_argument("--deg_prop", type=int, default=6,
                   help="proposal posenc degree")
    p.add_argument("--W", type=int, default=256,
                   help="big-MLP width (capacity/speed experiments)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--texture", action="store_true",
                   help="textured scene (config-discriminating; the "
                        "smooth-blob default saturates its data "
                        "ceiling for every config)")
    p.add_argument("--clutter", action="store_true",
                   help="add thin occluder rods (depth complexity; "
                        "discriminates N_importance/n_prop — the "
                        "blob-only scene rewards degenerate sample "
                        "counts)")
    p.add_argument("--specular", action="store_true",
                   help="Phong view-dependent highlights on the blobs "
                        "(stresses the dir-conditioned MLP + proposal "
                        "sampling; the third benchmark scene family)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if not os.environ.get("NERFSR_NO_COMPILE_CACHE"):
        from nerfsr_tpu.utils.devbench import enable_compile_cache
        enable_compile_cache()

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.data import create_dataset
    from nerfsr_tpu.engine import validate
    from nerfsr_tpu.models import create_model

    w, h = args.wh
    name = "scene"
    if args.texture:
        name += "_tex"
    if args.clutter:
        name += "_clut"
    if args.specular:
        name += "_spec"
    scene = os.path.join(args.out_dir, name)
    # reuse guard: points3D.bin is the LAST artifact the generator
    # writes (cameras.bin is first — a killed run would leave a scene
    # that "exists" but is torn), and a reused scene must match the
    # requested resolution (LANCZOS-upsampled stale images would
    # silently corrupt a higher-res run's supervision).
    done_marker = os.path.join(scene, "sparse/0/points3D.bin")
    if os.path.exists(done_marker):
        from PIL import Image
        imgs = sorted(os.listdir(os.path.join(scene, "images")))
        with Image.open(os.path.join(scene, "images", imgs[0])) as im:
            if im.size != (w, h) or len(imgs) != args.n_imgs:
                raise SystemExit(
                    f"[flagship] existing scene {scene} is "
                    f"{im.size}/{len(imgs)} imgs but this run wants "
                    f"({w}, {h})/{args.n_imgs} — use a different "
                    f"out_dir or delete the scene")
    else:
        print(f"[flagship] generating synthetic LLFF scene {w}x{h} "
              f"(texture={args.texture} clutter={args.clutter} "
              f"specular={args.specular})...")
        from tools.make_synthetic_llff import make_llff_scene
        make_llff_scene(scene, hw=(h, w), n_imgs=args.n_imgs,
                        texture=args.texture, clutter=args.clutter,
                        specular=args.specular)

    overrides = dict(
        model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=scene, img_wh=(w, h), downscale=args.downscale,
        batch_size=args.batch_size,
        N_coarse=64, N_importance=args.N_importance, precision="mixed",
        white_bkgd=False, noise_std=1.0, include_var=True,
        fast_sampling=args.fast_sampling, n_prop=args.n_prop,
        n_prop_levels=args.n_prop_levels, n_prop2=args.n_prop2,
        prop_pad=args.prop_pad,
        prop_pad_anneal=args.prop_pad_anneal,
        prop_pad_final=args.prop_pad_final,
        fast_uniform_frac=args.fast_uniform_frac, W=args.W,
        prop_W=args.prop_W, prop_D=args.prop_D,
        deg_prop=args.deg_prop,
        n_epochs=30, n_epochs_decay=10, lr=5e-4, lr_final=5e-6)
    if args.fast_preset:
        # preset values win over this script's passthrough defaults but
        # not over flags the user explicitly typed on the command line
        explicit_cli = {a.split("=")[0].lstrip("-")
                        for a in sys.argv[1:] if a.startswith("--")}
        from nerfsr_tpu.config import FAST_PRESETS
        for k in FAST_PRESETS[args.fast_preset]:
            if k not in explicit_cli:
                overrides.pop(k, None)
        overrides["fast_preset"] = args.fast_preset
    opt = default_options("train", **overrides)
    system = create_model(opt)
    print(f"[flagship] cfg: fast={system.render_cfg.fast_sampling} "
          f"n_imp={system.render_cfg.n_importance} "
          f"n_prop={system.render_cfg.n_prop} "
          f"levels={system.render_cfg.n_prop_levels} "
          f"n_prop2={system.render_cfg.n_prop2} "
          f"unifrac={system.render_cfg.uniform_frac} seed={args.seed}")
    ds = create_dataset(opt, "train")
    t0 = time.time()
    buf_np = ds.ray_buffer()
    print(f"[flagship] buffer: {buf_np['rgbs'].shape[0]} LR px "
          f"({time.time()-t0:.1f}s build)")
    buf = jax.tree_util.tree_map(jnp.asarray, buf_np)
    spe = max(1, buf_np["rgbs"].shape[0] // opt.batch_size)
    state = system.create_state(jax.random.PRNGKey(args.seed),
                                steps_per_epoch=spe)
    key = jax.random.PRNGKey(args.seed)

    total_schedule = spe * opt.n_epochs + spe * opt.n_epochs_decay
    if args.steps < spe * opt.n_epochs:
        print(f"[flagship] WARNING: --steps {args.steps} < the "
              f"{spe * opt.n_epochs}-step schedule the quality claims "
              f"assume — LR decay/pad anneal will not complete "
              f"(probe runs only)")
    del total_schedule
    K = 100
    steps = 0
    t0 = time.time()
    while steps < args.steps:
        state, losses = system.train_steps_scan(state, buf, K, key)
        steps += K
        if steps % 1000 == 0:
            scal = {k: float(v) for k, v in losses.items()
                    if k in ("fine_psnr", "fine_psnr_ori", "tot")}
            hr_rays = opt.batch_size * args.downscale ** 2 * steps
            print(f"[flagship] step {steps}: " + " ".join(
                f"{k}={v:.3f}" for k, v in scal.items()) +
                f" ({hr_rays/(time.time()-t0):,.0f} HR rays/s)",
                flush=True)

    train_s = time.time() - t0
    ck = sum(float(jnp.sum(jnp.abs(x)))
             for x in jax.tree_util.tree_leaves(state.params))
    print(f"[flagship] param_checksum={ck!r}")
    val = create_dataset(opt, "val")
    metrics = validate(opt, system, state.params, val,
                       out_dir=os.path.join(args.out_dir, "val_vis"))
    print("[flagship] FINAL val:", {k: round(v, 5)
                                    for k, v in metrics.items()})
    print(f"[flagship] {steps} steps in {train_s:.0f}s (train only)")


if __name__ == "__main__":
    main()
