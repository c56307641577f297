#!/usr/bin/env python
"""Depth-guided cross-view correspondence generator (CLI).

Replaces the reference ``warp.py`` (which hardcodes scene paths at
:182-189 and loops per pixel in Python) with a parameterized entry over
the vectorized TPU warp in ``nerfsr_tpu.ops.warp``. Reads the
``{i}-fine-depth-ori.npz`` depths produced by ``test.py`` on a
``nerf_downX`` checkpoint and writes ``{i}_locs.npz`` (consumed by the
llff_refine dataset) + ``{i}-wrapped.png`` previews.

Example:
  python warp.py --dataset_root <llff_scene> \
      --result_dir ./results/<name>/test_train_30 --img_wh 504 378
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--result_dir", required=True,
                   help="dir holding {i}-fine-depth-ori.npz from test.py")
    p.add_argument("--img_wh", type=int, nargs=2, required=True)
    p.add_argument("--spheric_poses", action="store_true")
    p.add_argument("--ref_idx", type=int, default=0)
    args = p.parse_args()

    from nerfsr_tpu.ops.warp import generate_correspondences

    written = generate_correspondences(
        args.dataset_root, args.result_dir, tuple(args.img_wh),
        spheric_poses=args.spheric_poses, ref_idx=args.ref_idx)
    print(f"wrote locs/wrapped for views: {written}")


if __name__ == "__main__":
    main()
