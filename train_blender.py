#!/usr/bin/env python
"""Blender train entry: identical to train.py except the first 1000
iterations draw from the center-cropped ``train_crop`` split — NeRF's
warm-up against background collapse (parity: ``train_blender.py:77-82``
of the reference).
"""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import train


def main():
    opt = parse_options("train")
    print(save_options(opt))
    warmup = "train_crop" if opt.dataset_mode.startswith("blender") else None
    train(opt, warmup_mode=warmup, warmup_iters=1000)


if __name__ == "__main__":
    main()
