#!/usr/bin/env python
"""Train entry point (parity surface: reference ``train.py`` CLI; the
shell scripts under ``scripts/`` work against this).

Example (LLFF fern vanilla NeRF, reference scripts/train_llff.sh):
  python train.py --name llff-fern --dataset_mode llff \
      --dataset_root <scene> --img_wh 504 378 --batch_size 2048 \
      --model nerf --N_coarse 64 --N_importance 64 --n_epochs 30
"""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import train


def main():
    opt = parse_options("train")
    print(save_options(opt))
    warmup = "train_crop" if getattr(opt, "train_crop", False) else None
    train(opt, warmup_mode=warmup)


if __name__ == "__main__":
    main()
