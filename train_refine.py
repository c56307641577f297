#!/usr/bin/env python
"""Refinement-stage train entry (parity surface: reference
``train_refine.py`` CLI; ``scripts/train_llff_refine.sh`` works against
this)."""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import train_refine


def main():
    opt = parse_options("train")
    print(save_options(opt))
    train_refine(opt)


if __name__ == "__main__":
    main()
