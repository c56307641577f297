#!/usr/bin/env python
"""Refinement-stage test entry (parity surface: reference
``test_refine.py`` CLI; ``scripts/test_llff_refine.sh`` works against
this). Tiles each image, refines patches, stitches via start_locs and
reports SSIM/PSNR of input vs refined."""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import test_refine


def main():
    opt = parse_options("test")
    print(save_options(opt))
    test_refine(opt)


if __name__ == "__main__":
    main()
