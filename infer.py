#!/usr/bin/env python
"""Inference entry point.

The reference defines an infer phase (``options/infer_options.py``) but
ships no entry script and its ``model.inference`` is a stub
(``models/nerf_model.py:394-395``). Here infer = render the given split
from a checkpoint without ground-truth panels and write an HTML gallery.
"""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import test
from nerfsr_tpu.utils.html import write_gallery


def main():
    opt = parse_options("infer")
    print(save_options(opt))
    out_dir = test(opt)
    page = write_gallery(out_dir, title=f"{opt.name} {opt.test_split}")
    print(f"[infer] gallery at {page}")


if __name__ == "__main__":
    main()
