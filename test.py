#!/usr/bin/env python
"""Test/render entry point (parity surface: reference ``test.py`` CLI).

Loads a checkpoint and renders the ``--test_split`` to
``{results_dir}/{name}/{split}_{epoch}/`` including the
``{i}-fine-ori.png`` / depth npz artifacts the refinement stage consumes.
"""

from nerfsr_tpu.config import parse_options, save_options
from nerfsr_tpu.engine import test


def main():
    opt = parse_options("test")
    print(save_options(opt))
    test(opt)


if __name__ == "__main__":
    main()
