#!/usr/bin/env python
"""Write a VGG19-shaped RANDOM-weights npz for VGGPerceptualLoss.

For hosts without torchvision / network access where
``tools/convert_vgg.py`` cannot run. Random conv features define a
valid multi-scale patch distance (zero iff identical) but are NOT the
perceptually-calibrated ImageNet features the reference uses — convert
real weights when possible.

  python tools/make_synthetic_vgg.py vgg19_synthetic.npz [seed]
"""

import sys

if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from nerfsr_tpu.models.criterions import write_synthetic_vgg_npz

    out = sys.argv[1] if len(sys.argv) > 1 else "vgg19_synthetic.npz"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    write_synthetic_vgg_npz(out, seed)
    print(f"wrote synthetic VGG19 weights to {out}")
