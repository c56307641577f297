#!/usr/bin/env python
"""Convert torchvision VGG19 ImageNet weights to the npz archive consumed
by ``nerfsr_tpu.models.criterions.VGGPerceptualLoss``.

The reference's perceptual loss depends on
``torchvision.models.vgg19(pretrained=True)`` (``models/criterions.py:
149``); on TPU hosts we convert once to HWIO-numpy and load without
torch. Run wherever torchvision + network access exist:

  python tools/convert_vgg.py vgg19_features.npz

The archive holds the first 14 conv layers (through relu5_2, the deepest
tap the loss uses) as w{i} (HWIO) / b{i}.
"""

import sys


def main(out_path):
    import numpy as np
    import torchvision

    vgg = torchvision.models.vgg19(pretrained=True).features
    arrays = {}
    conv_i = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()          # OIHW
            arrays[f"w{conv_i}"] = w.transpose(2, 3, 1, 0)  # -> HWIO
            arrays[f"b{conv_i}"] = layer.bias.detach().numpy()
            conv_i += 1
            if conv_i >= 14:  # through relu5_2
                break
    np.savez(out_path, **arrays)
    print(f"wrote {conv_i} conv layers to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "vgg19_features.npz")
