#!/usr/bin/env python
"""Convert reference PyTorch NeRF-SR checkpoints to this framework's
format, so models trained with cwchenwang/NeRF-SR can be evaluated or
fine-tuned here.

The reference saves per-network torch state_dicts as
``{epoch}_net_{Coarse,Fine}.pth`` (``models/base_model.py:181-196``);
its VanillaMLP layers (``models/networks.py:121-226``) map 1:1 onto
``nerfsr_tpu.models.mlp.VanillaMLP``:

  xyz_encoding_{i}.0.{weight,bias} -> xyz_encoding_{i}.{kernel^T,bias}
  xyz_encoding_final.{...}         -> xyz_encoding_final
  dir_encoding.0.{...}             -> dir_encoding
  sigma.{...} / rgb.0.{...}        -> sigma / rgb

(torch Linear stores (out, in); flax Dense kernels are (in, out), hence
the transpose. A leading ``module.`` prefix from DataParallel wrapping
is stripped.)

Usage:
  python tools/convert_reference_ckpt.py <ref_ckpt_dir> <epoch> \
      <out_checkpoints_dir> <name> [--D 8 --W 256 ...]

Writes ``{epoch}_state.msgpack`` (+ latest alias) loadable with
``--continue_train --load_epoch <epoch>`` / ``test.py --load_epoch``.
Adam moments start fresh (the reference never saved them).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def torch_mlp_state_to_flax(state_dict, depth: int = 8):
    """Reference VanillaMLP torch state_dict -> flax variables dict."""
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = \
            np.asarray(v, dtype=np.float32)

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T.copy(),
                "bias": sd[f"{prefix}.bias"].copy()}

    params = {f"xyz_encoding_{i + 1}": lin(f"xyz_encoding_{i + 1}.0")
              for i in range(depth)}
    params["xyz_encoding_final"] = lin("xyz_encoding_final")
    params["sigma"] = lin("sigma")
    params["dir_encoding"] = lin("dir_encoding.0")
    params["rgb"] = lin("rgb.0")
    return {"params": params}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref_dir", help="reference checkpoints/{name} dir")
    p.add_argument("epoch", type=int)
    p.add_argument("out_dir", help="our --checkpoints_dir")
    p.add_argument("name", help="our --name (subdir)")
    p.add_argument("--model", default="nerf",
                   choices=["nerf", "nerf_downX"])
    p.add_argument("--D", type=int, default=8)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--deg_pos", type=int, default=10)
    p.add_argument("--deg_dir", type=int, default=4)
    args = p.parse_args()

    import jax
    import torch

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.utils import checkpoint as ckpt

    opt = default_options(
        "train", name=args.name, model=args.model,
        dataset_mode="llff" if args.model == "nerf" else "llff_downX",
        D=args.D, W=args.W, deg_pos=args.deg_pos, deg_dir=args.deg_dir,
        checkpoints_dir=args.out_dir)
    system = create_model(opt)
    state = system.create_state(jax.random.PRNGKey(0), steps_per_epoch=1)

    params = dict(state.params)
    for level, net in (("coarse", "Coarse"), ("fine", "Fine")):
        path = os.path.join(args.ref_dir, f"{args.epoch}_net_{net}.pth")
        sd = torch.load(path, map_location="cpu")
        params[level] = torch_mlp_state_to_flax(sd, depth=args.D)
        print(f"[convert] {path} -> params['{level}']")
    # fresh optimizer state FOR the converted params (the reference never
    # saved Adam moments, and the converted shapes must stay consistent)
    state = state.replace(params=params,
                          opt_state=system.tx.init(params))

    out = ckpt.save_checkpoint(opt, state, args.epoch)
    print(f"[convert] wrote {out}")


if __name__ == "__main__":
    main()
