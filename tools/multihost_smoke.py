#!/usr/bin/env python
"""Multi-process (multi-controller) smoke: one rank of a 2-process
``jax.distributed`` run on CPU devices.

The TPU-native counterpart of the reference's DDP spawn path
(``train.py:154-156`` + ``utils/distributed.py:5-18``): instead of NCCL
process groups, ``jax.distributed.initialize`` connects the controllers,
``jax.devices()`` spans every process, and the SAME engine.train code
path runs over the cross-process mesh (gradients all-reduce through
XLA collectives; checkpoint/metric writes are master-only).

Launched once per rank (the test launches 2):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python tools/multihost_smoke.py --coordinator localhost:PORT \
      --num_processes 2 --process_id R --scene DIR --out DIR

Writes {out}/proc{R}.json with the rank's view of the run (device
counts, final loss, step) for the test to assert on.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--scene", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    # CPU cross-process collectives need the gloo transport (the CPU
    # analogue of the reference's NCCL backend choice).
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # newer jax enables it by default under distributed init

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.engine import train
    from nerfsr_tpu.parallel.mesh import is_master

    opt = default_options(
        "train", model="nerf", dataset_mode="blender",
        dataset_root=args.scene, img_wh=(16, 16), batch_size=16,
        N_coarse=4, N_importance=4, D=2, W=16, deg_pos=2, deg_dir=1,
        precision="f32", n_epochs=1, n_epochs_decay=0,
        steps_per_epoch=4, log_every=2, save_epoch_freq=1,
        val_epoch_freq=1, vis_epoch_freq=0, val_freq=0,
        checkpoints_dir=os.path.join(args.out, f"ck_p{args.process_id}"),
        summary_dir=os.path.join(args.out, f"runs_p{args.process_id}"),
        name="mh",
        coordinator=args.coordinator, num_processes=args.num_processes,
        process_id=args.process_id)

    state = train(opt)

    os.makedirs(args.out, exist_ok=True)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "is_master": is_master(),
        "step": int(state.step),
        "param_l1": float(sum(
            abs(x).sum() for x in map(
                jax.device_get, jax.tree_util.tree_leaves(state.params)))),
    }
    with open(os.path.join(args.out, f"proc{args.process_id}.json"),
              "w") as f:
        json.dump(info, f)
    print(f"[multihost_smoke] rank {args.process_id} done: {info}")


if __name__ == "__main__":
    main()
