#!/usr/bin/env python
"""A/B the fused inverse-CDF Pallas sampler on the real TPU.

Times the same scan50 train program as bench.py for fast-sampling
configs with --use_pallas_sampling off vs on (median of 3).

Also probes batch scaling (the XLA path degrades superlinearly past
512 LR px — CLAUDE.md 'batch scaling probe'): pass BATCH as a fifth
field, e.g. "24,48,2,24,2048".

Usage: python tools/probe_pallas_sampling.py ["NI,np,lv,np2[,batch]" ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cands = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not cands:
        cands = [(24, 64, 2, 32), (24, 48, 2, 24)]

    import jax

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.utils.devbench import enable_compile_cache, grouped_buffer

    enable_compile_cache()
    grouped = grouped_buffer(1 << 16, 4)
    n_steps = 600  # round-4: scan50 under-reports ~40% (fixed 30-56 ms
    # dispatch+readback overhead per scan call; see bench.py provenance)
    for cand in cands:
        ni, np_, lv, np2 = cand[:4]
        batch = cand[4] if len(cand) > 4 else 512
        for use_kernel in (False, True):
            opt = default_options(
                "train", model="nerf_downX", dataset_mode="llff_downX",
                batch_size=batch, N_coarse=64, N_importance=ni, n_prop=np_,
                n_prop_levels=lv, n_prop2=np2, precision="mixed",
                white_bkgd=False, noise_std=1.0, downscale=2,
                include_var=True, fast_sampling=True, img_wh=(504, 378),
                use_pallas_sampling=use_kernel,
                n_epochs=30, n_epochs_decay=10)
            system = create_model(opt)
            state = system.create_state(jax.random.PRNGKey(0),
                                        steps_per_epoch=2000)
            key = jax.random.PRNGKey(0)
            state, losses = system.train_steps_scan(state, grouped,
                                                    n_steps, key)
            assert float(losses["tot"]) > 0  # compile + sync
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, losses = system.train_steps_scan(
                    state, grouped, n_steps, key)
                assert float(losses["tot"]) > 0
                reps.append(time.perf_counter() - t0)
            dt = sorted(reps)[1]
            rays = n_steps * batch * 4 / dt
            print(f"NI={ni} np={np_} lv={lv} np2={np2} batch={batch} "
                  f"kernel={use_kernel}: {rays:,.0f} rays/s "
                  f"({dt/n_steps*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
