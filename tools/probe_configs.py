#!/usr/bin/env python
"""Quick throughput probe over fast-sampling configs (600-step scans).

Times one compiled scan at devbench.grouped_buffer shapes for a list
of (N_importance, n_prop, n_prop_levels, n_prop2) candidates.
ROUND-4 NOTE: scans are 600 steps now (was 50) — the tunnel adds a
FIXED 30-56 ms dispatch+readback overhead per scan call, so scan50
readings under-report fast configs ~40% (see bench.py / README
timing-provenance); numbers from the scan50 era are NOT comparable.
Used for proposal-budget reallocation experiments (VERDICT r2 #5).

Usage: python tools/probe_configs.py "24,48,2,24" "24,48,2,32" ...
       (each arg: NI,np,levels,np2[,prop_W[,prop_D[,deg_prop]]]; the
       optional trailing fields probe slimmer proposal MLPs / posenc —
       defaults 64,4,6; default candidate set if none given)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cands = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not cands:
        cands = [(24, 64, 2, 32),   # current primary (reference point)
                 (24, 48, 2, 24), (24, 48, 2, 32), (24, 64, 2, 24)]

    import jax

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model
    from nerfsr_tpu.utils.devbench import enable_compile_cache, grouped_buffer

    enable_compile_cache()
    grouped = grouped_buffer(1 << 16, 4)
    n_steps = 600
    for cand in cands:
        ni, np_, lv, np2 = cand[:4]
        pw = cand[4] if len(cand) > 4 else 64
        pd = cand[5] if len(cand) > 5 else 4
        dg = cand[6] if len(cand) > 6 else 6
        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            batch_size=512, N_coarse=64, N_importance=ni, n_prop=np_,
            n_prop_levels=lv, n_prop2=np2, prop_W=pw, prop_D=pd,
            deg_prop=dg,
            precision="mixed",
            white_bkgd=False, noise_std=1.0, downscale=2,
            include_var=True, fast_sampling=True, img_wh=(504, 378),
            n_epochs=30, n_epochs_decay=10)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=2000)
        key = jax.random.PRNGKey(0)
        state, losses = system.train_steps_scan(state, grouped, n_steps,
                                                key)
        assert float(losses["tot"]) > 0  # compile + sync
        reps = []
        for _ in range(3):  # tunnel timing is noisy: median of 3
            t0 = time.perf_counter()
            # train_steps_scan DONATES state (donate_argnums=1): rebind
            # it each rep or rep 2 feeds a deleted buffer (surfaces as
            # an opaque "TPU backend error (InvalidArgument)").
            state, losses = system.train_steps_scan(state, grouped,
                                                    n_steps, key)
            assert float(losses["tot"]) > 0
            reps.append(time.perf_counter() - t0)
        dt = sorted(reps)[1]
        rays = n_steps * 512 * 4 / dt
        print(f"NI={ni} np={np_} lv={lv} np2={np2} pW={pw} pD={pd} "
              f"deg={dg}: "
              f"{rays:,.0f} rays/s ({dt/n_steps*1e3:.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
