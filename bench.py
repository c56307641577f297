#!/usr/bin/env python
"""Throughput benchmark: train rays/sec/chip at the LLFF x2 supersampling
config (BASELINE.md north star: fern 252x189 -> 504x378, batch 512 LR
pixels x ds^2=4 sub-rays = 2048 HR rays/step, 64 coarse + 64 fine
importance samples => 192 MLP-sampled points per ray, two networks).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is computed against a documented estimate of the reference's
per-GPU training throughput at this exact config: nerf_pl-style PyTorch
NeRF trains at roughly 2-3 steps/s with 2048-ray batches on the
reference's RTX-class GPUs (~5-6k HR rays/s); we use 6000 rays/s as the
reference point. Replace with a measured number when the reference can be
profiled on comparable hardware.
"""

import json
import time

REFERENCE_RAYS_PER_SEC = 6000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfsr_tpu.config import default_options
    from nerfsr_tpu.models import create_model

    # LLFF x2 SS shapes (scripts/train_llff_downX.sh)
    ds = 2
    batch_lr = 512
    n_hr_rays = batch_lr * ds * ds

    opt = default_options(
        "train", model="nerf", dataset_mode="llff",
        batch_size=n_hr_rays, N_coarse=64, N_importance=64,
        precision="mixed", white_bkgd=False, noise_std=1.0,
        n_epochs=30, n_epochs_decay=10)
    system = create_model(opt)
    state = system.create_state(jax.random.PRNGKey(0), steps_per_epoch=2000)

    rng = np.random.RandomState(0)
    n_buf = 1 << 18
    d = rng.randn(n_buf, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    buffer = {
        "origins": jnp.asarray(rng.randn(n_buf, 3).astype(np.float32) * .1),
        "directions": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "near": jnp.zeros((n_buf, 1), jnp.float32),
        "far": jnp.ones((n_buf, 1), jnp.float32),
        "rgbs": jnp.asarray(rng.rand(n_buf, 3).astype(np.float32)),
    }
    key = jax.random.PRNGKey(0)

    # warmup / compile (scan folds the whole step chain into one program,
    # amortizing dispatch; the scalar float() readback forces real
    # device-side completion — block_until_ready alone is unreliable on
    # the axon tunnel).
    n_steps = 50
    state, losses = system.train_steps_scan(state, buffer, n_steps, key)
    assert float(losses["tot"]) > 0

    t0 = time.perf_counter()
    state, losses = system.train_steps_scan(state, buffer, n_steps, key)
    assert float(losses["tot"]) > 0
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * n_hr_rays / dt
    print(json.dumps({
        "metric": "train rays/sec/chip (LLFF x2 SS shapes)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
