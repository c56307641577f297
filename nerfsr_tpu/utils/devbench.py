"""Shared helpers for the bench/profiling/test harnesses.

Single home for two snippets that were previously copy-pasted across
``bench.py``, ``tools/profile_step.py``, ``tools/flagship_run.py``,
``tests/conftest.py`` and ``nerfsr_tpu/engine.py`` — keeping them here
guarantees the bench and the profiler always measure the same program
shape, and that every entry point uses the same persistent-cache
settings.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent XLA compilation cache at ``cache_dir``
    (default ``~/.cache/nerfsr_tpu/xla``). The multi-minute train-step
    compile is keyed by (program, flags, platform) and reused across
    processes — repeat bench/test/refine runs start in seconds."""
    import jax

    cache_dir = cache_dir or os.path.expanduser("~/.cache/nerfsr_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def grouped_buffer(n_lr: int, ds2: int, seed: int = 0):
    """Synthetic device buffer shaped like ``LLFFDownXDataset.
    ray_buffer()`` (the flagship training input): grouped (N_lr, ds^2,
    C) HR rays + (N_lr, 3) LR rgb targets + (N_lr, ds^2, 3) HR rgb.
    Shared by bench.py and tools/profile_step.py so both always time
    the exact same train-step program."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(seed)
    d = rng.randn(n_lr, ds2, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "origins": jnp.asarray(
            rng.randn(n_lr, ds2, 3).astype(np.float32) * 0.1),
        "directions": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "near": jnp.zeros((n_lr, ds2, 1), jnp.float32),
        "far": jnp.ones((n_lr, ds2, 1), jnp.float32),
        "rgbs": jnp.asarray(rng.rand(n_lr, 3).astype(np.float32)),
        "rgbs_ori": jnp.asarray(
            rng.rand(n_lr, ds2, 3).astype(np.float32)),
    }


def train_matmul_flops_per_ray(render_cfg, params):
    """Analytic matmul FLOPs per ray for one TRAINING step (fwd + bwd =
    3x fwd; the train path stores activations, no remat). Counts every
    2-D kernel in each network's param tree (2*m*n MACs -> FLOPs per
    point) times the points/ray that network evaluates; posenc/
    composite/resample elementwise work is excluded (<2% at flagship
    shapes). Shared by bench.py's MFU lines and the train-loop tflops
    log. Parity sample accounting: the coarse net runs on n_coarse
    points and the fine net on the MERGED n_coarse + n_importance
    depths (models/render.py)."""
    import jax
    import numpy as np

    def per_point(net):
        if net not in params:
            return 0
        return sum(2 * int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params[net])
                   if getattr(l, "ndim", 0) == 2)

    if render_cfg.fast_sampling:
        prop_pts = render_cfg.n_prop + (
            render_cfg.n_prop2 if render_cfg.n_prop_levels >= 2 else 0)
        fwd = prop_pts * per_point("prop") \
            + render_cfg.n_importance * per_point("fine")
    else:
        fwd = render_cfg.n_coarse * per_point("coarse") + (
            render_cfg.n_coarse + render_cfg.n_importance) \
            * per_point("fine")
    return 3.0 * fwd
