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
