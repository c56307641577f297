"""Sinusoidal positional encoding.

Parity with ``models/embedding.py:14-63`` of cwchenwang/NeRF-SR, including
the exact output channel ordering ``[x, sin(f0*x), cos(f0*x), sin(f1*x),
...]`` (each term spans all input channels), the ``no_xyz`` identity drop
and the log/linear frequency band options.

On TPU this is a bandwidth-bound elementwise op that XLA fuses straight
into the first MLP matmul, so there is no separate kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_channels(in_channels: int, num_freqs: int,
                    include_identity: bool = True) -> int:
    """Output channel count. Parity: ``models/embedding.py:21-26``."""
    out = in_channels * 2 * num_freqs
    if include_identity:
        out += in_channels
    return out


def positional_encoding(x: jnp.ndarray, num_freqs: int,
                        include_identity: bool = True,
                        log_scale: bool = True) -> jnp.ndarray:
    """Embed ``x -> (x, sin(f x), cos(f x), ...)``.

    Args:
      x: (..., C).
      num_freqs: number of frequency bands (deg_pos=10 / deg_dir=4 defaults,
        ``models/nerf_model.py:56-57``).
      include_identity: keep the raw input as the first block
        (reference default; disabled by ``--no_xyz``).
      log_scale: frequencies 2^k (default) vs linearly spaced
        (``--no_logscale``).
    Returns: (..., posenc_channels(C, num_freqs, include_identity)).
    """
    if num_freqs == 0:
        return x if include_identity else x[..., :0]
    dtype = x.dtype
    if log_scale:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs,
                             dtype=dtype)
    # (..., F, C): angle per frequency band.
    angles = x[..., None, :] * freqs[:, None]
    # Interleave [sin(f_k x), cos(f_k x)] per band to match the reference's
    # concat ordering.
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)
    enc = jnp.stack([sin, cos], axis=-2)              # (..., F, 2, C)
    enc = enc.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    if include_identity:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
