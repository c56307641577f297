"""Volume rendering (alpha compositing).

Parity with ``models/rendering.py:66-111`` of cwchenwang/NeRF-SR: deltas
with a 1e10 terminal interval, ``alpha = 1 - exp(-delta * act(sigma))``,
exclusive cumulative transmittance with eps=1e-10, composited rgb/depth/
opacity and the white-background blend. Sigma activation is relu or the
shifted softplus ``log(1 + exp(x - 1))``.

This is a pure function; there is also a fused Pallas implementation in
``nerfsr_tpu.ops`` used on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigma_activation(sigma: jnp.ndarray, kind: str = "relu") -> jnp.ndarray:
    """Density activation. Parity: ``models/rendering.py:70-73``."""
    if kind == "relu":
        return jax.nn.relu(sigma)
    elif kind == "softplus":
        # log(1 + exp(x - 1)), numerically stable.
        return jax.nn.softplus(sigma - 1.0)
    raise ValueError(f"unknown sigma activation: {kind}")


def volumetric_rendering(rgb: jnp.ndarray, sigma: jnp.ndarray,
                         z_vals: jnp.ndarray, white_bkgd: bool,
                         activation: str = "relu"):
    """Composite per-sample rgb/sigma into per-ray color/depth/opacity.

    Args:
      rgb: (..., S, 3) per-sample color (already sigmoid-activated).
      sigma: (..., S) raw density (activation applied here, matching
        ``models/rendering.py:98``).
      z_vals: (..., S) sample depths.
    Returns:
      comp_rgb (..., 3), depth (...), opacity (...), weights (..., S).
    """
    weights = compute_weights(sigma, z_vals, activation)

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    opacity = jnp.sum(weights, axis=-1)

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - opacity[..., None])

    return comp_rgb, depth, opacity, weights


def compute_weights(sigma: jnp.ndarray, z_vals: jnp.ndarray,
                    activation: str = "relu") -> jnp.ndarray:
    """Compositing weights alone (no rgb) — the sigma-only half of
    ``volumetric_rendering`` with identical deltas/alpha/transmittance
    math. Used by the proposal sampler (--fast_sampling), which needs a
    density-derived sampling distribution but renders no color."""
    eps = 1e-10
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-deltas * sigma_activation(sigma, activation))
    trans = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + eps, axis=-1),
        ],
        axis=-1,
    )
    return alpha * trans


def bilateral_volumetric_rendering(rgb: jnp.ndarray,
                                   neighbor_rgbs: jnp.ndarray,
                                   sigma: jnp.ndarray, z_vals: jnp.ndarray,
                                   white_bkgd: bool,
                                   activation: str = "relu",
                                   gamma: float = 1.0,
                                   weight_thresh: float = 1e-2):
    """Bilateral variant of the compositor: per-sample rgb is blended
    with 5 neighbor-ray rgbs using color-similarity weights
    ``exp(-|rgb - neighbor|^2 / gamma)`` before compositing.

    Parity: ``models/rendering.py:4-64`` (BilateralVolumetricRenderer) —
    dead code in the reference (never instantiated), carried for zoo
    completeness. The reference blends in-place only where
    ``weights >= 1e-2``; here that masked in-place update is the
    functionally identical ``jnp.where`` select (XLA has no in-place
    scatter on traced values, and a dense select is the TPU-native
    lowering anyway).

    Args:
      rgb: (N, S, 3) per-sample color.
      neighbor_rgbs: (5*N, S, 3), the 5 neighbor rays' per-sample colors
        stacked along axis 0 (the reference's packing, :47-54).
      sigma: (N, S) raw density; z_vals: (N, S).
    Returns:
      comp_rgb (N, 3), depth (N,), opacity (N,), weights (N, S).
    """
    weights = compute_weights(sigma, z_vals, activation)

    n = rgb.shape[0]
    neighbors = neighbor_rgbs.reshape((5, n) + rgb.shape[1:])
    w_k = jnp.exp(-jnp.sum((rgb[None] - neighbors) ** 2, axis=-1) / gamma)
    blended = (rgb + jnp.sum(neighbors * w_k[..., None], axis=0)) \
        / (1.0 + jnp.sum(w_k, axis=0))[..., None]
    mask = weights >= weight_thresh
    rgb = jnp.where(mask[..., None], blended, rgb)

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - opacity[..., None])
    return comp_rgb, depth, opacity, weights


def add_gaussian_noise(key, raw: jnp.ndarray, randomized: bool,
                       noise_std: float) -> jnp.ndarray:
    """Sigma noise regularizer. Parity: ``models/utils.py:199-212``."""
    if randomized and noise_std > 0 and key is not None:
        return raw + jax.random.normal(key, raw.shape, raw.dtype) * noise_std
    return raw
