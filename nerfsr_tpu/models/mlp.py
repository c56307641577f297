"""The NeRF MLP, TPU-first.

Functional parity with ``models/networks.py:121-226`` (VanillaMLP) of
cwchenwang/NeRF-SR: D=8 trunk of width W=256 with a skip concat at layer 4,
a sigma head off the trunk, and an rgb branch of width W/2 conditioned on
the view direction, sigmoid color output. ``no_dir``/``stop_grad``/
``sigma_only`` options are preserved.

TPU notes:
- inputs arrive as (N_rays * N_samples, C) — one big matmul batch that maps
  straight onto the MXU; no point-chunking (reference ``point_chunk``).
- a ``compute_dtype`` of bfloat16 keeps the trunk on the MXU's fast path;
  params and the composite stay float32 for quality.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kernel_init(name: str, gain: float = 0.02):
    """Init selection with --init_gain semantics (reference
    ``models/networks.py:13-44``: gain scales normal/xavier/orthogonal;
    kaiming ignores it)."""
    if name == "kaiming":
        return nn.initializers.he_normal()
    if name == "xavier":
        # torch xavier_normal_(gain): std = gain * sqrt(2/(fan_in+fan_out));
        # variance_scaling(s, fan_avg) gives var = 2s/(fan_in+fan_out),
        # so s = gain^2.
        return nn.initializers.variance_scaling(
            gain * gain, "fan_avg", "normal")
    if name == "normal":
        return nn.initializers.normal(stddev=gain)
    if name == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    # flax default
    return nn.initializers.lecun_normal()


class VanillaMLP(nn.Module):
    """8-layer NeRF MLP (reference ``VanillaMLP``)."""

    depth: int = 8                  # --D
    width: int = 256                # --W
    skips: Sequence[int] = (4,)     # --skips
    use_dir: bool = True            # not --no_dir
    stop_grad: bool = False         # --stop_grad
    dim_rgb: int = 3                # --dim_rgb
    color_activation: str = "sigmoid"  # --color_activation
    init_type: str = "kaiming"      # --init_type (scripts pass kaiming)
    init_gain: float = 0.02         # --init_gain
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb: jnp.ndarray, dir_emb: jnp.ndarray | None,
                 sigma_only: bool = False):
        """xyz_emb: (..., C_pos); dir_emb: (..., C_dir) or None.

        Returns (rgb, sigma): (..., dim_rgb) and (...,) — raw sigma (the
        activation is applied by the renderer, matching the reference where
        the MLP emits unactivated density, ``models/networks.py:207``).
        """
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, name=name, dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=_kernel_init(self.init_type, self.init_gain))

        x = xyz_emb.astype(self.compute_dtype)
        inp = x
        for i in range(self.depth):
            if i in self.skips and i > 0:
                x = jnp.concatenate([inp, x], axis=-1)
            x = nn.relu(dense(self.width, f"xyz_encoding_{i + 1}")(x))

        sigma = dense(1, "sigma")(x).astype(jnp.float32)[..., 0]
        if sigma_only:
            return None, sigma

        feat = dense(self.width, "xyz_encoding_final")(x)
        if self.use_dir:
            if dir_emb is None:
                raise ValueError("use_dir=True but dir_emb is None")
            feat = jnp.concatenate(
                [feat, dir_emb.astype(self.compute_dtype)], axis=-1)
        if self.stop_grad:
            feat = jax.lax.stop_gradient(feat)

        h = nn.relu(dense(self.width // 2, "dir_encoding")(feat))
        rgb = dense(self.dim_rgb, "rgb")(h).astype(jnp.float32)
        if self.color_activation == "sigmoid":
            rgb = nn.sigmoid(rgb)
        return rgb, sigma


class ProposalMLP(nn.Module):
    """Small sigma-only MLP that SHAPES the sampling distribution for
    --fast_sampling (no reference counterpart — a TPU-native perf
    feature in the spirit of mip-NeRF 360's proposal network: arXiv
    2111.12077 §3.3, public method). Replaces the big coarse network in
    the hot path: ~3-10% of the flagship MLP's FLOPs at width 64-128."""

    depth: int = 4                  # --prop_D
    width: int = 64                 # --prop_W
    init_type: str = "kaiming"
    init_gain: float = 0.02
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb: jnp.ndarray):
        """xyz_emb: (..., C) -> raw sigma (...,)."""
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, name=name, dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=_kernel_init(self.init_type, self.init_gain))
        x = xyz_emb.astype(self.compute_dtype)
        for i in range(self.depth):
            x = nn.relu(dense(self.width, f"layer_{i}")(x))
        return dense(1, "sigma")(x).astype(jnp.float32)[..., 0]


class NeuTexMLP(nn.Module):
    """Variant with a deeper (2-layer, full-width) direction branch
    (reference NeuTexMLP, ``models/networks.py:229-321``; unused by any
    shipped script but part of the network zoo)."""

    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (4,)
    dim_rgb: int = 3
    color_activation: str = "sigmoid"
    init_type: str = "kaiming"
    init_gain: float = 0.02
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb: jnp.ndarray, dir_emb: jnp.ndarray | None,
                 sigma_only: bool = False):
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, name=name, dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=_kernel_init(self.init_type, self.init_gain))
        x = xyz_emb.astype(self.compute_dtype)
        inp = x
        for i in range(self.depth):
            if i in self.skips and i > 0:
                x = jnp.concatenate([inp, x], axis=-1)
            x = nn.relu(dense(self.width, f"xyz_encoding_{i + 1}")(x))
        sigma = dense(1, "sigma")(x).astype(jnp.float32)[..., 0]
        if sigma_only:
            return None, sigma
        feat = dense(self.width, "xyz_encoding_final")(x)
        h = jnp.concatenate([feat, dir_emb.astype(self.compute_dtype)],
                            axis=-1)
        h = nn.relu(dense(self.width, "dir_encoding_1")(h))
        h = nn.relu(dense(self.width, "dir_encoding_2")(h))
        rgb = dense(self.dim_rgb, "rgb")(h).astype(jnp.float32)
        if self.color_activation == "sigmoid":
            rgb = nn.sigmoid(rgb)
        return rgb, sigma
