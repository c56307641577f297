"""The fused coarse->fine render pass.

This is the TPU replacement for the reference hot loop
(``models/nerf_model.py:207-240`` ``forward_rays`` plus the two-level
``chunk_batch`` at ``models/nerf_model.py:201,245``): embed -> coarse MLP ->
composite -> inverse-CDF resample -> fine MLP -> composite, for the whole
ray batch, as ONE traced XLA program. No host round trips, no per-chunk
kernel launches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerfsr_tpu.core.encoding import positional_encoding
from nerfsr_tpu.core.rays import Rays
from nerfsr_tpu.core.rendering import (add_gaussian_noise, compute_weights,
                                       volumetric_rendering)
from nerfsr_tpu.core.sampling import (cast_rays, resample_along_rays,
                                      sample_along_rays,
                                      sample_pdf_stratified)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render-path configuration (hashable: safe as a jit static)."""

    n_coarse: int = 64             # --N_coarse
    n_importance: int = 64         # --N_importance
    deg_pos: int = 10              # --deg_pos
    deg_dir: int = 4               # --deg_dir
    include_identity: bool = True  # not --no_xyz
    log_scale: bool = True         # not --no_logscale
    lindisp: bool = False          # --lindisp
    white_bkgd: bool = False       # --white_bkgd
    noise_std: float = 0.0         # --noise_std
    sigma_activation: str = "relu"  # --sigma_activation
    use_dir: bool = True           # not --no_dir
    gamma_correct: bool = False    # --gamma_correct (downX :271-277)
    use_pallas: bool = False       # fused Pallas compositing kernel
    use_fused_mlp: bool = False    # Pallas MLP megakernel (--use_pallas_mlp)
    fused_dtype: str = "bf16"      # megakernel compute dtype
    fused_bwd: str = "xla"         # --pallas_mlp_bwd: xla | pallas
    pallas_interpret: bool = False  # interpreter mode (CPU tests)
    # --fast_sampling: proposal-MLP importance sampling (opt-in perf
    # path; parity path untouched when False)
    fast_sampling: bool = False
    n_prop: int = 64               # --n_prop proposal samples
    deg_prop: int = 6              # --deg_prop proposal posenc degree
    uniform_frac: float = 0.0      # --fast_uniform_frac defensive mix
    n_prop_levels: int = 1         # --n_prop_levels proposal rounds
    n_prop2: int = 32              # --n_prop2 second-round samples
    prop_pad: float = 0.01         # --prop_pad resample padding (lv>=2)
    # --prop_pad_anneal N: decay the resample padding linearly from
    # prop_pad to prop_pad_final over the first N train steps (0 = off).
    # Early exploration floor guards against the round-1 false-negative
    # death spiral; late decay stops wasting fine samples on uniform
    # exploration once the proposal histogram is trustworthy.
    prop_pad_anneal: int = 0
    prop_pad_final: float = 0.0    # --prop_pad_final
    # --use_pallas_sampling: fused inverse-CDF resample kernel
    # (ops/experimental/pallas_sampling.py) for the fast-path resamples. f32-rounding
    # equivalent to the jnp path (not bitwise: MXU prefix sum).
    use_pallas_sampling: bool = False


def _eval_level(mlp, params, rays: Rays, points, z_vals, dir_emb,
                noise_key, cfg: RenderConfig, randomized: bool):
    """Evaluate one network level: MLP over the sample points (flax or
    fused Pallas), sigma noise, composite. Shared by the parity path and
    the --fast_sampling fine level."""
    n, s, _ = points.shape
    if cfg.use_fused_mlp:
        # Pallas megakernel: posenc + all layers fused on-chip; raw
        # points/dirs go in, rgb/sigma come out (ops/experimental/pallas_mlp.py).
        from nerfsr_tpu.ops.experimental.pallas_mlp import (flatten_params,
                                               fused_nerf_mlp)
        pts_flat = points.reshape(-1, 3)
        dirs_flat = jnp.broadcast_to(
            rays.viewdirs[:, None, :], (n, s, 3)).reshape(-1, 3)
        dtype = jnp.bfloat16 if cfg.fused_dtype == "bf16" \
            else jnp.float32
        rgb, sigma = fused_nerf_mlp(
            flatten_params(params), pts_flat, dirs_flat, dtype,
            cfg.pallas_interpret, cfg.fused_bwd)
        rgb = rgb.reshape(n, s, 3)
        sigma = sigma.reshape(n, s)
    else:
        xyz_emb = positional_encoding(
            points, cfg.deg_pos, cfg.include_identity, cfg.log_scale)
        d_emb = None
        if dir_emb is not None:
            d_emb = jnp.broadcast_to(
                dir_emb[:, None, :], (n, s, dir_emb.shape[-1]))
        rgb, sigma = mlp.apply(params, xyz_emb, d_emb)
    if cfg.gamma_correct:
        # gamma-correct the MLP color before compositing
        # (nerf_downX_model.py:271-277)
        rgb = jnp.power(jnp.maximum(rgb, 1e-8), 1.0 / 2.2)
    sigma = add_gaussian_noise(noise_key, sigma, randomized,
                               cfg.noise_std)
    if cfg.use_pallas:
        from nerfsr_tpu.ops.experimental.pallas_composite import (
            pallas_volumetric_rendering)
        return pallas_volumetric_rendering(
            rgb, sigma, z_vals, cfg.white_bkgd, cfg.sigma_activation)
    return volumetric_rendering(rgb, sigma, z_vals, cfg.white_bkgd,
                                cfg.sigma_activation)


def _annealed_pad(cfg: RenderConfig, step):
    """Resample padding at this train step. With --prop_pad_anneal the
    pad decays linearly prop_pad -> prop_pad_final over the first
    ``prop_pad_anneal`` steps; ``step=None`` (eval) uses the fully
    annealed value. Returns a python float or a traced scalar."""
    if cfg.prop_pad_anneal <= 0:
        return cfg.prop_pad
    if step is None:
        return cfg.prop_pad_final
    frac = jnp.clip(
        jnp.asarray(step, jnp.float32) / cfg.prop_pad_anneal, 0.0, 1.0)
    return cfg.prop_pad + (cfg.prop_pad_final - cfg.prop_pad) * frac


def render_rays_fast(mlp, prop_mlp, params, rays: Rays,
                     key: Optional[jax.Array], cfg: RenderConfig,
                     randomized: bool, step=None) -> Dict[str, Any]:
    """--fast_sampling render: a tiny sigma-only proposal MLP shapes the
    sampling distribution; the big MLP runs ONCE on ``n_importance``
    proposal-guided samples (vs coarse 64 + fine 128 evaluations on the
    parity path — 3x fewer big-MLP points at the flagship config).

    TPU-native perf feature (mip-NeRF 360-style proposal sampling,
    arXiv 2111.12077 — public method); no reference counterpart. The
    reference hot loop it replaces: ``models/nerf_model.py:207-240``.

    Returns fine_* outputs plus the proposal/fine histograms
    (prop_z/prop_weights/fine_z) consumed by ``interlevel_loss``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_prop, k_resample, k_noise = jax.random.split(key, 3)
    pad = _annealed_pad(cfg, step)
    if cfg.use_pallas_sampling:
        from nerfsr_tpu.ops.experimental.pallas_sampling import (
            pallas_sample_pdf_stratified)
        sample_strat = functools.partial(
            pallas_sample_pdf_stratified,
            interpret=cfg.pallas_interpret)
    else:
        sample_strat = sample_pdf_stratified

    dir_emb = None
    if cfg.use_dir:
        dir_emb = positional_encoding(
            rays.viewdirs, cfg.deg_dir, cfg.include_identity, cfg.log_scale)

    # 1) proposal level(s): stratified uniform depths -> tiny MLP ->
    # weights; each FURTHER level (--n_prop_levels 2) inverse-CDF
    # resamples n_prop2 depths from the previous histogram and re-runs
    # the SAME shared prop MLP (mip-NeRF 360 runs its proposal stage
    # twice, arXiv 2111.12077 §3 — the second round concentrates depth
    # resolution where the first found mass, which thin occluders need;
    # sharing one prop param set keeps the checkpoint surface fixed).
    z_prop, pts = sample_along_rays(
        k_prop, rays.origins, rays.directions, rays.near, rays.far,
        cfg.n_prop, randomized, cfg.lindisp)
    prop_hists = []
    for lvl in range(max(1, cfg.n_prop_levels)):
        if lvl > 0:
            z_prev, w_prev = prop_hists[-1]
            bins_l = 0.5 * (z_prev[..., :-1] + z_prev[..., 1:])
            # resample PADDING: a uniform floor added to the histogram
            # before CDF inversion. Without it multi-round sampling
            # death-spirals: a round-1 false negative is never visited
            # by round 2, so the fine level never renders there and the
            # interlevel loss has no gradient to correct it (measured:
            # 29.8 vs 36.2 PSNR on the cluttered scene). Same cure as
            # multinerf's resample_padding (arXiv 2111.12077 impl).
            z_prop = sample_strat(
                jax.random.fold_in(k_prop, lvl), bins_l,
                jax.lax.stop_gradient(w_prev[..., 1:-1]) + pad,
                cfg.n_prop2, randomized)
            pts = cast_rays(rays.origins, rays.directions, z_prop)
        prop_emb = positional_encoding(
            pts, cfg.deg_prop, cfg.include_identity, cfg.log_scale)
        sigma_prop = prop_mlp.apply(params["prop"], prop_emb)
        w_prop = compute_weights(sigma_prop, z_prop,
                                 cfg.sigma_activation)
        prop_hists.append((z_prop, w_prop))

    # 2) inverse-CDF resample from the proposal histogram (no merge with
    # the proposal depths — the whole point is fewer big-MLP samples),
    # optionally MIXED with a uniform_frac of stratified uniform depths
    # (--fast_uniform_frac): the uniform fraction keeps every ray
    # segment under direct fine-MSE gradient pressure, a defensive
    # option for scenes where proposal-guided samples might leave
    # regions unsupervised. Stratified uniforms keep each part sorted;
    # the merge needs one cheap sort. Midpoint-bin / inner-weight
    # convention matches the parity resample (core/sampling.py:95-111).
    n_uni = int(round(cfg.n_importance * cfg.uniform_frac))
    n_cdf = cfg.n_importance - n_uni
    bins = 0.5 * (z_prop[..., :-1] + z_prop[..., 1:])
    fine_pad = pad if cfg.n_prop_levels > 1 else 0.0
    z_fine = sample_strat(
        k_resample, bins,
        jax.lax.stop_gradient(w_prop[..., 1:-1]) + fine_pad,
        n_cdf, randomized)
    if n_uni > 0:
        k_uni = jax.random.fold_in(k_resample, 1)
        z_uni, _ = sample_along_rays(
            k_uni, rays.origins, rays.directions, rays.near, rays.far,
            n_uni, randomized, cfg.lindisp)
        z_fine = jnp.sort(
            jnp.concatenate([z_fine, z_uni], axis=-1), axis=-1)
    points = cast_rays(rays.origins, rays.directions, z_fine)

    # 3) single big-MLP level.
    f_rgb, f_depth, f_opacity, f_weights = _eval_level(
        mlp, params["fine"], rays, points, z_fine, dir_emb, k_noise,
        cfg, randomized)
    out = {
        "fine_rgb": f_rgb,
        "fine_depth": f_depth,
        "fine_opacity": f_opacity,
        "fine_weights": f_weights,
        "prop_z": z_prop,
        "prop_weights": w_prop,
        "fine_z": z_fine,
    }
    # earlier proposal rounds feed their own interlevel terms
    # (each level must upper-bound the fine histogram)
    for i, (z_i, w_i) in enumerate(prop_hists[:-1]):
        out[f"prop{i}_z"] = z_i
        out[f"prop{i}_weights"] = w_i
    return out


def render_rays(mlp, params_coarse, params_fine, rays: Rays,
                key: Optional[jax.Array], cfg: RenderConfig,
                randomized: bool) -> Dict[str, Any]:
    """Render a flat bundle of rays through coarse (+fine) networks.

    Args:
      mlp: a ``VanillaMLP`` module (shared architecture; two param sets,
        mirroring netCoarse/netFine in ``models/nerf_model.py:129-130``).
      rays: Rays with leading shape (N,).
      key: PRNG key (consumed for stratified jitter / resample / sigma
        noise); may be None when randomized=False and noise_std == 0.
      randomized: train-time stochastic sampling (the reference's
        ``self.randomized``; eval forces False, ``models/nerf_model.py:183``).
    Returns a dict with coarse_* (and fine_* when n_importance > 0) fields:
      rgb (N, 3), depth (N,), opacity (N,), weights (N, S).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_coarse, k_resample, k_noise_c, k_noise_f = jax.random.split(key, 4)

    dir_emb = None
    if cfg.use_dir:
        dir_emb = positional_encoding(
            rays.viewdirs, cfg.deg_dir, cfg.include_identity, cfg.log_scale)

    def run_level(params, points, z_vals, noise_key):
        return _eval_level(mlp, params, rays, points, z_vals, dir_emb,
                           noise_key, cfg, randomized)

    z_vals, points = sample_along_rays(
        k_coarse, rays.origins, rays.directions, rays.near, rays.far,
        cfg.n_coarse, randomized, cfg.lindisp)
    c_rgb, c_depth, c_opacity, c_weights = run_level(
        params_coarse, points, z_vals, k_noise_c)

    out = {
        "coarse_rgb": c_rgb,
        "coarse_depth": c_depth,
        "coarse_opacity": c_opacity,
        "coarse_weights": c_weights,
    }

    if cfg.n_importance > 0:
        # stop_gradient on coarse weights: parity with the detach at
        # models/nerf_model.py:229.
        z_vals, points = resample_along_rays(
            k_resample, rays.origins, rays.directions, z_vals,
            jax.lax.stop_gradient(c_weights), cfg.n_importance, randomized)
        f_rgb, f_depth, f_opacity, f_weights = run_level(
            params_fine, points, z_vals, k_noise_f)
        out.update({
            "fine_rgb": f_rgb,
            "fine_depth": f_depth,
            "fine_opacity": f_opacity,
            "fine_weights": f_weights,
        })

    return out
