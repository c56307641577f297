"""Pallas fused compositing kernel vs the jnp reference implementation:
forward outputs and analytic VJP, in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsr_tpu.core.rendering import volumetric_rendering
from nerfsr_tpu.ops.experimental.pallas_composite import pallas_volumetric_rendering


def make_inputs(n=16, s=24, seed=0):
    rng = np.random.RandomState(seed)
    rgb = jnp.asarray(rng.rand(n, s, 3).astype(np.float32))
    sigma = jnp.asarray((rng.randn(n, s) * 2).astype(np.float32))
    z_vals = jnp.asarray(
        np.sort(rng.rand(n, s).astype(np.float32) * 4 + 1, -1))
    return rgb, sigma, z_vals


@pytest.mark.parametrize("white_bkgd", [False, True])
@pytest.mark.parametrize("act", ["relu", "softplus"])
def test_forward_matches_reference(white_bkgd, act):
    rgb, sigma, z_vals = make_inputs()
    ref = volumetric_rendering(rgb, sigma, z_vals, white_bkgd, act)
    got = pallas_volumetric_rendering(rgb, sigma, z_vals, white_bkgd, act,
                                      True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("white_bkgd", [False, True])
@pytest.mark.parametrize("act", ["relu", "softplus"])
def test_gradients_match_reference(white_bkgd, act):
    rgb, sigma, z_vals = make_inputs(n=8, s=16, seed=1)

    def loss_ref(rgb, sigma, z_vals):
        c, d, o, w = volumetric_rendering(rgb, sigma, z_vals, white_bkgd,
                                          act)
        return (jnp.sum(c ** 2) + jnp.sum(jnp.sin(d)) + 0.3 * jnp.sum(o)
                + jnp.sum(w * 0.1))

    def loss_pl(rgb, sigma, z_vals):
        c, d, o, w = pallas_volumetric_rendering(rgb, sigma, z_vals,
                                                 white_bkgd, act, True)
        return (jnp.sum(c ** 2) + jnp.sum(jnp.sin(d)) + 0.3 * jnp.sum(o)
                + jnp.sum(w * 0.1))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(rgb, sigma, z_vals)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(rgb, sigma, z_vals)
    for r, g in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-3, atol=5e-5)


class TestFusedMLP:
    """Pallas MLP megakernel vs the flax VanillaMLP (interpret mode)."""

    def _setup(self):
        from nerfsr_tpu.models.mlp import VanillaMLP
        from nerfsr_tpu.ops.experimental.pallas_mlp import flatten_params

        mlp = VanillaMLP(compute_dtype=jnp.float32)
        rng = np.random.RandomState(0)
        n_pts = 64
        pts = jnp.asarray(rng.randn(n_pts, 3).astype(np.float32))
        dirs = jnp.asarray(rng.randn(n_pts, 3).astype(np.float32))
        from nerfsr_tpu.core.encoding import positional_encoding
        xyz_emb = positional_encoding(pts, 10)
        dir_emb = positional_encoding(dirs, 4)
        params = mlp.init(jax.random.PRNGKey(0), xyz_emb[:1], dir_emb[:1])
        return mlp, params, flatten_params(params), pts, dirs, xyz_emb, \
            dir_emb

    def test_forward_matches_flax(self):
        from nerfsr_tpu.ops.experimental.pallas_mlp import fused_nerf_mlp

        mlp, params, flat, pts, dirs, xyz_emb, dir_emb = self._setup()
        rgb_ref, sigma_ref = mlp.apply(params, xyz_emb, dir_emb)
        rgb, sigma = fused_nerf_mlp(flat, pts, dirs, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma),
                                   np.asarray(sigma_ref), rtol=1e-4,
                                   atol=1e-5)

    def _check_grads(self, bwd_mode):
        """Both backward modes ('pallas' v3 kernel in interpret mode,
        'xla' recompute fallback) must match flax gradients."""
        from nerfsr_tpu.ops.experimental.pallas_mlp import (fused_nerf_mlp,
                                               unflatten_grads)

        mlp, params, flat, pts, dirs, xyz_emb, dir_emb = self._setup()

        def loss_flax(params):
            rgb, sigma = mlp.apply(params, xyz_emb, dir_emb)
            return jnp.sum(rgb ** 2) + jnp.sum(jnp.tanh(sigma))

        def loss_fused(flat):
            rgb, sigma = fused_nerf_mlp(flat, pts, dirs, jnp.float32,
                                        True, bwd_mode)
            return jnp.sum(rgb ** 2) + jnp.sum(jnp.tanh(sigma))

        g_ref = jax.grad(loss_flax)(params)
        g_fused = unflatten_grads(jax.grad(loss_fused)(flat), params)
        ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
        fused_flat = dict(
            ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
            for path, leaf in
            jax.tree_util.tree_leaves_with_path(g_fused))
        for path, leaf in ref_leaves:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            np.testing.assert_allclose(
                np.asarray(fused_flat[key]), np.asarray(leaf),
                rtol=5e-3, atol=1e-4, err_msg=key)

    def test_weight_grads_match_flax(self):
        self._check_grads("pallas")

    def test_weight_grads_match_flax_xla_bwd(self):
        self._check_grads("xla")

    def test_render_path_with_fused_mlp(self):
        """End-to-end render_rays with use_fused_mlp vs flax path."""
        from nerfsr_tpu.config import default_options
        from nerfsr_tpu.models import create_model

        kw = dict(model="nerf", dataset_mode="blender", batch_size=8,
                  N_coarse=8, N_importance=8, precision="f32",
                  white_bkgd=True, noise_std=0.0, n_epochs=2,
                  n_epochs_decay=1)
        sys_a = create_model(default_options("train", **kw))
        sys_b = create_model(default_options(
            "train", use_pallas_mlp=True, pallas_interpret=True, **kw))
        params = sys_a.init_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        d = rng.randn(8, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {
            "origins": jnp.asarray(rng.randn(8, 3).astype(np.float32) * .1),
            "directions": jnp.asarray(d), "viewdirs": jnp.asarray(d),
            "near": jnp.full((8, 1), 2.0), "far": jnp.full((8, 1), 6.0),
        }
        rays_a = sys_a._batch_to_rays(batch)
        out_a = sys_a.render(params, rays_a, jax.random.PRNGKey(2), False)
        out_b = sys_b.render(params, rays_a, jax.random.PRNGKey(2), False)
        np.testing.assert_allclose(
            np.asarray(out_b["fine_rgb"]), np.asarray(out_a["fine_rgb"]),
            rtol=1e-4, atol=1e-5)


def test_uneven_ray_count_tiles():
    # 24 rays -> tile size 8; kernel must still cover all rows
    rgb, sigma, z_vals = make_inputs(n=24, s=12, seed=2)
    ref = volumetric_rendering(rgb, sigma, z_vals, False, "relu")
    got = pallas_volumetric_rendering(rgb, sigma, z_vals, False, "relu",
                                      True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=1e-5)


class TestFusedInvertCdf:
    """Fused inverse-CDF sampler vs core/sampling (interpret mode)."""

    def _inputs(self, n=32, b=17, q=8, seed=0):
        rng = np.random.RandomState(seed)
        z = np.sort(rng.rand(n, b + 1).astype(np.float32), axis=-1)
        bins = 0.5 * (z[:, :-1] + z[:, 1:])
        w = rng.rand(n, b - 1).astype(np.float32)
        w[0, :] = 0.0          # degenerate-denominator rows
        w[1, :2] = 100.0       # concentrated mass
        return jnp.asarray(bins), jnp.asarray(w)

    def test_bit_parity_with_reference(self):
        from nerfsr_tpu.core.sampling import sample_pdf_stratified
        from nerfsr_tpu.ops.experimental.pallas_sampling import (
            pallas_sample_pdf_stratified)
        bins, w = self._inputs()
        key = jax.random.PRNGKey(7)
        for randomized in (True, False):
            ref = sample_pdf_stratified(key, bins, w, 8, randomized)
            got = pallas_sample_pdf_stratified(key, bins, w, 8,
                                               randomized,
                                               interpret=True)
            # same PRNG stream, same formulas; the MXU prefix-sum
            # accumulates in a different order than jnp.cumsum, so
            # parity is to f32 rounding, not bitwise
            np.testing.assert_allclose(np.asarray(ref),
                                       np.asarray(got), atol=2e-6)

    def test_uneven_tile_and_shapes(self):
        from nerfsr_tpu.core.sampling import sample_pdf_stratified
        from nerfsr_tpu.ops.experimental.pallas_sampling import (
            pallas_sample_pdf_stratified)
        bins, w = self._inputs(n=24, b=31, q=24, seed=3)
        key = jax.random.PRNGKey(1)
        ref = sample_pdf_stratified(key, bins, w, 24, True)
        got = pallas_sample_pdf_stratified(key, bins, w, 24, True,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-6)

    def test_no_gradient_path(self):
        """Output is stop_gradient'ed: grads w.r.t. weights are zero."""
        from nerfsr_tpu.ops.experimental.pallas_sampling import pallas_invert_cdf
        bins, w = self._inputs(n=8, b=9, q=4)
        u = jnp.linspace(0.05, 0.95, 4)[None, :].repeat(8, 0)
        g = jax.grad(lambda ww: jnp.sum(
            pallas_invert_cdf(bins, ww, u, interpret=True)))(w)
        assert float(jnp.abs(g).max()) == 0.0

    def test_fast_render_path_with_fused_sampler(self):
        """--use_pallas_sampling (interpret): the full fast render path
        matches the XLA sampler to f32 rounding."""
        from nerfsr_tpu.config import default_options
        from nerfsr_tpu.models import create_model

        def render(use_kernel):
            opt = default_options(
                "train", model="nerf", dataset_mode="llff",
                batch_size=16, fast_sampling=True, n_prop=16,
                n_prop_levels=2, n_prop2=8, N_importance=8, prop_D=2,
                prop_W=16, D=2, W=32, precision="f32", noise_std=0.0,
                use_pallas_sampling=use_kernel, pallas_interpret=True)
            system = create_model(opt)
            params = system.init_params(jax.random.PRNGKey(0))
            rng = np.random.RandomState(0)
            d = rng.randn(16, 3).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            rays = {
                "origins": jnp.asarray(
                    rng.randn(16, 3).astype(np.float32) * 0.1),
                "directions": jnp.asarray(d), "viewdirs": jnp.asarray(d),
                "near": jnp.zeros((16, 1), jnp.float32),
                "far": jnp.ones((16, 1), jnp.float32),
            }
            return system.render(params, system._batch_to_rays(rays),
                                 jax.random.PRNGKey(1), randomized=True)

        ref, got = render(False), render(True)
        np.testing.assert_allclose(np.asarray(ref["fine_z"]),
                                   np.asarray(got["fine_z"]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(ref["fine_rgb"]),
                                   np.asarray(got["fine_rgb"]), atol=1e-4)
