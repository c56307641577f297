"""Golden-value unit tests for the core render math.

Each test checks the JAX implementation against an independent numpy
transcription of the reference formulas (cwchenwang/NeRF-SR
``models/utils.py``, ``models/rendering.py``, ``models/embedding.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsr_tpu.core import (
    cast_rays,
    get_ray_directions,
    get_rays,
    ndc_rays,
    positional_encoding,
    posenc_channels,
    resample_along_rays,
    sample_along_rays,
    volumetric_rendering,
)
from nerfsr_tpu.core.sampling import sample_pdf
from nerfsr_tpu.core.rendering import sigma_activation


def rng(seed=0):
    return np.random.RandomState(seed)


class TestRayDirections:
    def test_pixel_centers(self):
        h, w, focal = 4, 6, 10.0
        d = np.asarray(get_ray_directions(h, w, focal, use_pixel_centers=True))
        # golden: pixel (row j, col i) -> ((i+.5-W/2)/f, -(j+.5-H/2)/f, -1)
        i, j = 2, 1
        np.testing.assert_allclose(
            d[j, i],
            [(i + 0.5 - w / 2) / focal, -(j + 0.5 - h / 2) / focal, -1.0],
            rtol=1e-6,
        )

    def test_no_pixel_centers(self):
        d = np.asarray(get_ray_directions(2, 2, 5.0, use_pixel_centers=False))
        np.testing.assert_allclose(d[0, 0], [-1 / 5.0, 1 / 5.0, -1.0], rtol=1e-6)

    def test_get_rays_normalized_and_origin(self):
        r = rng(1)
        h, w = 3, 5
        dirs = get_ray_directions(h, w, 7.0)
        # a nontrivial c2w: rotation about z + translation
        th = 0.3
        c2w = jnp.asarray(
            np.array(
                [
                    [np.cos(th), -np.sin(th), 0, 1.0],
                    [np.sin(th), np.cos(th), 0, -2.0],
                    [0, 0, 1, 0.5],
                ],
                dtype=np.float32,
            )
        )
        rays_o, rays_d = get_rays(dirs, c2w)
        assert rays_o.shape == (h, w, 3) and rays_d.shape == (h, w, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(rays_o)[1, 2], [1.0, -2.0, 0.5])
        # golden direction: rotate then normalize
        d_cam = np.asarray(dirs)[1, 2]
        d_world = np.asarray(c2w)[:, :3] @ d_cam
        d_world /= np.linalg.norm(d_world)
        np.testing.assert_allclose(np.asarray(rays_d)[1, 2], d_world, rtol=1e-5)


class TestNDC:
    def test_golden_formula(self):
        r = rng(2)
        n = 16
        h, w, focal, near = 8, 12, 10.0, 1.0
        rays_o = r.randn(n, 3).astype(np.float32)
        rays_d = r.randn(n, 3).astype(np.float32)
        rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5  # forward-facing
        rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0

        o_ndc, d_ndc = ndc_rays(h, w, focal, near, jnp.asarray(rays_o),
                                jnp.asarray(rays_d))
        # numpy transcription of models/utils.py:155-196
        t = -(near + rays_o[..., 2]) / rays_d[..., 2]
        ro = rays_o + t[..., None] * rays_d
        ox_oz = ro[..., 0] / ro[..., 2]
        oy_oz = ro[..., 1] / ro[..., 2]
        o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
        o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
        o2 = 1.0 + 2.0 * near / ro[..., 2]
        d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
        d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
        d2 = 1.0 - o2
        np.testing.assert_allclose(
            np.asarray(o_ndc), np.stack([o0, o1, o2], -1), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_ndc), np.stack([d0, d1, d2], -1), rtol=1e-4, atol=1e-5
        )

    def test_origin_on_near_plane(self):
        # after the shift, rays start at z_ndc == o2 + 0*d2 with o at near plane
        rays_o = jnp.array([[0.0, 0.0, -3.0]])
        rays_d = jnp.array([[0.1, -0.2, -1.0]])
        o_ndc, d_ndc = ndc_rays(4, 4, 5.0, 1.0, rays_o, rays_d)
        # full march t in [0,1]: endpoint z -> o2 + d2 == 1 (far plane at inf)
        np.testing.assert_allclose(
            np.asarray(o_ndc[..., 2] + d_ndc[..., 2]), 1.0, rtol=1e-6
        )


class TestStratifiedSampling:
    def test_deterministic_linear_depth(self):
        n, s = 4, 8
        origins = jnp.zeros((n, 3))
        dirs = jnp.ones((n, 3))
        near = jnp.full((n, 1), 2.0)
        far = jnp.full((n, 1), 6.0)
        z, pts = sample_along_rays(None, origins, dirs, near, far, s,
                                   randomized=False, lindisp=False)
        np.testing.assert_allclose(
            np.asarray(z[0]), np.linspace(2.0, 6.0, s), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pts), np.asarray(z)[..., None] * np.ones(3), rtol=1e-6
        )

    def test_lindisp(self):
        n, s = 2, 5
        near = jnp.full((n, 1), 1.0)
        far = jnp.full((n, 1), 4.0)
        z, _ = sample_along_rays(None, jnp.zeros((n, 3)), jnp.ones((n, 3)),
                                 near, far, s, randomized=False, lindisp=True)
        t = np.linspace(0, 1, s)
        golden = 1.0 / (1.0 / 1.0 * (1 - t) + 1.0 / 4.0 * t)
        np.testing.assert_allclose(np.asarray(z[0]), golden, rtol=1e-6)

    def test_randomized_within_bins(self):
        n, s = 64, 16
        near = jnp.full((n, 1), 1.0)
        far = jnp.full((n, 1), 5.0)
        z, _ = sample_along_rays(jax.random.PRNGKey(0), jnp.zeros((n, 3)),
                                 jnp.ones((n, 3)), near, far, s,
                                 randomized=True, lindisp=False)
        z = np.asarray(z)
        base = np.linspace(1.0, 5.0, s)
        mids = 0.5 * (base[:-1] + base[1:])
        lower = np.concatenate([[base[0]], mids])
        upper = np.concatenate([mids, [base[-1]]])
        assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
        assert (np.diff(z, axis=-1) > 0).all()  # sorted by construction


class TestSelectAlongAxis:
    """select_along_axis is the TPU-fast (gather-free) replacement for
    take_along_axis inside the inverse-CDF samplers and the interlevel
    loss; it must be BIT-identical to the gather (the golden sample_pdf
    tests depend on it)."""

    def test_bit_identical_to_take_along_axis(self):
        from nerfsr_tpu.core.sampling import select_along_axis

        r = rng(11)
        vals = r.randn(16, 65).astype(np.float32)
        idx = r.randint(0, 65, size=(16, 64)).astype(np.int32)
        # include the edge indices explicitly
        idx[0, 0], idx[0, 1] = 0, 64
        got = np.asarray(select_along_axis(jnp.asarray(vals),
                                           jnp.asarray(idx)))
        want = np.take_along_axis(vals, idx, axis=-1)
        assert (got == want).all()

    def test_leading_batch_dims(self):
        from nerfsr_tpu.core.sampling import select_along_axis

        r = rng(12)
        vals = r.randn(3, 5, 9).astype(np.float32)
        idx = r.randint(0, 9, size=(3, 5, 4)).astype(np.int32)
        got = np.asarray(select_along_axis(jnp.asarray(vals),
                                           jnp.asarray(idx)))
        want = np.take_along_axis(vals, idx, axis=-1)
        assert (got == want).all()

    def test_gradient_matches_gather(self):
        from nerfsr_tpu.core.sampling import select_along_axis

        r = rng(13)
        vals = jnp.asarray(r.randn(4, 8).astype(np.float32))
        idx = jnp.asarray(r.randint(0, 8, size=(4, 6)).astype(np.int32))
        g1 = jax.grad(lambda v: jnp.sum(select_along_axis(v, idx) ** 2))(
            vals)
        g2 = jax.grad(lambda v: jnp.sum(
            jnp.take_along_axis(v, idx, axis=-1) ** 2))(vals)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)


class TestInverseCDF:
    def _golden_sample_pdf(self, bins, weights, u):
        """numpy transcription of models/utils.py:61-92."""
        eps = 1e-5
        weights = weights + eps
        pdf = weights / weights.sum(-1, keepdims=True)
        cdf = np.cumsum(pdf, -1)
        cdf = np.concatenate([np.zeros_like(cdf[:, :1]), cdf], -1)
        n_rays, n_inner = weights.shape
        inds = np.stack(
            [np.searchsorted(cdf[i], u[i], side="right") for i in range(n_rays)]
        )
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, n_inner)
        cdf_g0 = np.take_along_axis(cdf, below, 1)
        cdf_g1 = np.take_along_axis(cdf, above, 1)
        bins_g0 = np.take_along_axis(bins, below, 1)
        bins_g1 = np.take_along_axis(bins, above, 1)
        denom = cdf_g1 - cdf_g0
        denom[denom < eps] = 1
        return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)

    def test_matches_reference_formula_deterministic(self):
        r = rng(3)
        n, s, ns = 8, 16, 12
        z_vals = np.sort(r.rand(n, s).astype(np.float32) * 4 + 1, axis=-1)
        bins = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        weights = r.rand(n, s - 2).astype(np.float32)
        # include a degenerate all-tiny-weight ray (denom<eps path)
        weights[0] = 0.0
        u = np.broadcast_to(
            np.linspace(0, 1, ns, dtype=np.float32), (n, ns)
        ).copy()
        golden = self._golden_sample_pdf(bins, weights, u)
        got = sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), ns,
                         randomized=False)
        np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4,
                                   atol=1e-5)

    def test_resample_merges_and_sorts(self):
        r = rng(4)
        n, s, ns = 4, 10, 6
        z_vals = jnp.asarray(
            np.sort(r.rand(n, s).astype(np.float32) * 3 + 1, -1))
        weights = jnp.asarray(r.rand(n, s).astype(np.float32))
        z_all, pts = resample_along_rays(
            jax.random.PRNGKey(1), jnp.zeros((n, 3)), jnp.ones((n, 3)),
            z_vals, weights, ns, randomized=True)
        assert z_all.shape == (n, s + ns)
        z_np = np.asarray(z_all)
        assert (np.diff(z_np, axis=-1) >= 0).all()
        # the original coarse depths must all be present in the union
        for i in range(n):
            assert np.isin(
                np.asarray(z_vals)[i].round(5), z_np[i].round(5)
            ).all()
        assert pts.shape == (n, s + ns, 3)

    def test_concentrates_samples_on_high_weight_bins(self):
        n, s, ns = 1, 32, 64
        z_vals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s), (n, s))
        weights = np.zeros((n, s), np.float32)
        weights[:, 15:18] = 10.0  # mass in the middle
        z_all, _ = resample_along_rays(
            jax.random.PRNGKey(2), jnp.zeros((n, 3)), jnp.ones((n, 3)),
            z_vals, jnp.asarray(weights), ns, randomized=True)
        new = np.asarray(z_all)[0]
        frac_middle = ((new > 0.4) & (new < 0.6)).mean()
        assert frac_middle > 0.5


class TestPositionalEncoding:
    def _golden(self, x, n_freqs, include_identity=True, log_scale=True):
        if log_scale:
            freqs = 2.0 ** np.arange(n_freqs)
        else:
            freqs = np.linspace(1, 2 ** (n_freqs - 1), n_freqs)
        out = [x] if include_identity else []
        for f in freqs:
            for fn in (np.sin, np.cos):
                out.append(fn(f * x))
        return np.concatenate(out, -1)

    @pytest.mark.parametrize("identity", [True, False])
    @pytest.mark.parametrize("log_scale", [True, False])
    def test_matches_reference_order(self, identity, log_scale):
        r = rng(5)
        x = r.randn(7, 3).astype(np.float32)
        got = positional_encoding(jnp.asarray(x), 4,
                                  include_identity=identity,
                                  log_scale=log_scale)
        golden = self._golden(x, 4, identity, log_scale)
        assert got.shape[-1] == posenc_channels(3, 4, identity)
        np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-5,
                                   atol=1e-6)

    def test_default_channel_counts(self):
        # deg_pos=10 -> 63 channels, deg_dir=4 -> 27 (models/nerf_model.py:56-57)
        assert posenc_channels(3, 10) == 63
        assert posenc_channels(3, 4) == 27


class TestVolumetricRendering:
    def _golden(self, rgb, sigma, z_vals, white_bkgd, act):
        eps = 1e-10
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
        deltas = np.concatenate(
            [deltas, 1e10 * np.ones_like(deltas[:, :1])], -1)
        if act == "relu":
            s = np.maximum(sigma, 0)
        else:
            s = np.log1p(np.exp(sigma - 1))
        alpha = 1 - np.exp(-deltas * s)
        accum = np.concatenate(
            [np.ones_like(alpha[:, :1]),
             np.cumprod(1 - alpha[:, :-1] + eps, -1)], -1)
        weights = alpha * accum
        comp = (weights[..., None] * rgb).sum(-2)
        depth = (weights * z_vals).sum(-1)
        opacity = weights.sum(-1)
        if white_bkgd:
            comp = comp + 1 - opacity[..., None]
        return comp, depth, opacity, weights

    @pytest.mark.parametrize("white_bkgd", [False, True])
    @pytest.mark.parametrize("act", ["relu", "softplus"])
    def test_golden(self, white_bkgd, act):
        r = rng(6)
        n, s = 5, 12
        rgb = r.rand(n, s, 3).astype(np.float32)
        sigma = (r.randn(n, s) * 2).astype(np.float32)
        z_vals = np.sort(r.rand(n, s).astype(np.float32) * 5 + 1, -1)
        got = volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z_vals),
            white_bkgd, act)
        golden = self._golden(rgb, sigma, z_vals, white_bkgd, act)
        for g, gg in zip(got, golden):
            np.testing.assert_allclose(np.asarray(g), gg, rtol=1e-4,
                                       atol=1e-5)

    def test_opaque_wall(self):
        # one huge-sigma sample -> all weight on it, depth == its z
        n, s = 1, 8
        z_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, s), (n, s))
        sigma = np.full((n, s), -100.0, np.float32)
        sigma[0, 3] = 1e6
        rgb = jnp.ones((n, s, 3)) * 0.25
        comp, depth, opacity, weights = volumetric_rendering(
            rgb, jnp.asarray(sigma), z_vals, False, "relu")
        np.testing.assert_allclose(float(depth[0]), float(z_vals[0, 3]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(opacity[0]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(comp[0]), [0.25] * 3, rtol=1e-4)

    def test_empty_space_white_bkgd(self):
        n, s = 1, 8
        z_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, s), (n, s))
        comp, depth, opacity, _ = volumetric_rendering(
            jnp.zeros((n, s, 3)), jnp.full((n, s), -10.0), z_vals, True,
            "relu")
        np.testing.assert_allclose(np.asarray(comp[0]), [1.0] * 3, atol=1e-5)
        np.testing.assert_allclose(float(opacity[0]), 0.0, atol=1e-6)

    def test_softplus_shift(self):
        x = jnp.array([0.0, 1.0, 5.0])
        np.testing.assert_allclose(
            np.asarray(sigma_activation(x, "softplus")),
            np.log1p(np.exp(np.asarray(x) - 1.0)), rtol=1e-5)


class TestCastRays:
    def test_broadcast(self):
        o = jnp.array([[1.0, 2.0, 3.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        z = jnp.array([[1.0, 2.0]])
        pts = cast_rays(o, d, z)
        np.testing.assert_allclose(
            np.asarray(pts), [[[1, 2, 2], [1, 2, 1]]], rtol=1e-6)
