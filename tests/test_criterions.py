"""Golden unit tests for the loss/metric zoo against independent numpy
transcriptions of the reference formulas (``models/criterions.py`` of
cwchenwang/NeRF-SR), plus an SSIM<=1 regression (the on-device precision
bug fixed in commit aca0bda had SSIM exceed 1)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.models.criterions import (bilateral_laplacian_loss,
                                          gradient_loss, laplacian_loss,
                                          psnr, ssim, tv_loss)


def _rand(shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).rand(*shape) * scale).astype(
        np.float32)


def _np_second_diffs(d):
    """Reference LaplacianLoss stencils (:111-115), numpy."""
    l1 = d[:, :, :-2] + d[:, :, 2:] - 2 * d[:, :, 1:-1]
    l2 = d[:, :-2, :] + d[:, 2:, :] - 2 * d[:, 1:-1, :]
    l3 = d[:, :-2, :-2] + d[:, 2:, 2:] - 2 * d[:, 1:-1, 1:-1]
    l4 = d[:, 2:, :-2] + d[:, :-2, 2:] - 2 * d[:, 1:-1, 1:-1]
    return l1, l2, l3, l4


class TestTV:
    def test_golden_vs_numpy(self):
        x = _rand((2, 5, 7, 3), seed=1)
        n, h, w, c = x.shape
        h_tv = np.sum((x[:, 1:] - x[:, :-1]) ** 2)
        w_tv = np.sum((x[:, :, 1:] - x[:, :, :-1]) ** 2)
        want = 2 * (h_tv / ((h - 1) * w * c) + w_tv / (h * (w - 1) * c)) / n
        np.testing.assert_allclose(float(tv_loss(jnp.asarray(x))), want,
                                   rtol=1e-5)

    def test_constant_image_is_zero(self):
        x = jnp.ones((1, 4, 4, 3))
        assert float(tv_loss(x)) == 0.0


class TestGradientLoss:
    def test_golden_vs_numpy(self):
        p, t = _rand((2, 6, 6, 3), 2), _rand((2, 6, 6, 3), 3)

        def grads(img):
            dy = np.zeros_like(img)
            dx = np.zeros_like(img)
            dy[:, :-1] = img[:, 1:] - img[:, :-1]
            dx[:, :, :-1] = img[:, :, 1:] - img[:, :, :-1]
            return dy, dx

        pdy, pdx = grads(p)
        tdy, tdx = grads(t)
        want = (np.mean(np.abs(pdx - tdx)) + np.mean(np.abs(pdy - tdy))) / 2
        got = float(gradient_loss(jnp.asarray(p), jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_identical_is_zero(self):
        p = jnp.asarray(_rand((1, 5, 5, 3), 4))
        assert float(gradient_loss(p, p)) == 0.0


class TestLaplacian:
    def test_golden_vs_numpy(self):
        d = _rand((2, 7, 8), 5)
        want = sum(np.mean(np.abs(t)) for t in _np_second_diffs(d)) / 4
        np.testing.assert_allclose(float(laplacian_loss(jnp.asarray(d))),
                                   want, rtol=1e-5)

    def test_planar_depth_is_zero(self):
        # second differences vanish on an affine ramp
        yy, xx = np.mgrid[0:6, 0:6].astype(np.float32)
        d = (0.3 * xx + 0.7 * yy + 1.0)[None]
        assert float(laplacian_loss(jnp.asarray(d))) < 1e-6


class TestBilateralLaplacian:
    def test_golden_vs_numpy(self):
        d = _rand((2, 7, 8), 6)
        rgb = _rand((2, 7, 8, 3), 7)
        gamma = 0.1
        loss = 0.0
        for lap_d, lap_c in zip(_np_second_diffs(d),
                                _np_second_diffs(rgb)):
            w = np.exp(-np.abs(lap_c).sum(-1) / gamma)
            loss += np.mean(np.abs(w * lap_d))
        want = loss / 4
        got = float(bilateral_laplacian_loss(jnp.asarray(d),
                                             jnp.asarray(rgb), gamma))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_edges_downweight_smoothing(self):
        """A sharp rgb edge must suppress the depth penalty vs a flat rgb."""
        d = _rand((1, 8, 8), 8)
        flat_rgb = np.full((1, 8, 8, 3), 0.5, np.float32)
        edge_rgb = flat_rgb.copy()
        edge_rgb[:, :, 4:] = 1.0
        l_flat = float(bilateral_laplacian_loss(jnp.asarray(d),
                                                jnp.asarray(flat_rgb)))
        l_edge = float(bilateral_laplacian_loss(jnp.asarray(d),
                                                jnp.asarray(edge_rgb)))
        assert l_edge < l_flat


class TestSSIM:
    def test_identical_images_bounded_by_one(self):
        """Regression for the SSIM>1 precision bug (commit aca0bda):
        self-similarity must be ~1 and never exceed it, at the LLFF
        eval-ish shape."""
        img = jnp.asarray(_rand((189, 252, 3), 9))
        val = float(ssim(img, img))
        assert 0.999 <= val <= 1.0 + 1e-6

    def test_noise_reduces_ssim(self):
        img = jnp.asarray(_rand((64, 64, 3), 10))
        noisy = img + 0.2 * jnp.asarray(_rand((64, 64, 3), 11) - 0.5)
        assert float(ssim(img, noisy)) < float(ssim(img, img))

    def test_range_minus1_1(self):
        """max_val=2 path used by the refine stage on (-1,1) images."""
        img = jnp.asarray(_rand((32, 32, 3), 12) * 2 - 1)
        val = float(ssim(img, img, max_val=2.0))
        assert 0.999 <= val <= 1.0 + 1e-6


class TestPSNR:
    def test_known_value(self):
        p = jnp.zeros((4, 4, 3))
        t = jnp.full((4, 4, 3), 0.1)
        np.testing.assert_allclose(float(psnr(p, t)),
                                   -10 * np.log10(0.01), rtol=1e-5)
