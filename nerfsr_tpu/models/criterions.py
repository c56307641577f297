"""Losses and image metrics.

Functional parity with ``models/criterions.py`` of cwchenwang/NeRF-SR
(ColorMSELoss, L1Loss, PSNR, TVLoss, GradientLoss, LaplacianLoss,
BilateralLaplacianLoss, VGGPerceptualLoss, SSIM, GradLoss), written as
pure JAX functions.

Image layout convention is NHWC throughout (TPU-native), vs the
reference's NCHW.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerfsr_tpu.core.sampling import select_along_axis


# ---------------------------------------------------------------------------
# basic
# ---------------------------------------------------------------------------

def color_mse(pred, target):
    """Parity: ColorMSELoss (``models/criterions.py:7-16``)."""
    return jnp.mean((pred - target) ** 2)


def l1(pred, target):
    """Parity: L1Loss (:18-25)."""
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred, target, valid_mask=None):
    """-10 log10(mse). Parity: PSNR (:27-36)."""
    err = (pred - target) ** 2
    if valid_mask is not None:
        err = err[valid_mask]
    mse = jnp.mean(err)
    return -10.0 * jnp.log10(mse)


# ---------------------------------------------------------------------------
# spatial regularizers (NHWC / NHW inputs)
# ---------------------------------------------------------------------------

def tv_loss(x, weight: float = 1.0):
    """Total variation over (N, H, W, C). Parity: TVLoss (:56-69) — mean
    squared forward differences in h and w, averaged and doubled."""
    n, h, w, c = x.shape
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    return weight * 2 * (h_tv / count_h + w_tv / count_w) / n


def image_gradients(img):
    """tf.image.image_gradients-style forward differences, zero padded at
    the far edge. img: (N, H, W, C) -> (dy, dx) same shape.
    Parity: GradientLoss._gradient (:78-96)."""
    dy = img[:, 1:, :, :] - img[:, :-1, :, :]
    dx = img[:, :, 1:, :] - img[:, :, :-1, :]
    dy = jnp.concatenate([dy, jnp.zeros_like(img[:, :1])], axis=1)
    dx = jnp.concatenate([dx, jnp.zeros_like(img[:, :, :1])], axis=2)
    return dy, dx


def gradient_loss(pred, target):
    """Mean L1 on image gradients. Parity: GradientLoss (:71-101),
    including the final /2."""
    pdy, pdx = image_gradients(pred)
    tdy, tdx = image_gradients(target)
    return (jnp.mean(jnp.abs(pdx - tdx)) + jnp.mean(jnp.abs(pdy - tdy))) / 2


def grad_loss(pred, target):
    """Sobel-gradient magnitude loss over (N, H, W, C) images.

    Parity: GradLoss (``models/criterions.py:38-54``) — unused by any
    reference script, carried for zoo completeness FAITHFULLY, i.e.
    including the reference's quirks: ``kernel_y`` duplicates the
    x-Sobel kernel (:44), the target term applies ``weight_x`` twice
    (:53), and the reduction is ``mean(diff) ** 2`` (squared-mean, not
    mean-square). The conv kernel is the reference's single output
    channel summing the Sobel response over all input channels
    (``repeat(C,1,1).unsqueeze(0)``), VALID padding.
    """
    sobel_x = jnp.array([[-1.0, 0.0, 1.0],
                         [-2.0, 0.0, 2.0],
                         [-1.0, 0.0, 1.0]], jnp.float32)
    c = pred.shape[-1]
    k = jnp.broadcast_to(sobel_x[:, :, None, None], (3, 3, c, 1))

    def conv(img, kern):
        return jax.lax.conv_general_dilated(
            img, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    kernel_y = k  # reference bug: kernel_y == kernel_x
    grad_inputs = conv(pred, k) ** 2 + conv(pred, kernel_y) ** 2
    grad_targets = conv(target, k) ** 2 + conv(target, k) ** 2
    return jnp.mean(grad_inputs - grad_targets) ** 2


def _second_differences(d):
    """4-direction second differences of (N, H, W[, C]) on the interior:
    horizontal, vertical and the two diagonals — the exact stencils of
    LaplacianLoss (:111-115)."""
    l1 = d[:, :, :-2] + d[:, :, 2:] - 2.0 * d[:, :, 1:-1]
    l2 = d[:, :-2, :] + d[:, 2:, :] - 2.0 * d[:, 1:-1, :]
    l3 = d[:, :-2, :-2] + d[:, 2:, 2:] - 2.0 * d[:, 1:-1, 1:-1]
    l4 = d[:, 2:, :-2] + d[:, :-2, 2:] - 2.0 * d[:, 1:-1, 1:-1]
    return l1, l2, l3, l4


def laplacian_loss(depth):
    """Parity: LaplacianLoss (:103-115). depth: (N, H, W)."""
    terms = _second_differences(depth)
    return sum(jnp.mean(jnp.abs(t)) for t in terms) / 4.0


def bilateral_laplacian_loss(depth, rgb, gamma: float = 0.1):
    """Edge-aware depth smoothness: each directional depth laplacian is
    weighted by ``exp(-|laplacian(rgb)|.sum(channels) / gamma)`` over the
    same stencil. Parity: BilateralLaplacianLoss (:118-137).

    depth: (N, H, W); rgb: (N, H, W, 3).
    """
    d_terms = _second_differences(depth)
    c_terms = _second_differences(rgb)
    loss = 0.0
    for lap_d, lap_c in zip(d_terms, c_terms):
        w = jnp.exp(-jnp.abs(lap_c).sum(-1) / gamma)
        loss = loss + jnp.mean(jnp.abs(w * lap_d))
    return loss / 4.0


def _outer_mass(t_q, t_env, w_env):
    """Upper bound on the env histogram's mass inside each query
    interval: env-CDF(smallest env edge >= hi) - env-CDF(largest env
    edge <= lo). Histogram edges t_q (N, S+1) / t_env (N, P+1), env bin
    weights w_env (N, P) -> (N, S).

    searchsorted is expressed as an all-pairs comparison reduction
    (fully parallel on the VPU — same trick as ``core.sampling
    .sample_pdf``)."""
    cw = jnp.concatenate(
        [jnp.zeros_like(w_env[..., :1]), jnp.cumsum(w_env, -1)], -1)
    n_edges = cw.shape[-1]
    # floor index for each query edge: #{j : t_env[j] <= x} - 1
    le = jnp.sum((t_env[:, None, :] <= t_q[:, :, None]), -1) - 1
    # ceil index: #{j : t_env[j] < x}
    lt = jnp.sum((t_env[:, None, :] < t_q[:, :, None]), -1)
    idx_lo = jnp.clip(le[:, :-1], 0, n_edges - 1)
    idx_hi = jnp.clip(lt[:, 1:], 0, n_edges - 1)
    mass_lo = select_along_axis(cw, idx_lo)
    mass_hi = select_along_axis(cw, idx_hi)
    return jnp.maximum(mass_hi - mass_lo, 0.0)


def interlevel_loss(z_fine, w_fine, z_prop, w_prop, eps: float = 1e-6):
    """Proposal (interlevel) loss for --fast_sampling: penalize the
    proposal histogram wherever it fails to UPPER-BOUND the fine
    histogram, so the tiny proposal net learns where the big net puts
    mass (mip-NeRF 360's lossfun_outer, arXiv 2111.12077 eq. 13 —
    public method; no reference counterpart). Sample depths act as bin
    edges; each histogram's terminal (1e10-interval) weight is dropped.
    Fine weights are stop-gradient'ed: only the proposal learns from
    this term."""
    w_f = jax.lax.stop_gradient(w_fine[..., :-1])
    w_outer = _outer_mass(z_fine, z_prop, w_prop[..., :-1])
    return jnp.mean(
        jnp.clip(w_f - w_outer, 0.0, None) ** 2 / (w_f + eps))


# ---------------------------------------------------------------------------
# GAN objectives
# ---------------------------------------------------------------------------

def gan_loss(logits, target_is_real: bool, mode: str = "vanilla"):
    """GAN objective on discriminator logits (parity: GANLoss,
    ``models/nerf_downX_model.py:39-98``).

    vanilla: sigmoid BCE vs the real/fake label
    lsgan:   MSE vs 1/0
    wgangp:  -mean(logits) for real, +mean(logits) for fake
    """
    if mode == "vanilla":
        label = jnp.ones_like(logits) if target_is_real \
            else jnp.zeros_like(logits)
        return jnp.mean(
            optax_sigmoid_bce(logits, label))
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - target) ** 2)
    if mode == "wgangp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise ValueError(f"unknown gan mode {mode}")


def optax_sigmoid_bce(logits, labels):
    # BCEWithLogits without importing optax here
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(labels * log_p + (1.0 - labels) * log_not_p)


def wgan_gradient_penalty(d_apply, key, real, fake, lam: float = 10.0):
    """Standard WGAN-GP penalty on interpolates (capability of the
    reference's wgangp mode)."""
    eps = jax.random.uniform(key, (real.shape[0],) + (1,) *
                             (real.ndim - 1))
    inter = eps * real + (1 - eps) * fake

    def d_sum(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(d_sum)(inter)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=tuple(range(1, real.ndim)))
                     + 1e-12)
    return lam * jnp.mean((norms - 1.0) ** 2)


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

def _gaussian_kernel(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def ssim(img0, img1, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         return_map: bool = False):
    """Gaussian-window SSIM over (H, W, C) or (N, H, W, C) images.

    Behavioral parity with the reference SSIM
    (``models/criterions.py:190-284``), which is the standard
    Wang et al. formulation with an 11x1x1x11 separable gaussian window.
    """
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    # images smaller than the window would leave a zero-size VALID conv
    # output (mean of empty = nan); shrink the window like skimage does.
    filter_size = min(filter_size, img0.shape[1], img0.shape[2])
    kernel = _gaussian_kernel(filter_size, filter_sigma)

    def blur(x):
        # separable conv along H then W, per channel (depthwise, done via
        # moving the channel into the batch). precision=HIGHEST matters:
        # TPU convs default to bf16 multiplies, which perturbs the
        # covariance estimates enough to break the SSIM<=1 bound
        # (observed mean SSIM 1.046 on-device before the fix).
        n, h, w, c = x.shape
        hi = jax.lax.Precision.HIGHEST
        xt = x.transpose(0, 3, 1, 2).reshape(n * c, 1, h, w)
        kh = kernel.reshape(1, 1, filter_size, 1)
        kw = kernel.reshape(1, 1, 1, filter_size)
        y = jax.lax.conv_general_dilated(xt, kh, (1, 1), "VALID",
                                         precision=hi)
        y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                         precision=hi)
        hh, ww = y.shape[-2:]
        return y.reshape(n, c, hh, ww).transpose(0, 2, 3, 1)

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00 = blur(img0 * img0) - mu00
    s11 = blur(img1 * img1) - mu11
    s01 = blur(img0 * img1) - mu01

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * s01 + c2)
    denom = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    ssim_map = numer / denom
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# VGG perceptual loss
# ---------------------------------------------------------------------------

# Feature taps and weights matching the reference
# (``models/criterions.py:147-156``): relu outputs at torchvision VGG19
# feature indices {3, 8, 13, 22, 31} weighted {1, .75, .5, .5, 1}.
VGG_TAP_WEIGHTS = (1.0, 0.75, 0.5, 0.5, 1.0)
# VGG19 conv plan up to each tap: (out_channels per conv, pool positions)
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512)
# convs consumed at torchvision feature indices 3, 8, 13, 22, 31
# (relu1_2, relu2_2, relu3_2, relu4_2, relu5_2)
_TAP_LAYER_COUNTS = (2, 4, 6, 10, 14)

# numpy on purpose: a module-level jnp.array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize (it
# must run before ANY backend init — multihost entry paths import this
# module transitively). jnp ops convert these on first use inside jit.
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def write_synthetic_vgg_npz(path, seed: int = 0):
    """Write a VGG19-SHAPED random-weights archive (same keys/shapes as
    ``tools/convert_vgg.py`` output: w{i} HWIO / b{i} for the first 14
    convs).

    Purpose: (a) CI executes the full perceptual-loss forward+grad path
    without ImageNet weights (none are obtainable on an egress-less
    host); (b) a documented substitute metric — random-projection conv
    features still define a translation-sensitive multi-scale distance
    (zero iff patches match), though NOT perceptually calibrated like
    the pretrained reference (``models/criterions.py:149``). He-scaled
    so activations neither vanish nor explode through 14 layers.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    chans = [c for c in _VGG19_CFG if c != "M"]
    arrays = {}
    cin = 3
    for i, cout in enumerate(chans):
        fan_in = 3 * 3 * cin
        arrays[f"w{i}"] = (rng.randn(3, 3, cin, cout)
                           * np.sqrt(2.0 / fan_in)).astype(np.float32)
        arrays[f"b{i}"] = np.zeros((cout,), np.float32)
        cin = cout
    np.savez(path, **arrays)
    return path


class VGGPerceptualLoss:
    """VGG19-feature L1 perceptual loss (reference :140-187).

    Weights load lazily from a converted-numpy archive produced by
    ``tools/convert_vgg.py`` (torchvision VGG19 -> npz); without the
    archive the loss raises, matching the reference's hard dependency on
    pretrained torchvision weights. Inputs are NHWC in (-1, 1), like the
    reference's normalized patches.
    """

    def __init__(self, weights_path: str | None = None):
        self.weights_path = weights_path
        self._params = None

    def _load(self):
        if self._params is None:
            import numpy as np
            if not self.weights_path:
                raise FileNotFoundError(
                    "VGG weights archive required: run tools/convert_vgg.py")
            z = np.load(self.weights_path)
            self._params = [(jnp.asarray(z[f"w{i}"]), jnp.asarray(z[f"b{i}"]))
                            for i in range(len(z.files) // 2)]
        return self._params

    def features(self, x):
        """x: (N, H, W, 3) in (-1, 1) -> list of tap features."""
        params = self._load()
        x = (x + 1.0) / 2.0
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        taps = []
        conv_i = 0
        consumed = 0
        tap_set = set(_TAP_LAYER_COUNTS)
        for spec in _VGG19_CFG:
            if spec == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            w, b = params[conv_i]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + b)
            conv_i += 1
            consumed += 1
            if consumed in tap_set:
                taps.append(x)
                if len(taps) == len(_TAP_LAYER_COUNTS):
                    break
        return taps

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, pred, target):
        f_pred = self.features(pred)
        f_tgt = self.features(jax.lax.stop_gradient(target))
        loss = 0.0
        for w, a, b in zip(VGG_TAP_WEIGHTS, f_pred, f_tgt):
            loss = loss + w * jnp.mean(jnp.abs(a - b))
        return loss
