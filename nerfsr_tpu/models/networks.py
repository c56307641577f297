"""Refinement-stage CNNs, flax/NHWC.

Capability parity with ``models/networks.py`` of cwchenwang/NeRF-SR:

- ``UnetGenerator`` (:346-459): 6-down U-Net, ngf=64, stride-2 4x4 convs
  down / 4x4 transposed convs up, tanh output, ``--learn_residual`` adds
  the input rgb. Default input is sr patch + 8 ref patches channel-concat
  (27 ch).
- ``MaxPoolingModel`` (:735-999): shared 7-conv multi-scale encoder for
  the sr patch and each reference patch; reference features max-pooled
  over the candidate axis per scale; U-Net-ish decoder fuses synth +
  max features at 4 scales, tanh out. ``--not_use_ref`` decodes from the
  synth features alone.
- ``NLayerDiscriminator`` (:588-692): spectral-norm + InstanceNorm
  patch discriminator for 32/64 patches (GAN refinement option).

All tensors NHWC (TPU layout); the reference is NCHW.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = nn.initializers.xavier_normal()


class _Norm(nn.Module):
    """batch / instance / none normalization selector."""

    kind: str
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9, epsilon=1e-5)(x)
        if self.kind == "instance":
            # torch InstanceNorm2d default: no affine params
            return nn.GroupNorm(num_groups=x.shape[-1], use_bias=False,
                                use_scale=False)(x)
        return x


class UnetGenerator(nn.Module):
    """Recursive U-Net (reference UnetGenerator/UnetSkipConnectionBlock)."""

    output_nc: int = 3            # --output_nc
    ngf: int = 64                 # --ngf
    num_downs: int = 6
    norm: str = "batch"           # --norm
    learn_residual: bool = False  # --learn_residual

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        ngf = self.ngf
        if min(x.shape[1], x.shape[2]) < 2 ** self.num_downs:
            raise ValueError(
                f"UnetGenerator with num_downs={self.num_downs} needs "
                f">= {2 ** self.num_downs}px patches, got "
                f"{x.shape[1]}x{x.shape[2]}; lower --num_downs or raise "
                f"--patch_len (the reference has the same constraint)")
        # channel plan outermost -> innermost
        downs = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)

        skips = []
        h = x
        for i, feats in enumerate(downs):
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(feats, (4, 4), strides=(2, 2), padding=1,
                        use_bias=(self.norm != "batch"),
                        kernel_init=xavier, name=f"down_{i}")(h)
            if 0 < i < len(downs) - 1:
                h = _Norm(self.norm, ura, name=f"down_norm_{i}")(h)
            skips.append(h)

        # up path: innermost block sees only the bottleneck; others see
        # cat(skip, up(h))
        ups = list(reversed(downs[:-1])) + [self.output_nc]
        for i, feats in enumerate(ups):
            h = nn.relu(h)
            h = nn.ConvTranspose(
                feats, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=(self.norm != "batch" or i == len(ups) - 1),
                kernel_init=xavier, name=f"up_{i}")(h)
            if i < len(ups) - 1:
                h = _Norm(self.norm, ura, name=f"up_norm_{i}")(h)
                skip = skips[len(downs) - 2 - i]
                h = jnp.concatenate([skip, h], axis=-1)
        out = nn.tanh(h)
        if self.learn_residual:
            out = x[..., :3] + out
        return out


class ResnetBlock(nn.Module):
    """Residual conv block with reflect padding (reference ResnetBlock,
    ``models/networks.py:520-586``)."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding=0,
                    kernel_init=xavier)(h)
        h = nn.relu(_Norm(self.norm, ura)(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.features, (3, 3), padding=0,
                    kernel_init=xavier)(h)
        h = _Norm(self.norm, ura)(h)
        return x + h


class ResnetGenerator(nn.Module):
    """Resnet-based translator (reference ResnetGenerator,
    ``models/networks.py:461-518``; not used by any shipped script):
    7x7 stem, 2 stride-2 downs, n_blocks residual blocks, 2 ups, tanh."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding=0, kernel_init=xavier)(h)
        h = nn.relu(_Norm(self.norm, ura)(h))
        for i in range(2):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=1, kernel_init=xavier)(h)
            h = nn.relu(_Norm(self.norm, ura)(h))
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.norm)(h, train=train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3),
                                 strides=(2, 2), padding="SAME",
                                 kernel_init=xavier)(h)
            h = nn.relu(_Norm(self.norm, ura)(h))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.output_nc, (7, 7), padding=0,
                    kernel_init=xavier)(h)
        return nn.tanh(h)


class ConvBlock(nn.Module):
    """Conv -> optional BatchNorm -> ReLU (reference ``Conv2d`` helper,
    ``models/networks.py:694-710``; unused by any shipped script, carried
    for zoo completeness)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    normalization: str | None = None  # None | 'batch'

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=self.padding, kernel_init=xavier)(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
        return nn.relu(x)


class Up2x(nn.Module):
    """Bilinear 2x upsample -> reflect pad -> 3x3 conv -> optional
    BatchNorm -> ReLU (reference ``Up2x``, ``models/networks.py:713-733``;
    unused by any shipped script, carried for zoo completeness)."""

    features: int
    normalization: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), "bilinear")
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.features, (3, 3), padding=0,
                    kernel_init=xavier)(x)
        if self.normalization == "batch":
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
        return nn.relu(x)


class VNPCATEncoder(nn.Module):
    """7-conv multi-scale patch encoder (reference Model_VNPCAT_Encoder):
    returns features at 4 scales [x2(128, full), x4(256, /2), x6(512, /4),
    x7(512, /8)]."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        conv = lambda f, s, name: nn.Conv(  # noqa: E731
            f, (3, 3), strides=(s, s), padding=1, kernel_init=xavier,
            name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=ura, momentum=0.9, name=name)

        x1 = nn.relu(conv(128, 1, "conv1")(x))
        x2 = nn.relu(bn("bn2")(conv(128, 1, "conv2")(x1)))
        x3 = nn.relu(bn("bn3")(conv(256, 2, "conv3")(x2)))
        x4 = nn.relu(bn("bn4")(conv(256, 1, "conv4")(x3)))
        x5 = nn.relu(bn("bn5")(conv(512, 2, "conv5")(x4)))
        x6 = nn.relu(bn("bn6")(conv(512, 1, "conv6")(x5)))
        x7 = nn.relu(bn("bn7")(conv(512, 2, "conv7")(x6)))
        return [x2, x4, x6, x7]


def _upsample2x(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class VNPCATDecoder(nn.Module):
    """Decoder fusing synth + max-pooled ref features at 4 scales
    (reference Model_VNPCAT_Decoder; ``use_ref=False`` gives the
    _NoPooling variant)."""

    use_ref: bool = True

    @nn.compact
    def __call__(self, f_synth, f_max=None, train: bool = False):
        ura = not train
        conv = lambda f, name: nn.Conv(  # noqa: E731
            f, (3, 3), padding=1, kernel_init=xavier, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=ura, momentum=0.9, name=name)

        def block(x, feats, i):
            x = nn.relu(bn(f"bn{i}a")(conv(feats, f"conv{i}a")(x)))
            x = nn.relu(bn(f"bn{i}b")(conv(feats, f"conv{i}b")(x)))
            return x

        cat = (lambda *xs: jnp.concatenate(xs, axis=-1))
        x0 = cat(f_synth[3], f_max[3]) if self.use_ref else f_synth[3]
        x = block(x0, 512, 1)
        x = nn.relu(bn("bn2up")(conv(512, "conv2up")(_upsample2x(x))))

        x = cat(x, f_synth[2], f_max[2]) if self.use_ref \
            else cat(x, f_synth[2])
        x = block(x, 512, 3)
        x = nn.relu(bn("bn4up")(conv(256, "conv4up")(_upsample2x(x))))

        x = cat(x, f_synth[1], f_max[1]) if self.use_ref \
            else cat(x, f_synth[1])
        x = block(x, 256, 5)
        x = nn.relu(bn("bn6up")(conv(128, "conv6up")(_upsample2x(x))))

        x = cat(x, f_synth[0], f_max[0]) if self.use_ref \
            else cat(x, f_synth[0])
        x = block(x, 128, 7)
        x = nn.tanh(conv(3, "conv9")(x))
        return x


class MaxPoolingModel(nn.Module):
    """sr patch + N candidate ref patches -> refined patch (reference
    MaxPoolingModel :947-999): encode all through one shared encoder, max
    over candidates per scale, decode with skip fusion."""

    use_ref: bool = True   # not --not_use_ref

    @nn.compact
    def __call__(self, x_synth, x_candidates=None, train: bool = False):
        """x_synth: (N, H, W, 3); x_candidates: (N, K, H, W, 3)."""
        encoder = VNPCATEncoder(name="E")
        f_synth = encoder(x_synth, train=train)
        if not self.use_ref:
            return VNPCATDecoder(use_ref=False, name="D")(
                f_synth, train=train)
        n, k = x_candidates.shape[:2]
        flat = x_candidates.reshape((n * k,) + x_candidates.shape[2:])
        f_candi = encoder(flat, train=train)
        f_max = [
            jnp.max(f.reshape((n, k) + f.shape[1:]), axis=1)
            for f in f_candi
        ]
        return VNPCATDecoder(use_ref=True, name="D")(
            f_synth, f_max, train=train)


def create_discriminator(opt):
    """Discriminator factory honoring ``--dis_network`` / ``--ndf_dis``
    (reference selects by name via find_network_using_name,
    ``models/__init__.py:26-39``; only nlayerdiscriminator ships)."""
    name = getattr(opt, "dis_network", "nlayerdiscriminator")
    if name != "nlayerdiscriminator":
        raise KeyError(f"unknown dis_network '{name}' "
                       "(available: nlayerdiscriminator)")
    return NLayerDiscriminator(ndf=getattr(opt, "ndf_dis", 64),
                               patch_len=opt.patch_len)


class NLayerDiscriminator(nn.Module):
    """Spectral-norm patch discriminator for 32/64 inputs (reference
    :588-692). Call with mutable=['batch_stats'] is not needed —
    InstanceNorm has no running stats; SpectralNorm power iterations are
    carried in the 'batch_stats' collection by flax."""

    ndf: int = 64          # --ndf_dis
    patch_len: int = 64    # --patch_len
    input_nc: int = 3

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        assert self.patch_len in (32, 64)
        sn = lambda m: nn.SpectralNorm(m)  # noqa: E731
        conv = lambda f, name: nn.Conv(  # noqa: E731
            f, (4, 4), strides=(2, 2), padding=1, use_bias=False,
            kernel_init=xavier, name=name)
        inorm = lambda x: nn.GroupNorm(  # noqa: E731
            num_groups=x.shape[-1], use_bias=False, use_scale=False)(x)

        h = x
        if self.patch_len == 64:
            h = sn(conv(self.ndf, "c0"))(h, update_stats=update_stats)
            h = nn.leaky_relu(h, 0.2)
        h = sn(conv(self.ndf * 2, "c1"))(h, update_stats=update_stats)
        h = nn.leaky_relu(inorm(h), 0.2)
        h = sn(conv(self.ndf * 4, "c2"))(h, update_stats=update_stats)
        h = nn.leaky_relu(inorm(h), 0.2)
        h = sn(conv(self.ndf * 8, "c3"))(h, update_stats=update_stats)
        h = nn.leaky_relu(inorm(h), 0.2)
        h = nn.SpectralNorm(nn.Conv(1, (4, 4), strides=(1, 1),
                                    padding=0, use_bias=False,
                                    kernel_init=xavier, name="c4"))(
            h, update_stats=update_stats)
        return h
