"""Reference-checkpoint conversion: a torch VanillaMLP state_dict
(``{epoch}_net_{Coarse,Fine}.pth``, reference models/base_model.py:
181-196) converted by tools/convert_reference_ckpt.py must make our
flax MLP compute EXACTLY the reference forward (verified against an
independent numpy transcription of the torch math,
models/networks.py:183-226)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_reference_ckpt import torch_mlp_state_to_flax

D, W, C_POS, C_DIR = 4, 32, 15, 9  # deg_pos=2, deg_dir=1 posenc sizes
SKIP = 2


def _rand_torch_state(seed=0, prefix=""):
    """Random reference-shaped state_dict (torch Linear: (out, in))."""
    rng = np.random.RandomState(seed)
    sd = {}

    def lin(name, n_in, n_out):
        sd[prefix + name + ".weight"] = rng.randn(
            n_out, n_in).astype(np.float32) * 0.2
        sd[prefix + name + ".bias"] = rng.randn(
            n_out).astype(np.float32) * 0.1

    for i in range(D):
        n_in = C_POS if i == 0 else (W + C_POS if i == SKIP else W)
        lin(f"xyz_encoding_{i + 1}.0", n_in, W)
    lin("xyz_encoding_final", W, W)
    lin("sigma", W, 1)
    lin("dir_encoding.0", W + C_DIR, W // 2)
    lin("rgb.0", W // 2, 3)
    return sd


def _np_reference_forward(sd, xyz, drc, prefix=""):
    """Numpy transcription of the reference VanillaMLP.forward
    (models/networks.py:183-226): skip cat is [input_xyz, hidden]."""
    def lin(name, x):
        w = sd[prefix + name + ".weight"]
        b = sd[prefix + name + ".bias"]
        return x @ w.T + b

    h = xyz
    for i in range(D):
        if i == SKIP:
            h = np.concatenate([xyz, h], -1)
        h = np.maximum(lin(f"xyz_encoding_{i + 1}.0", h), 0.0)
    sigma = lin("sigma", h)[..., 0]
    feat = lin("xyz_encoding_final", h)
    g = np.maximum(lin("dir_encoding.0",
                       np.concatenate([feat, drc], -1)), 0.0)
    rgb = 1.0 / (1.0 + np.exp(-lin("rgb.0", g)))
    return rgb, sigma


class TestTorchStateConversion:
    @pytest.mark.parametrize("prefix", ["", "module."])
    def test_flax_forward_matches_torch_math(self, prefix):
        from nerfsr_tpu.models.mlp import VanillaMLP

        sd = _rand_torch_state(seed=1, prefix=prefix)
        variables = torch_mlp_state_to_flax(sd, depth=D)
        mlp = VanillaMLP(depth=D, width=W, skips=(SKIP,))
        rng = np.random.RandomState(2)
        xyz = rng.randn(6, 5, C_POS).astype(np.float32)
        drc = rng.randn(6, 5, C_DIR).astype(np.float32)
        rgb, sigma = mlp.apply(variables, jnp.asarray(xyz),
                               jnp.asarray(drc))
        rgb_ref, sigma_ref = _np_reference_forward(sd, xyz, drc, prefix)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sigma), sigma_ref,
                                   rtol=1e-5, atol=1e-5)

    def test_cli_roundtrip_through_checkpoint(self, tmp_path):
        """Full tool flow: .pth files -> converted msgpack -> loadable
        state whose render matches the converted params."""
        import torch

        from nerfsr_tpu.config import default_options
        from nerfsr_tpu.models import create_model
        from nerfsr_tpu.utils import checkpoint as ckpt
        from tools import convert_reference_ckpt as tool

        ref_dir = tmp_path / "ref"
        ref_dir.mkdir()
        for net, seed in (("Coarse", 3), ("Fine", 4)):
            torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                        _rand_torch_state(seed=seed).items()},
                       ref_dir / f"30_net_{net}.pth")

        argv = sys.argv
        sys.argv = ["prog", str(ref_dir), "30", str(tmp_path / "out"),
                    "conv", "--D", str(D), "--W", str(W),
                    "--deg_pos", "2", "--deg_dir", "1"]
        try:
            tool.main()
        finally:
            sys.argv = argv

        opt = default_options(
            "train", name="conv", model="nerf", dataset_mode="llff",
            D=D, W=W, deg_pos=2, deg_dir=1,
            checkpoints_dir=str(tmp_path / "out"))
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=1)
        state = ckpt.load_checkpoint(opt, state, epoch=30)
        # loaded params reproduce the torch math
        sd = _rand_torch_state(seed=3)
        rng = np.random.RandomState(5)
        xyz = rng.randn(4, C_POS).astype(np.float32)
        drc = rng.randn(4, C_DIR).astype(np.float32)
        from nerfsr_tpu.models.mlp import VanillaMLP
        mlp = VanillaMLP(depth=D, width=W, skips=(SKIP,))
        rgb, _ = mlp.apply(state.params["coarse"], jnp.asarray(xyz),
                           jnp.asarray(drc))
        rgb_ref, _ = _np_reference_forward(sd, xyz, drc)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-5,
                                   atol=1e-6)
