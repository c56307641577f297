"""--fast_sampling (proposal-MLP importance sampling) tests: output
structure, interlevel-loss semantics, optimization descent, and
end-to-end engine training. The parity coarse+fine path must be
untouched when the flag is off (covered by the rest of the suite)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.models import create_model
from nerfsr_tpu.models.criterions import interlevel_loss


def _ray_batch(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "origins": jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1),
        "directions": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "near": jnp.zeros((n, 1), jnp.float32),
        "far": jnp.ones((n, 1), jnp.float32),
        "rgbs": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }


def _fast_opt(**kw):
    base = dict(model="nerf", dataset_mode="llff", batch_size=32,
                fast_sampling=True, n_prop=16, N_importance=8,
                prop_D=2, prop_W=16, D=2, W=32, precision="f32",
                white_bkgd=False, noise_std=0.0, n_epochs=2,
                n_epochs_decay=1)
    base.update(kw)
    return default_options("train", **base)


class TestFastRender:
    def test_output_structure(self):
        opt = _fast_opt()
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        assert set(params.keys()) == {"prop", "fine"}
        batch = _ray_batch(8)
        out = system.render(params, system._batch_to_rays(batch),
                            jax.random.PRNGKey(1), randomized=True)
        assert "coarse_rgb" not in out
        assert out["fine_rgb"].shape == (8, 3)
        assert out["fine_z"].shape == (8, opt.N_importance)
        assert out["prop_weights"].shape == (8, opt.n_prop)
        # fine depths must be sorted and inside [near, far]
        z = np.asarray(out["fine_z"])
        assert np.all(np.diff(z, axis=-1) >= 0)
        assert z.min() >= 0.0 and z.max() <= 1.0

    def test_deg_prop_controls_prop_posenc(self):
        """--deg_prop sets the proposal MLP's positional-encoding degree
        independently of the big MLP's deg_pos: the prop net's first
        dense layer consumes posenc_channels(3, deg_prop) features, and
        rendering stays well-formed at a reduced degree."""
        from nerfsr_tpu.core.encoding import posenc_channels

        for deg in (6, 2):
            opt = _fast_opt(deg_prop=deg)
            system = create_model(opt)
            assert system.render_cfg.deg_prop == deg
            params = system.init_params(jax.random.PRNGKey(0))
            first = params["prop"]["params"]["layer_0"]["kernel"]
            assert first.shape[0] == posenc_channels(3, deg)
            out = system.render(params, system._batch_to_rays(_ray_batch(8)),
                                jax.random.PRNGKey(1), randomized=True)
            z = np.asarray(out["fine_z"])
            assert z.shape == (8, opt.N_importance)
            assert np.all(np.isfinite(np.asarray(out["fine_rgb"])))

    def test_uniform_mix_branch(self):
        """--fast_uniform_frac > 0 mixes stratified uniforms into the
        CDF samples (extra merge sort path); depths stay sorted and
        in-bounds, and the count is still N_importance."""
        opt = _fast_opt(fast_uniform_frac=0.5)
        system = create_model(opt)
        assert system.render_cfg.uniform_frac == 0.5
        params = system.init_params(jax.random.PRNGKey(0))
        batch = _ray_batch(8)
        out = system.render(params, system._batch_to_rays(batch),
                            jax.random.PRNGKey(1), randomized=True)
        z = np.asarray(out["fine_z"])
        assert z.shape == (8, opt.N_importance)
        assert np.all(np.diff(z, axis=-1) >= 0)
        assert z.min() >= 0.0 and z.max() <= 1.0

    def test_render_image_and_metrics(self):
        opt = _fast_opt(img_wh=(8, 8), ray_chunk=32)
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        rays = {k: np.asarray(v) for k, v in _ray_batch(64).items()}
        out = system.render_image(params, rays)
        assert out["fine_rgb"].shape == (64, 3)
        assert "coarse_rgb" not in out
        m = system.eval_metrics(out, {"rgbs": rays["rgbs"]})
        assert np.isfinite(m["fine_psnr"]) and np.isfinite(m["fine_ssim"])


class TestInterlevelLoss:
    def test_covering_proposal_is_zero(self):
        """A proposal that upper-bounds the fine histogram everywhere
        incurs no loss."""
        z = jnp.linspace(0, 1, 9)[None].repeat(2, 0)          # (2, 9)
        w_fine = jnp.full((2, 9), 0.1)
        w_prop = jnp.full((2, 9), 0.5)                         # generous
        val = float(interlevel_loss(z, w_fine, z, w_prop))
        assert val == 0.0

    def test_undercovering_proposal_penalized(self):
        z = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w_fine = jnp.full((2, 9), 0.1)
        w_prop = jnp.zeros((2, 9))
        assert float(interlevel_loss(z, w_fine, z, w_prop)) > 0

    def test_grad_hits_proposal_not_fine(self):
        z = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
        w_fine = jnp.full((2, 9), 0.1)
        w_prop = jnp.full((2, 9), 0.01)
        g_prop = jax.grad(
            lambda w: interlevel_loss(z, w_fine, z, w))(w_prop)
        g_fine = jax.grad(
            lambda w: interlevel_loss(z, w, z, w_prop))(w_fine)
        assert float(jnp.abs(g_prop).max()) > 0
        assert float(jnp.abs(g_fine).max()) == 0.0  # stop_gradient


class TestFastTraining:
    def test_loss_descends_and_interlevel_logged(self):
        opt = _fast_opt()
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        buffer = _ray_batch(256)
        key = jax.random.PRNGKey(1)
        tots, ils = [], []
        for _ in range(40):
            state, losses = system.train_step_from_buffer(state, buffer,
                                                          key)
            tots.append(float(losses["tot"]))
            ils.append(float(losses["interlevel"]))
        assert all(np.isfinite(t) for t in tots)
        assert np.mean(tots[-5:]) < np.mean(tots[:5])
        assert np.mean(ils[-5:]) < np.mean(ils[:5])

    def test_downx_fast_step(self):
        opt = _fast_opt(model="nerf_downX", dataset_mode="llff_downX",
                        batch_size=16, downscale=2, use_var_loss=True)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=10)
        rng = np.random.RandomState(0)
        n_lr, ds2 = 64, 4
        d = rng.randn(n_lr, ds2, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        buffer = {
            "origins": jnp.asarray(
                rng.randn(n_lr, ds2, 3).astype(np.float32) * 0.1),
            "directions": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
            "near": jnp.zeros((n_lr, ds2, 1), jnp.float32),
            "far": jnp.ones((n_lr, ds2, 1), jnp.float32),
            "rgbs": jnp.asarray(rng.rand(n_lr, 3).astype(np.float32)),
        }
        state, losses = system.train_step_from_buffer(
            state, buffer, jax.random.PRNGKey(1))
        assert "interlevel" in losses and "coarse_mse" not in losses
        assert np.isfinite(float(losses["tot"]))

    def test_engine_e2e_psnr_rises(self, tmp_path):
        from tools.make_synthetic_scene import make_scene
        from nerfsr_tpu.engine import train

        scene = str(tmp_path / "scene")
        make_scene(scene, hw=(16, 16), n_train=2, n_val=1, n_test=1)
        opt = default_options(
            "train", model="nerf", dataset_mode="blender",
            dataset_root=scene, img_wh=(16, 16), batch_size=64,
            fast_sampling=True, n_prop=16, N_importance=16,
            prop_D=2, prop_W=32, D=2, W=32, precision="f32",
            n_epochs=2, n_epochs_decay=1, steps_per_epoch=40,
            print_freq=40, save_epoch_freq=2, val_epoch_freq=2,
            vis_epoch_freq=0, val_freq=0,
            checkpoints_dir=str(tmp_path / "ck"),
            summary_dir=str(tmp_path / "runs"), name="fast")
        state = train(opt)
        # checkpoint round-trips with the prop+fine param structure
        from nerfsr_tpu.utils import checkpoint as ckpt
        system = create_model(opt)
        fresh = system.create_state(jax.random.PRNGKey(7),
                                    steps_per_epoch=40)
        restored = ckpt.load_checkpoint(opt, fresh, epoch=2)
        assert int(restored.step) == int(state.step) == 80


class TestFastDownXEval:
    def test_downx_eval_metrics_and_visuals(self):
        """downX eval paths tolerate the missing coarse level in fast
        mode (regression: KeyError 'coarse_rgb' at val_iter)."""
        opt = _fast_opt(model="nerf_downX", dataset_mode="llff_downX",
                        batch_size=8, downscale=2, img_wh=(8, 8),
                        ray_chunk=64)
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        n_lr, ds2 = 16, 4  # 8x8 HR image = 16 LR px * 4 sub-rays
        d = rng.randn(n_lr, ds2, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        sample = {
            "origins": rng.randn(n_lr, ds2, 3).astype(np.float32) * 0.1,
            "directions": d,
            "viewdirs": d,
            "near": np.zeros((n_lr, ds2, 1), np.float32),
            "far": np.ones((n_lr, ds2, 1), np.float32),
            "rgbs": rng.rand(n_lr, 3).astype(np.float32),
            "rgbs_ori": rng.rand(n_lr, ds2, 3).astype(np.float32),
        }
        out = system.render_image(params, sample)
        assert "fine_rgb" in out and "fine_rgb_ori" in out
        assert "coarse_rgb" not in out
        m = system.eval_metrics(out, sample)
        assert np.isfinite(m["fine_psnr"])
        assert np.isfinite(m["fine_psnr_ori"])
        vis = system.eval_visuals(out, sample, 0, with_gt=True,
                                  depth_bounds=(0.0, 1.0))
        names = {v.name for v in vis}
        assert "0-fine-ori" in names and "0-fine-depth-ori" in names


class TestTwoLevelProposals:
    """--n_prop_levels 2: a second proposal round resampled from the
    first (mip-NeRF 360 §3 runs its proposal stage twice); the shared
    prop MLP is evaluated at both rounds and every round gets its own
    interlevel term."""

    def test_output_structure_and_bounds(self):
        opt = _fast_opt(n_prop_levels=2, n_prop2=8)
        system = create_model(opt)
        assert system.render_cfg.n_prop_levels == 2
        params = system.init_params(jax.random.PRNGKey(0))
        assert set(params.keys()) == {"prop", "fine"}  # shared prop MLP
        batch = _ray_batch(8)
        out = system.render(params, system._batch_to_rays(batch),
                            jax.random.PRNGKey(1), randomized=True)
        # final (= level 2) histogram has n_prop2 bins; round 0 kept
        assert out["prop_weights"].shape == (8, opt.n_prop2)
        assert out["prop0_weights"].shape == (8, opt.n_prop)
        for k in ("prop_z", "prop0_z", "fine_z"):
            z = np.asarray(out[k])
            assert np.all(np.diff(z, axis=-1) >= 0), k
            assert z.min() >= 0.0 and z.max() <= 1.0, k
        assert out["fine_rgb"].shape == (8, 3)

    def test_single_level_unchanged(self):
        """Default n_prop_levels=1 must be bit-identical to the code
        before the multi-round refactor (no prop0_* keys, same z)."""
        opt = _fast_opt()
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        batch = _ray_batch(8)
        out = system.render(params, system._batch_to_rays(batch),
                            jax.random.PRNGKey(1), randomized=True)
        assert "prop0_z" not in out
        assert out["prop_weights"].shape == (8, opt.n_prop)

    def test_loss_descends_both_interlevels(self):
        opt = _fast_opt(n_prop_levels=2, n_prop2=8)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=50)
        buffer = _ray_batch(256)
        key = jax.random.PRNGKey(1)
        tots, ils = [], []
        for _ in range(40):
            state, losses = system.train_step_from_buffer(state, buffer,
                                                          key)
            tots.append(float(losses["tot"]))
            ils.append(float(losses["interlevel"]))
        assert all(np.isfinite(t) for t in tots)
        assert np.mean(tots[-5:]) < np.mean(tots[:5])
        assert np.mean(ils[-5:]) < np.mean(ils[:5])

    def test_prop_pad_wired_and_lv1_invariant(self):
        """--prop_pad (uniform histogram floor before each multi-round
        CDF inversion) must (a) change the lv2 sample placement — it is
        the anti-death-spiral exploration mass — and (b) leave the
        single-round path bit-identical, since unpadded single-round
        sampling never spirals (the fine level still covers the whole
        proposal histogram support)."""
        batch = _ray_batch(8)
        key = jax.random.PRNGKey(1)

        def fine_z(**kw):
            opt = _fast_opt(**kw)
            system = create_model(opt)
            params = system.init_params(jax.random.PRNGKey(0))
            out = system.render(params, system._batch_to_rays(batch),
                                key, randomized=True)
            return np.asarray(out["fine_z"])

        z_pad = fine_z(n_prop_levels=2, n_prop2=8)          # default 0.01
        z_nopad = fine_z(n_prop_levels=2, n_prop2=8, prop_pad=0.0)
        assert not np.allclose(z_pad, z_nopad)
        # a huge pad swamps the learned histogram -> near-uniform
        # coverage of [near, far] even at init
        z_big = fine_z(n_prop_levels=2, n_prop2=8, prop_pad=1e6)
        assert z_big.max() > 0.8 and z_big.min() < 0.2
        # single-round path ignores prop_pad entirely
        z1 = fine_z(prop_pad=0.0)
        z2 = fine_z(prop_pad=123.0)
        np.testing.assert_array_equal(z1, z2)

    def test_eval_render_path(self):
        opt = _fast_opt(n_prop_levels=2, n_prop2=8, img_wh=(8, 8),
                        ray_chunk=32)
        system = create_model(opt)
        params = system.init_params(jax.random.PRNGKey(0))
        rays = {k: np.asarray(v) for k, v in _ray_batch(64).items()}
        out = system.render_image(params, rays)
        assert out["fine_rgb"].shape == (64, 3)
        m = system.eval_metrics(out, {"rgbs": rays["rgbs"]})
        assert np.isfinite(m["fine_psnr"]) and np.isfinite(m["fine_ssim"])


class TestPropPadAnneal:
    """--prop_pad_anneal: the resample padding decays linearly
    prop_pad -> prop_pad_final over N steps; eval (step=None) uses the
    fully annealed value."""

    def test_endpoints_match_static_pads(self):
        batch = _ray_batch(8, seed=3)
        key = jax.random.PRNGKey(2)

        def fine_z(step=None, **kw):
            opt = _fast_opt(n_prop_levels=2, n_prop2=8, **kw)
            system = create_model(opt)
            params = system.init_params(jax.random.PRNGKey(0))
            out = system.render(params, system._batch_to_rays(batch),
                                key, randomized=True, step=step)
            return np.asarray(out["fine_z"])

        anneal = dict(prop_pad=0.05, prop_pad_final=0.002,
                      prop_pad_anneal=100)
        # step 0 == static pad at the start value
        np.testing.assert_allclose(
            fine_z(step=jnp.zeros((), jnp.int32), **anneal),
            fine_z(prop_pad=0.05), rtol=1e-6)
        # step >= anneal == static pad at the final value
        np.testing.assert_allclose(
            fine_z(step=jnp.asarray(100, jnp.int32), **anneal),
            fine_z(prop_pad=0.002), rtol=1e-6)
        # eval (step=None) uses the fully annealed value too
        np.testing.assert_allclose(
            fine_z(step=None, **anneal),
            fine_z(prop_pad=0.002), rtol=1e-6)
        # midpoint sits strictly between the endpoints
        z_mid = fine_z(step=jnp.asarray(50, jnp.int32), **anneal)
        assert not np.allclose(z_mid, fine_z(prop_pad=0.05))
        assert not np.allclose(z_mid, fine_z(prop_pad=0.002))

    def test_anneal_frac_resolves_at_create_state(self):
        """--prop_pad_anneal_frac resolves to steps once the dataset
        size (steps/epoch) is known; an explicit --prop_pad_anneal
        wins."""
        opt = _fast_opt(prop_pad_anneal_frac=0.5, n_prop_levels=2,
                        n_prop2=8)
        system = create_model(opt)
        assert system.render_cfg.prop_pad_anneal == 0
        system.create_state(jax.random.PRNGKey(0), steps_per_epoch=100)
        # n_epochs x spe x frac (the lr-decay tail epochs train no
        # steps — engine.py trains range(1, n_epochs+1))
        assert system.render_cfg.prop_pad_anneal == \
            int(0.5 * 100 * opt.n_epochs)
        # explicit steps win over the fraction
        opt2 = _fast_opt(prop_pad_anneal=77, prop_pad_anneal_frac=0.5,
                         n_prop_levels=2, n_prop2=8)
        system2 = create_model(opt2)
        system2.create_state(jax.random.PRNGKey(0), steps_per_epoch=100)
        assert system2.render_cfg.prop_pad_anneal == 77

    def test_train_step_threads_state_step(self):
        """A scanned train step with annealing enabled runs and the
        descent still happens (step flows state.step -> _loss_fn ->
        render)."""
        opt = _fast_opt(prop_pad_anneal=50, prop_pad=0.05,
                        prop_pad_final=0.0, n_prop_levels=2, n_prop2=8)
        system = create_model(opt)
        state = system.create_state(jax.random.PRNGKey(0),
                                    steps_per_epoch=60)
        buf = _ray_batch(64)
        key = jax.random.PRNGKey(1)
        state, l0 = system.train_steps_scan(state, buf, 2, key)
        state, l1 = system.train_steps_scan(state, buf, 100, key)
        assert int(state.step) == 102
        assert float(l1["tot"]) < float(l0["tot"])
