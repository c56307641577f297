"""System-level tests: jitted train step, loss descent, eval renderer,
and multi-device (8 virtual CPU chips) sharded training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfsr_tpu.config import default_options
from nerfsr_tpu.models import create_model
from nerfsr_tpu.parallel.mesh import make_mesh


def tiny_opt(**kw):
    base = dict(
        model="nerf", dataset_mode="blender", batch_size=32,
        N_coarse=8, N_importance=8, D=2, W=32, deg_pos=4, deg_dir=2,
        precision="f32", n_epochs=2, n_epochs_decay=1,
        white_bkgd=True, noise_std=0.0,
    )
    base.update(kw)
    return default_options("train", **base)


def random_ray_batch(rng, n, target_color=None):
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgbs = (np.broadcast_to(target_color, (n, 3)).astype(np.float32)
            if target_color is not None
            else rng.rand(n, 3).astype(np.float32))
    return {
        "origins": rng.randn(n, 3).astype(np.float32) * 0.1,
        "directions": d,
        "viewdirs": d,
        "near": np.full((n, 1), 2.0, np.float32),
        "far": np.full((n, 1), 6.0, np.float32),
        "rgbs": rgbs.copy(),
    }


class TestNeRFSystem:
    def test_train_step_descends(self):
        opt = tiny_opt()
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=100)
        rng = np.random.RandomState(0)
        batch = random_ray_batch(rng, opt.batch_size,
                                 target_color=np.array([0.2, 0.5, 0.8]))
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(30):
            state, losses = sys_.train_step(state, batch, key)
            if first is None:
                first = float(losses["tot"])
        last = float(losses["tot"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first * 0.5, (first, last)
        # parity loss names (models/nerf_model.py:98)
        for name in ["coarse_mse", "fine_mse", "coarse_psnr", "fine_psnr",
                     "tot"]:
            assert name in losses

    def test_train_step_from_buffer(self):
        opt = tiny_opt(batch_size=16)
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        rng = np.random.RandomState(1)
        buffer = jax.tree_util.tree_map(
            jnp.asarray, random_ray_batch(rng, 128))
        key = jax.random.PRNGKey(2)
        for _ in range(3):
            state, losses = sys_.train_step_from_buffer(state, buffer, key)
        assert int(state.step) == 3
        assert np.isfinite(float(losses["tot"]))

    def test_eval_render_image_shapes(self):
        opt = tiny_opt()
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        rng = np.random.RandomState(2)
        rays = random_ray_batch(rng, 100)
        out = sys_.render_image(state.params, rays, chunk=64)
        assert out["fine_rgb"].shape == (100, 3)
        assert out["coarse_depth"].shape == (100,)
        # deterministic eval: rendering twice must agree exactly
        out2 = sys_.render_image(state.params, rays, chunk=64)
        np.testing.assert_array_equal(out["fine_rgb"], out2["fine_rgb"])

    def test_no_importance_coarse_only(self):
        opt = tiny_opt(N_importance=0)
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        batch = jax.tree_util.tree_map(
            jnp.asarray, random_ray_batch(np.random.RandomState(3), 16))
        state, losses = sys_.train_step(state, batch, jax.random.PRNGKey(0))
        assert float(losses["fine_mse"]) == 0.0
        assert "fine" not in state.params


@pytest.fixture
def no_persistent_cache():
    """Quarantine from the persistent XLA compile cache: jax 0.9.0's
    CPU backend SEGFAULTS serializing this file's 8-device train_step
    executable when its compile crosses the 1s persist threshold (and
    then segfaults again deserializing the torn entry a crashed writer
    leaves behind). Only reproduces under full-suite process state —
    solo runs compile <1s and skip caching. Disabling the cache for
    these tests sidesteps both directions; every other sharded program
    in the suite serializes fine."""
    import jax
    from jax._src import compilation_cache as cc

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    cc.reset_cache()  # cache use is memoized; force re-check (disabled)
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    cc.reset_cache()  # re-enable for subsequent tests


class TestMeshTraining:
    def test_sharded_train_step_matches_names(self, no_persistent_cache):
        assert jax.device_count() >= 8, "conftest should force 8 cpu devices"
        opt = tiny_opt(batch_size=64)
        mesh = make_mesh(8)
        sys_ = create_model(opt).use_mesh(mesh)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        rng = np.random.RandomState(4)
        batch = random_ray_batch(rng, 64)
        from nerfsr_tpu.parallel.mesh import batch_sharding
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding(mesh)),
            batch)
        state, losses = sys_.train_step(state, sharded, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["tot"]))
        # params must remain replicated (grads all-reduced by XLA)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestTemplateSystem:
    def test_overfits_x_squared(self):
        opt = default_options(
            "train", model="template", dataset_mode="template",
            batch_size=256, n_epochs=2, n_epochs_decay=1, lr=1e-2,
            lr_final=1e-3)
        sys_ = create_model(opt)
        state = sys_.create_state(jax.random.PRNGKey(0), steps_per_epoch=50)
        from nerfsr_tpu.data import create_dataset
        ds = create_dataset(opt, "train")
        buffer = jax.tree_util.tree_map(jnp.asarray, ds.ray_buffer())
        key = jax.random.PRNGKey(0)
        for _ in range(300):
            state, losses = sys_.train_step_from_buffer(state, buffer, key)
        assert float(losses["mse"]) < 0.05


class TestDataParallelEquivalence:
    def test_sharded_step_matches_single_device(self,
                                                no_persistent_cache):
        """DP correctness: the same batch through the 8-device sharded
        step and the unsharded step must produce (numerically) the same
        updated parameters — XLA's inserted collectives implement exact
        gradient averaging."""
        opt = tiny_opt(batch_size=64)
        batch = random_ray_batch(np.random.RandomState(7), 64)
        batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
        key = jax.random.PRNGKey(3)

        sys_single = create_model(opt)
        s1 = sys_single.create_state(jax.random.PRNGKey(0),
                                     steps_per_epoch=10)
        s1, l1 = sys_single.train_step(s1, batch_j, key)

        mesh = make_mesh(8)
        sys_mesh = create_model(opt).use_mesh(mesh)
        s2 = sys_mesh.create_state(jax.random.PRNGKey(0),
                                   steps_per_epoch=10)
        from nerfsr_tpu.parallel.mesh import batch_sharding
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding(mesh)),
            batch)
        s2, l2 = sys_mesh.train_step(s2, sharded, key)

        np.testing.assert_allclose(float(l1["tot"]), float(l2["tot"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestShardMapStep:
    def test_shard_map_matches_single_device(self):
        """The explicit shard_map+pmean step must reproduce the
        single-device update (grads averaged over equal shards == global
        batch mean). randomized=False: per-shard PRNG streams differ
        from the global stream by construction, so exact equivalence
        requires deterministic sampling."""
        opt = tiny_opt(batch_size=64, randomized=False)
        batch = random_ray_batch(np.random.RandomState(11), 64)
        batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
        key = jax.random.PRNGKey(5)

        sys_a = create_model(opt)
        s1 = sys_a.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        s1, l1 = sys_a.train_step(s1, batch_j, key)

        mesh = make_mesh(8)
        sys_b = create_model(opt)
        s2 = sys_b.create_state(jax.random.PRNGKey(0), steps_per_epoch=10)
        step = sys_b.make_shard_map_step(mesh)
        from nerfsr_tpu.parallel.mesh import batch_sharding, replicate
        s2 = replicate(s2, mesh)
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding(mesh)),
            batch)
        s2, l2 = step(s2, sharded, key)

        np.testing.assert_allclose(float(l1["tot"]), float(l2["tot"]),
                                   rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            # adam's grad/sqrt(v) amplifies float reassociation between
            # the per-shard pmean and the global mean; jax.shard_map's
            # reduction order shifts it slightly vs the old experimental
            # API (max observed 1.5e-3).
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=4e-3, atol=1e-5)
