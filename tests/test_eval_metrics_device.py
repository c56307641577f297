"""Device-side eval metrics (``eval_metrics_fast``) must agree with the
readback path (``render_eval`` + ``eval_metrics``) on every system
family: the validate loops use it to replace the per-image full-image
readback (98 ms of the 165 ms per 504x378 image through the tunneled
v5e — tools/probe_eval_render.py) with a scalar-only readback."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import default_options
from nerfsr_tpu.data import create_dataset
from nerfsr_tpu.models import create_model


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    from tools.make_synthetic_llff import make_llff_scene
    d = tmp_path_factory.mktemp("llff_emd")
    make_llff_scene(str(d), hw=(24, 24), n_imgs=4)
    return str(d)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from tools.make_synthetic_scene import make_scene
    d = tmp_path_factory.mktemp("bl_emd")
    make_scene(str(d), hw=(16, 16), n_train=2, n_val=2, n_test=2)
    return str(d)


_TINY = dict(N_coarse=4, N_importance=4, D=2, W=16, deg_pos=2,
             deg_dir=1, precision="f32", white_bkgd=False, noise_std=0.0)


def _assert_metrics_match(system, dataset, idx=0):
    params = system.init_params(jax.random.PRNGKey(0))
    fast = system.eval_metrics_fast(params, dataset, idx)
    assert fast is not None
    sample = dataset.image_rays(idx)
    out = system.render_eval(params, dataset, idx, sample)
    want = system.eval_metrics(out, sample)
    assert set(fast) == set(want)
    for k in want:
        np.testing.assert_allclose(fast[k], want[k], rtol=2e-4,
                                   atol=2e-4, err_msg=k)
    # second call reuses the cached gt upload and still agrees
    again = system.eval_metrics_fast(params, dataset, idx)
    for k in want:
        np.testing.assert_allclose(again[k], fast[k], rtol=0, atol=0,
                                   err_msg=k)


def test_nerf_blender(blender_scene):
    opt = default_options(
        "train", model="nerf", dataset_mode="blender",
        dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
        **_TINY)
    _assert_metrics_match(create_model(opt), create_dataset(opt, "val"))


def test_nerf_llff_ndc(llff_scene):
    opt = default_options(
        "train", model="nerf", dataset_mode="llff",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=32,
        **_TINY)
    _assert_metrics_match(create_model(opt), create_dataset(opt, "val"))


def test_downx_grouped(llff_scene):
    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
        downscale=2, **_TINY)
    _assert_metrics_match(create_model(opt), create_dataset(opt, "val"))


def test_downx_fast_sampling(llff_scene):
    # --fast_sampling: no coarse level; two-round slim proposal
    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
        downscale=2, fast_sampling=True, n_prop=4, n_prop_levels=2,
        n_prop2=4, prop_W=8, prop_D=2, **_TINY)
    _assert_metrics_match(create_model(opt), create_dataset(opt, "val"))


def test_downx4_grouped(llff_scene):
    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=8,
        downscale=4, **_TINY)
    _assert_metrics_match(create_model(opt), create_dataset(opt, "val"))


def test_render_eval_many_order(llff_scene):
    """The pipelined generator must yield exactly render_eval's output
    for each view, in order (a misaligned pending/yield pairing would
    silently attach view i's image to view i+1's pose)."""
    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
        downscale=2, **_TINY)
    system = create_model(opt)
    ds = create_dataset(opt, "val")
    n = min(3, len(ds))
    params = system.init_params(jax.random.PRNGKey(0))
    many = list(system.render_eval_many(params, ds, range(n)))
    assert len(many) == n
    for i in range(n):
        want = system.render_eval(params, ds, i)
        assert set(many[i]) == set(want)
        for k in want:
            np.testing.assert_allclose(many[i][k], want[k], rtol=1e-5,
                                       atol=1e-6, err_msg=f"view {i} {k}")


def test_quantized_readback_artifacts(llff_scene):
    """The uint8 eval readback (quantize_rgb=True) feeds the
    ``{i}-fine-ori.png`` artifacts the refinement stage consumes: the
    HR ``_ori`` strips must be BYTE-identical to the f32 path's saved
    bytes, and the downX LR preview strips within 1 LSB (the documented
    mean-of-quantized-subpixels deviation, _post_grouped)."""
    from nerfsr_tpu.utils.visualizer import _to_uint8

    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
        downscale=2, **_TINY)
    system = create_model(opt)
    ds = create_dataset(opt, "val")
    params = system.init_params(jax.random.PRNGKey(0))
    sample = ds.image_rays(0)

    out32 = system.render_eval(params, ds, 0)
    outq = next(iter(system.render_eval_many(params, ds, [0],
                                             quantize_rgb=True)))
    # depth must NOT be quantized (warp/refine consume real values)
    for k in outq:
        if "depth" in k:
            assert outq[k].dtype == np.float32, k
            np.testing.assert_allclose(outq[k], out32[k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)
    # _ori rgb comes back uint8 and matches the f32 path's quantization
    assert outq["fine_rgb_ori"].dtype == np.uint8
    np.testing.assert_array_equal(
        outq["fine_rgb_ori"], _to_uint8(out32["fine_rgb_ori"]))
    # uint8 passthrough: _to_uint8 of an already-quantized array is id
    np.testing.assert_array_equal(
        _to_uint8(outq["fine_rgb_ori"]), outq["fine_rgb_ori"])

    vis32 = {v.name: v for v in system.eval_visuals(
        out32, sample, 0, with_gt=True, depth_bounds=ds.depth_bounds)}
    visq = {v.name: v for v in system.eval_visuals(
        outq, sample, 0, with_gt=True, depth_bounds=ds.depth_bounds)}
    assert set(vis32) == set(visq)
    for name in vis32:
        v32, vq = vis32[name], visq[name]
        if v32.kind != "image":
            np.testing.assert_allclose(np.asarray(vq.data),
                                       np.asarray(v32.data), rtol=1e-5,
                                       atol=1e-6, err_msg=name)
            continue
        b32 = _to_uint8(np.asarray(v32.data), v32.range)
        bq = _to_uint8(np.asarray(vq.data), vq.range)
        if name.endswith("-ori"):
            # the refine-stage inputs: byte-identical
            np.testing.assert_array_equal(bq, b32, err_msg=name)
        else:
            # LR preview strip: <=1 LSB from the quantized-subpixel mean
            diff = np.abs(bq.astype(np.int16) - b32.astype(np.int16))
            assert diff.max() <= 1, (name, diff.max())


def test_validate_never_quantizes_metric_renders(llff_scene, monkeypatch):
    """engine.validate must only request quantized readback when every
    metric already came from the device path — a render that feeds
    eval_metrics must stay f32."""
    from nerfsr_tpu import engine

    opt = default_options(
        "train", model="nerf_downX", dataset_mode="llff_downX",
        dataset_root=llff_scene, img_wh=(24, 24), batch_size=16,
        downscale=2, **_TINY)
    system = create_model(opt)
    ds = create_dataset(opt, "val")
    params = system.init_params(jax.random.PRNGKey(0))
    seen = []
    orig_many = type(system).render_eval_many

    def spy_many(self, *a, **kw):
        seen.append(bool(kw.get("quantize_rgb", False)))
        return orig_many(self, *a, **kw)

    monkeypatch.setattr(type(system), "render_eval_many", spy_many)
    # device metrics available -> artifact render may quantize
    engine.validate(opt, system, params, ds,
                    out_dir=None)
    assert not seen  # metric-only validate never renders images
    engine.validate(opt, system, params, ds,
                    out_dir=str(__import__("tempfile").mkdtemp()))
    assert seen == [True]
    # device metric path unavailable -> the render feeds eval_metrics
    # and must NOT be quantized
    seen.clear()
    monkeypatch.setattr(type(system), "eval_metrics_fast",
                        lambda self, *a, **k: None)
    engine.validate(opt, system, params, ds,
                    out_dir=str(__import__("tempfile").mkdtemp()))
    assert seen == [False]


def test_validate_uses_fast_path(blender_scene, monkeypatch):
    """engine.validate with out_dir=None routes through
    eval_metrics_fast (and never reads a full image back)."""
    from nerfsr_tpu import engine

    opt = default_options(
        "train", model="nerf", dataset_mode="blender",
        dataset_root=blender_scene, img_wh=(16, 16), batch_size=32,
        **_TINY)
    system = create_model(opt)
    ds = create_dataset(opt, "val")
    params = system.init_params(jax.random.PRNGKey(0))
    calls = {"fast": 0, "readback": 0}
    orig = type(system).eval_metrics_fast

    def counting_fast(self, *a, **k):
        calls["fast"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(type(system), "eval_metrics_fast", counting_fast)
    monkeypatch.setattr(
        type(system), "render_eval",
        lambda self, *a, **k: calls.__setitem__("readback", 1) or 0)
    metrics = engine.validate(opt, system, params, ds, out_dir=None)
    assert calls["fast"] == len(ds) and not calls["readback"]
    assert "fine_psnr" in metrics
