"""Blender supersampling dataset (``--dataset_mode blender_downX``).

Capability parity with ``data/blender_downX_dataset.py`` of
cwchenwang/NeRF-SR: HR rays are built at the full ``img_wh`` and grouped
so each item is one LR pixel's ds^2 sub-rays; the LR ground truth is the
HR image downscaled by ``--ds_method`` (lanczos or average pooling, after
RGBA->white blending order matching the reference: blend AFTER the
resize); the HR ground truth is kept grouped as ``rgbs_ori``. The
``train_crop`` precrop warm-up and ``--rand_dir`` jittered directions are
supported.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerfsr_tpu.data import register_dataset
from nerfsr_tpu.data.blender import NEAR, FAR, _ray_dirs_np, rays_from_pose
from nerfsr_tpu.data.downx_common import (blend_white, downscale_pil,
                                          group_subpixels)


def _rand_ray_dirs(h, w, focal, rng):
    """Jittered per-pixel dirs (``--rand_dir``, reference :13-42):
    uniform offset within each pixel instead of the center."""
    u = rng.rand(h, w).astype(np.float32)
    v = rng.rand(h, w).astype(np.float32)
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    return np.stack([(i + u - w / 2) / focal, -(j + v - h / 2) / focal,
                     -np.ones_like(i)], -1)


@register_dataset("blender_downX")
class BlenderDownXDataset:
    """Modes: train, train_crop, val, test."""

    def __init__(self, opt, mode):
        assert mode in ("train", "train_crop", "val", "test", "test_train")
        self.opt = opt
        self.mode = mode
        self.root = opt.dataset_root
        self.img_wh = tuple(opt.img_wh)
        self.ds = opt.downscale
        split = {"train_crop": "train", "test_train": "train"}.get(mode, mode)
        with open(os.path.join(self.root,
                               f"transforms_{split}.json")) as f:
            self.meta = json.load(f)
        w, h = self.img_wh
        self.focal = (0.5 * 800 / np.tan(
            0.5 * self.meta["camera_angle_x"])) * w / 800.0
        self.near, self.far = NEAR, FAR
        if opt.rand_dir:
            rng = np.random.RandomState(opt.seed)
            self.directions = _rand_ray_dirs(h, w, self.focal, rng)
        else:
            self.directions = _ray_dirs_np(h, w, self.focal,
                                           opt.use_pixel_centers)
        self.frames = self.meta["frames"]
        if mode == "val":
            self.frames = self.frames[:8]

    def __len__(self):
        return len(self.frames)

    def _load(self, frame):
        """-> (HR rgb (h,w,3), LR rgb (h/ds, w/ds, 3)) white-blended."""
        from PIL import Image

        img = Image.open(
            os.path.join(self.root, frame["file_path"] + ".png"))
        if tuple(img.size) != self.img_wh:
            img = img.resize(self.img_wh, Image.LANCZOS)
        lr = blend_white(downscale_pil(img, self.ds, self.opt.ds_method))
        hr = blend_white(np.asarray(img, np.float32) / 255.0)
        return hr[..., :3], lr[..., :3]

    def _pose_rays_grouped(self, c2w, crop=False):
        w, h = self.img_wh
        ro, rd = rays_from_pose(self.directions, c2w)
        if crop:
            ro = self._crop_hr(ro)
            rd = self._crop_hr(rd)
        return {k: group_subpixels(v, self.ds) for k, v in
                (("origins", ro), ("directions", rd))}

    def _hr_crop_bounds(self):
        """Center-crop window by precrop_frac with BOTH the size and
        the START aligned to ds blocks: a start at h//2 - dh is only
        block-aligned when h//2 is a ds multiple — otherwise the
        grouped 'LR pixels' of the cropped rays would straddle two
        real ds x ds blocks and the LR crop (derived from these same
        bounds) would shift relative to them."""
        w, h = self.img_wh
        ds = self.ds
        dh = int(h // 2 * self.opt.precrop_frac) // ds * ds
        dw = int(w // 2 * self.opt.precrop_frac) // ds * ds
        y0 = (h // 2 - dh) // ds * ds
        x0 = (w // 2 - dw) // ds * ds
        return y0, y0 + 2 * dh, x0, x0 + 2 * dw

    def _crop_hr(self, x):
        y0, y1, x0, x1 = self._hr_crop_bounds()
        return x[y0:y1, x0:x1]

    def _crop_lr(self, x):
        y0, y1, x0, x1 = self._hr_crop_bounds()
        ds = self.ds
        return x[y0 // ds:y1 // ds, x0 // ds:x1 // ds]

    def ray_buffer(self):
        """Grouped training buffer: origins/dirs/near/far (N_lr, ds^2, .),
        rgbs (N_lr, 3) LR gt, rgbs_ori (N_lr, ds^2, 3) HR gt."""
        assert self.mode in ("train", "train_crop")
        crop = self.mode == "train_crop"
        parts = {k: [] for k in ("origins", "directions", "near", "far",
                                 "rgbs", "rgbs_ori")}
        for frame in self.frames:
            c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
            hr, lr = self._load(frame)
            if crop:
                hr = self._crop_hr(hr)
                lr = self._crop_lr(lr)
            rays = self._pose_rays_grouped(c2w, crop=crop)
            n = rays["origins"].shape[0]
            parts["origins"].append(rays["origins"])
            parts["directions"].append(rays["directions"])
            parts["near"].append(
                np.full((n, self.ds ** 2, 1), self.near, np.float32))
            parts["far"].append(
                np.full((n, self.ds ** 2, 1), self.far, np.float32))
            parts["rgbs"].append(lr.reshape(-1, 3).astype(np.float32))
            parts["rgbs_ori"].append(
                group_subpixels(hr, self.ds).astype(np.float32))
        return {k: np.concatenate(v) for k, v in parts.items()}

    def eval_raygen_spec(self, idx):
        """Pose + static geometry for device-side eval raygen (see
        ``NeRFSystem.render_pose``)."""
        from nerfsr_tpu.data.blender import blender_eval_raygen_spec
        return blender_eval_raygen_spec(self, idx)

    def eval_dirs(self):
        """Direction grid in GROUPED flatten order."""
        from nerfsr_tpu.data.blender import cached_eval_dirs
        return cached_eval_dirs(self, self.ds)

    def image_rays(self, idx):
        """Grouped eval rays for one image + LR/HR ground truth."""
        frame = self.frames[idx]
        c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
        hr, lr = self._load(frame)
        rays = self._pose_rays_grouped(c2w)
        n = rays["origins"].shape[0]
        rays["near"] = np.full((n, self.ds ** 2, 1), self.near, np.float32)
        rays["far"] = np.full((n, self.ds ** 2, 1), self.far, np.float32)
        rays["rgbs"] = lr.reshape(-1, 3).astype(np.float32)
        rays["rgbs_ori"] = group_subpixels(hr, self.ds).astype(np.float32)
        rays["c2w"] = c2w
        return rays

    @property
    def depth_bounds(self):
        return self.near, self.far
