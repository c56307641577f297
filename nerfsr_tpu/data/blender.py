"""NeRF-synthetic (Blender) dataset.

Capability parity with ``data/blender_dataset.py`` of cwchenwang/NeRF-SR:
``transforms_{split}.json`` parsing, focal derived from camera_angle_x at
the working resolution, near/far = 2/6, RGBA->white alpha blend, the
``train_crop`` center-crop warm-up mode (``precrop_frac``), and a val
split capped at 8 images.

TPU-first difference: rays are returned as numpy struct-of-arrays buffers
(uploaded to HBM once) rather than a torch Dataset of packed 11-col rows.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerfsr_tpu.data import register_dataset

NEAR, FAR = 2.0, 6.0


def _ray_dirs_np(h, w, focal, use_pixel_centers=True):
    center = 0.5 if use_pixel_centers else 0.0
    i, j = np.meshgrid(
        np.arange(w, dtype=np.float32) + center,
        np.arange(h, dtype=np.float32) + center,
        indexing="xy")
    return np.stack(
        [(i - w / 2) / focal, -(j - h / 2) / focal, -np.ones_like(i)], -1)


def rays_from_pose(directions, c2w):
    """Numpy twin of core.rays.get_rays for dataset-side precompute."""
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:, 3], rays_d.shape).copy()
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def blender_eval_raygen_spec(ds_obj, idx):
    """Shared blender-family pose + geometry for device-side eval raygen
    (constant near/far, no NDC)."""
    c2w = np.array(ds_obj.frames[idx]["transform_matrix"],
                   np.float32)[:3, :4]
    return {"c2w": c2w,
            "geom": ("world", float(ds_obj.near), float(ds_obj.far))}


def cached_eval_dirs(ds_obj, group_ds: int = 0):
    """Flat camera-space direction grid in the dataset's eval ray order
    (raster, or subpixel-grouped when ``group_ds`` > 1), cached on the
    dataset — ``NeRFSystem.render_pose`` uploads it to the device once.
    Shared by all dataset families (device-raygen eval)."""
    if getattr(ds_obj, "_eval_dirs", None) is None:
        d = ds_obj.directions.astype(np.float32)
        if group_ds > 1:
            from nerfsr_tpu.data.downx_common import group_subpixels
            d = group_subpixels(d, group_ds)
        ds_obj._eval_dirs = np.ascontiguousarray(d.reshape(-1, 3))
    return ds_obj._eval_dirs


def load_image(path, wh, keep_alpha=False):
    from PIL import Image

    img = Image.open(path)
    if tuple(img.size) != tuple(wh):
        img = img.resize(tuple(wh), Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.shape[-1] == 4 and not keep_alpha:
        rgb, a = arr[..., :3], arr[..., 3:]
        arr = rgb * a + (1.0 - a)  # white blend (blender_dataset.py:72-73)
    return arr


@register_dataset("blender")
class BlenderDataset:
    """Modes: train, train_crop, val, test."""

    def __init__(self, opt, mode):
        assert mode in ("train", "train_crop", "val", "test", "test_train")
        self.opt = opt
        self.mode = mode
        self.root = opt.dataset_root
        self.img_wh = tuple(opt.img_wh)
        split = {"train_crop": "train", "test_train": "train"}.get(mode, mode)
        with open(os.path.join(self.root,
                               f"transforms_{split}.json")) as f:
            self.meta = json.load(f)
        w, h = self.img_wh
        self.focal = (0.5 * 800 / np.tan(
            0.5 * self.meta["camera_angle_x"])) * w / 800.0
        self.near, self.far = NEAR, FAR
        self.directions = _ray_dirs_np(h, w, self.focal,
                                       opt.use_pixel_centers)
        self.white_back = True
        self.frames = self.meta["frames"]
        if mode == "val":
            self.frames = self.frames[:8]  # blender_dataset.py:109

    def __len__(self):
        return len(self.frames)

    # -- training ----------------------------------------------------------
    def ray_buffer(self):
        """All rays of all training images, flat struct-of-arrays."""
        assert self.mode in ("train", "train_crop")
        w, h = self.img_wh
        origins, dirs, rgbs = [], [], []
        for frame in self.frames:
            c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
            img = load_image(
                os.path.join(self.root, frame["file_path"] + ".png"),
                self.img_wh).reshape(-1, 3)
            ro, rd = rays_from_pose(self.directions, c2w)
            ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
            if self.mode == "train_crop":
                # center-crop warm-up (blender_dataset.py:80-90)
                dh = int(h // 2 * self.opt.precrop_frac)
                dw = int(w // 2 * self.opt.precrop_frac)

                def crop(x):
                    x = x.reshape(h, w, -1)
                    x = x[h // 2 - dh:h // 2 + dh, w // 2 - dw:w // 2 + dw]
                    return x.reshape(-1, x.shape[-1])

                img, ro, rd = crop(img), crop(ro), crop(rd)
            origins.append(ro)
            dirs.append(rd)
            rgbs.append(img)
        origins = np.concatenate(origins)
        dirs = np.concatenate(dirs)
        n = origins.shape[0]
        return {
            "origins": origins,
            "directions": dirs,
            "viewdirs": dirs,
            "near": np.full((n, 1), self.near, np.float32),
            "far": np.full((n, 1), self.far, np.float32),
            "rgbs": np.concatenate(rgbs).astype(np.float32),
        }

    def image_buffer(self):
        """Image-structured training rays (N_img, H, W, C) for patch-mode
        training (--patch_size > 1). The patch losses are model-level in
        the reference (``models/nerf_model.py:276-304``); this gives the
        blender dataset the contiguous-pixel source they need."""
        assert self.mode == "train"
        w, h = self.img_wh
        flat = self.ray_buffer()
        n_img = len(next(iter(flat.values()))) // (h * w)
        return {k: v.reshape(n_img, h, w, v.shape[-1])
                for k, v in flat.items()}

    # -- evaluation --------------------------------------------------------
    def eval_raygen_spec(self, idx):
        """Pose + static geometry for device-side eval raygen (see
        ``NeRFSystem.render_pose``)."""
        return blender_eval_raygen_spec(self, idx)

    def eval_dirs(self):
        return cached_eval_dirs(self)

    def image_rays(self, idx):
        """Rays + gt + mask for one eval image."""
        frame = self.frames[idx]
        c2w = np.array(frame["transform_matrix"], np.float32)[:3, :4]
        arr = load_image(
            os.path.join(self.root, frame["file_path"] + ".png"),
            self.img_wh, keep_alpha=True)
        if arr.shape[-1] == 4:
            valid_mask = (arr[..., 3] > 0).reshape(-1)
            rgb = arr[..., :3] * arr[..., 3:] + (1 - arr[..., 3:])
        else:
            valid_mask = np.ones(arr.shape[0] * arr.shape[1], bool)
            rgb = arr
        ro, rd = rays_from_pose(self.directions, c2w)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        n = ro.shape[0]
        return {
            "origins": ro,
            "directions": rd,
            "viewdirs": rd,
            "near": np.full((n, 1), self.near, np.float32),
            "far": np.full((n, 1), self.far, np.float32),
            "rgbs": rgb.reshape(-1, 3).astype(np.float32),
            "valid_mask": valid_mask,
            "c2w": c2w,
        }

    @property
    def depth_bounds(self):
        return self.near, self.far
