"""LLFF supersampling dataset (``--dataset_mode llff_downX``) — the
paper's main configuration (fern 252x189 inputs -> 504x378 outputs).

Capability parity with ``data/llff_downX_dataset.py`` of
cwchenwang/NeRF-SR: the COLMAP pose pipeline of the llff dataset, HR rays
built at the full ``img_wh`` and NDC-warped, grouped per LR pixel; LR
ground truth by ``--ds_method`` (lanczos/avg) from the HR-resized image;
HR ground truth kept grouped as ``rgbs_ori``; options: ``--unified_dir``
(all sub-pixels share their LR pixel's center direction, :270-276),
``--use_subset``/``--subset_num`` (:265-267), SISR supervision images
(``--sisr_path``, :258-263,300-309), ``--include_var`` to keep the val
view in training, and the ``reg_patch`` split for TV patch
regularization (:422-438).
"""

from __future__ import annotations

import os

import numpy as np

from nerfsr_tpu.data import register_dataset
from nerfsr_tpu.data.blender import _ray_dirs_np, load_image, rays_from_pose
from nerfsr_tpu.data.downx_common import downscale_pil, group_subpixels
from nerfsr_tpu.data.llff import (load_colmap_scene, ndc_rays_np,
                                  spiral_path, spheric_path)


@register_dataset("llff_downX")
class LLFFDownXDataset:
    """Modes: train, val, test, test_train, reg_patch, gan."""

    def __init__(self, opt, mode):
        assert mode in ("train", "val", "test", "test_train", "reg_patch",
                        "gan")
        self.opt = opt
        self.mode = mode
        self.img_wh = tuple(opt.img_wh)  # HR size
        self.ds = opt.downscale
        self.spheric = opt.spheric_poses
        w, h = self.img_wh

        self.poses, self.bounds, self.focal, self.image_paths = \
            load_colmap_scene(opt.dataset_root, self.img_wh)
        dists = np.linalg.norm(self.poses[..., 3], axis=1)
        self.val_idx = int(np.argmin(dists))

        if opt.use_subset:
            self.poses = self.poses[:opt.subset_num]
            self.image_paths = self.image_paths[:opt.subset_num]
            # the reference computes val_idx BEFORE subsetting
            # (llff_downX_dataset.py:245,265) and can index out of range
            # when subset_num <= val_idx; keep the selection order but
            # clamp instead of crashing.
            if self.val_idx >= len(self.poses):
                self.val_idx = len(self.poses) - 1

        self.sr_image_paths = None
        if opt.sisr_path:
            self.sr_image_paths = [
                os.path.join(opt.sisr_path, f)
                for f in sorted(os.listdir(opt.sisr_path))
                if f.lower().endswith(("jpg", "jpeg", "png"))]
            if opt.use_subset:
                self.sr_image_paths = self.sr_image_paths[:opt.subset_num]

        if not opt.unified_dir:
            self.directions = _ray_dirs_np(h, w, self.focal,
                                           opt.use_pixel_centers)
        else:
            # all ds^2 sub-pixels share the LR pixel-center direction.
            # focal / ds is TRUE division: the reference floor-divides
            # (llff_downX_dataset.py:274 `self.focal//downscale`),
            # truncating a float focal and expanding every ray
            # direction by up to ~0.2% (~0.5 px at the image edge) —
            # fixed here rather than reproduced, like the wgangp
            # gradient penalty.
            lr_dirs = _ray_dirs_np(h // self.ds, w // self.ds,
                                   self.focal / self.ds,
                                   opt.use_pixel_centers)
            self.directions = np.repeat(
                np.repeat(lr_dirs, self.ds, axis=0), self.ds, axis=1)

        self._poses_test = None
        if mode == "test":
            if not self.spheric:
                radii = np.percentile(
                    np.abs(self.poses[..., 3]), 90, axis=0)
                self._poses_test = spiral_path(radii, focus_depth=3.5)
            else:
                self._poses_test = spheric_path(1.1 * self.bounds.min())

    # ------------------------------------------------------------------
    def _near_far(self):
        if not self.spheric:
            return 0.0, 1.0
        near = float(self.bounds.min())
        return near, float(min(8 * near, self.bounds.max()))

    @property
    def depth_bounds(self):
        return self._near_far()

    def __len__(self):
        if self.mode in ("train", "reg_patch", "gan"):
            n = len(self.image_paths)
            n_eff = n if self.opt.include_var else n - 1
            wl, hl = self.img_wh[0] // self.ds, self.img_wh[1] // self.ds
            return n_eff * wl * hl
        if self.mode == "val":
            return max(1, self.opt.val_num)
        if self.mode == "test_train":
            return len(self.poses)
        return len(self._poses_test)

    def _pose_rays_grouped(self, c2w):
        """HR rays for one pose, NDC-warped, grouped (N_lr, ds^2, .)."""
        w, h = self.img_wh
        ro, rd = rays_from_pose(self.directions, c2w)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        near, far = self._near_far()
        if not self.spheric:
            ro, rd = ndc_rays_np(h, w, self.focal, 1.0, ro, rd)
        n = ro.shape[0]
        fields = {
            "origins": ro.reshape(h, w, 3),
            "directions": rd.reshape(h, w, 3),
            "near": np.full((h, w, 1), near, np.float32),
            "far": np.full((h, w, 1), far, np.float32),
        }
        return {k: group_subpixels(v, self.ds) for k, v in fields.items()}

    def _load_pair(self, path):
        """-> HR rgb (h, w, 3) + LR rgb (h/ds, w/ds, 3)."""
        from PIL import Image

        img = Image.open(path).convert("RGB")
        if tuple(img.size) != self.img_wh:
            img = img.resize(self.img_wh, Image.LANCZOS)
        lr = downscale_pil(img, self.ds, self.opt.ds_method)
        hr = np.asarray(img, np.float32) / 255.0
        return hr, lr

    def ray_buffer(self):
        """Grouped training buffer (val view excluded unless
        --include_var): origins/directions/near/far (N_lr, ds^2, .), rgbs
        (N_lr, 3), rgbs_ori (N_lr, ds^2, 3) [+ rgbs_sr (N_lr, ds^2, 3)]."""
        assert self.mode == "train"
        keys = ["origins", "directions", "near", "far", "rgbs", "rgbs_ori"]
        if self.sr_image_paths:
            keys.append("rgbs_sr")
        parts = {k: [] for k in keys}
        for i, path in enumerate(self.image_paths):
            if i == self.val_idx and not self.opt.include_var:
                continue
            rays = self._pose_rays_grouped(self.poses[i])
            hr, lr = self._load_pair(path)
            for k in ("origins", "directions", "near", "far"):
                parts[k].append(rays[k])
            parts["rgbs"].append(lr.reshape(-1, 3).astype(np.float32))
            parts["rgbs_ori"].append(
                group_subpixels(hr, self.ds).astype(np.float32))
            if self.sr_image_paths:
                sr = load_image(self.sr_image_paths[i], self.img_wh)
                parts["rgbs_sr"].append(
                    group_subpixels(sr, self.ds).astype(np.float32))
        return {k: np.concatenate(v) for k, v in parts.items()}

    def ref_buffer(self):
        """Flat HR rays + rgbs of the reference view (index 0) for the
        --with_ref loss (parity: ``data/llff_downX_dataset.py:290-312``,
        :335-363 — the downX variant keeps ref rays at img_wh).

        Rays flatten in GROUPED order (``_pose_rays_grouped``), so the
        rgbs must be grouped the same way before flattening — the
        reference groups BOTH (``:327-333`` rgbs, ``:355-359`` rays);
        a raster-order image here would pair almost every ray with a
        different pixel's color for ds>1."""
        ref_idx = getattr(self.opt, "ref_idx", 0)
        rays = self._pose_rays_grouped(self.poses[ref_idx])
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in rays.items()}
        img = load_image(self.image_paths[ref_idx], self.img_wh)
        flat["viewdirs"] = flat["directions"]
        flat["rgbs"] = group_subpixels(
            img.astype(np.float32), self.ds).reshape(-1, 3)
        return flat

    def _grouped_rays_for_view(self, i):
        """Cached grouped ray fields for view ``i``: ``patch_buffer``
        and ``gan_patch`` fire per --reg_patch_freq/--gan_iter steps on
        the single-dispatch fallback path, and a full-image NDC raygen
        (~190K rays at flagship size) per extracted ~patch is ~1000x
        the useful work (the scan paths avoid this entirely via
        ``gan_raygen_buffers``)."""
        cache = getattr(self, "_grouped_cache", None)
        if cache is None:
            cache = self._grouped_cache = {}
        if i not in cache:
            cache[i] = self._pose_rays_grouped(self.poses[i])
        return cache[i]

    def _usable_views(self):
        """Training-view indices shared by the auxiliary samplers: the
        val view joins the pool when ``--include_var`` keeps it in
        training (consistent across patch_buffer and gan_patch)."""
        return [i for i in range(len(self.image_paths))
                if self.opt.include_var or i != self.val_idx]

    def patch_buffer(self, rng, n_patches):
        """Contiguous LR-patch ray bundles for TV regularization
        (``reg_patch`` split capability, reference :422-438): each item is
        a (reg_patch_len^2, ds^2, .) grouped ray block from one image."""
        plen = self.opt.reg_patch_len
        wl, hl = self.img_wh[0] // self.ds, self.img_wh[1] // self.ds
        out = []
        usable = self._usable_views()
        for _ in range(n_patches):
            i = usable[rng.randint(len(usable))]
            rays = self._grouped_rays_for_view(i)
            row = rng.randint(hl - plen + 1)
            col = rng.randint(wl - plen + 1)
            idx = (row + np.arange(plen))[:, None] * wl + \
                (col + np.arange(plen))[None, :]
            idx = idx.reshape(-1)
            out.append({k: v[idx] for k, v in rays.items()})
        return out

    def gan_patch(self, rng):
        """One HR patch for adversarial training (parity with the 'gan'
        split, reference :440-464): contiguous patch_len x patch_len HR
        rays from a random train view + the 'real' patch — the reference
        view's HR pixels at the same location (or the view's own HR gt
        with --all_ref)."""
        from nerfsr_tpu.data.downx_common import ungroup_subpixels

        plen = self.opt.patch_len
        pl_lr = plen // self.ds
        w, h = self.img_wh
        wl, hl = w // self.ds, h // self.ds
        usable = self._usable_views()
        i = usable[rng.randint(len(usable))]
        # exclusive upper bound = reference parity (the reference's gan
        # sampler never draws the last valid row/col either,
        # llff_downX_dataset.py:443-447); max(1, .) only guards the
        # degenerate patch-spans-image case the reference would crash on
        r0 = rng.randint(max(1, hl - pl_lr))
        c0 = rng.randint(max(1, wl - pl_lr))
        rays = self._grouped_rays_for_view(i)
        idx = ((r0 + np.arange(pl_lr))[:, None] * wl
               + (c0 + np.arange(pl_lr))[None, :]).reshape(-1)
        patch = {k: ungroup_subpixels(v[idx], (plen, plen), self.ds)
                 for k, v in rays.items()}  # HR (plen, plen, C)
        ref_idx = getattr(self.opt, "ref_idx", 0)
        src = self.image_paths[i] if self.opt.all_ref \
            else self.image_paths[ref_idx]
        img = load_image(src, self.img_wh)
        patch["rgbs"] = img[r0 * self.ds:r0 * self.ds + plen,
                            c0 * self.ds:c0 * self.ds + plen]
        return patch

    def gan_raygen_buffers(self):
        """Device-residency inputs for the in-scan adversarial patch
        step (``NeRFDownXSystem.train_steps_scan_gan``): instead of the
        host building one patch's rays per ``gan_step`` call
        (``gan_patch`` above — a full ``_pose_rays_grouped`` + image
        load + upload every --gan_iter steps), the camera-space HR
        direction grid, the usable-view poses and the 'real' HR pixels
        upload ONCE; the patch's rays are then generated inside the
        compiled scan from (grid slice, pose) exactly like eval raygen
        (``NeRFSystem._render_dirs_chunks``). Returns (buffers dict,
        static geom tuple) — geom as in ``eval_raygen_spec``.

        ``real_idx`` maps each usable view to its row in ``reals``
        (constant ref row unless --all_ref, parity with ``gan_patch``'s
        source selection; reference ``data/llff_downX_dataset.py:
        440-464``)."""
        usable = self._usable_views()
        poses = np.stack([self.poses[i] for i in usable]).astype(
            np.float32)
        ref_idx = getattr(self.opt, "ref_idx", 0)
        if self.opt.all_ref:
            reals = np.stack([load_image(self.image_paths[i],
                                         self.img_wh) for i in usable])
            real_idx = np.arange(len(usable), dtype=np.int32)
        else:
            reals = load_image(self.image_paths[ref_idx],
                               self.img_wh)[None]
            real_idx = np.zeros(len(usable), np.int32)
        near, far = self._near_far()
        if self.spheric:
            geom = ("world", float(near), float(far))
        else:
            w, h = self.img_wh
            geom = ("ndc", h, w, float(self.focal), float(near),
                    float(far))
        return {
            "dirs_hw": self.directions.astype(np.float32),  # (h, w, 3)
            "poses": poses,                                 # (n, 3, 4)
            "reals": reals.astype(np.float32),              # (m, h, w, 3)
            "real_idx": real_idx,                           # (n,)
        }, geom

    def eval_raygen_spec(self, idx):
        """Pose + static geometry for device-side eval raygen (see
        ``NeRFSystem.render_pose``)."""
        from nerfsr_tpu.data.llff import llff_eval_raygen_spec
        return llff_eval_raygen_spec(self, idx)

    def eval_dirs(self):
        """Direction grid pre-permuted to the GROUPED flatten order
        (each LR pixel's ds^2 sub-rays contiguous), so device-raygen
        render rows match ``image_rays``'s grouped rows."""
        from nerfsr_tpu.data.blender import cached_eval_dirs
        return cached_eval_dirs(self, self.ds)

    def image_rays(self, idx):
        if self.mode == "val":
            pose_idx = self.val_idx
            c2w = self.poses[pose_idx]
        elif self.mode == "test_train":
            pose_idx = idx
            c2w = self.poses[idx]
        else:
            pose_idx = None
            c2w = self._poses_test[idx]
        sample = self._pose_rays_grouped(c2w)
        sample["c2w"] = c2w
        if pose_idx is not None:
            hr, lr = self._load_pair(self.image_paths[pose_idx])
            sample["rgbs"] = lr.reshape(-1, 3).astype(np.float32)
            sample["rgbs_ori"] = group_subpixels(
                hr, self.ds).astype(np.float32)
        else:
            sample["rgbs"] = None
        return sample
