"""LLFF (forward-facing, COLMAP-calibrated) dataset.

Capability parity with ``data/llff_dataset.py`` of cwchenwang/NeRF-SR:

- COLMAP sparse model -> c2w poses + per-image near/far bounds from
  0.1/99.9 depth percentiles of visible 3D points (:222-236)
- axis flip "right down front" -> "right up back", pose centering about
  the average pose, world rescale so min depth ~= 1.33 (:245-260)
- val view = closest-to-center (:248-250)
- NDC rays with near/far = 0/1 for forward-facing scenes, spheric bounds
  otherwise (:324-335); **viewdirs are the post-NDC directions**, matching
  the reference's 11-col packing (:337-341)
- test paths: spiral (:353-358) / spheric (:359-361) / test_train /
  test_viewdir (:412-415)

TPU-first: training rays come out as one flat struct-of-arrays buffer.
"""

from __future__ import annotations

import os

import numpy as np

from nerfsr_tpu.data import register_dataset
from nerfsr_tpu.data.blender import _ray_dirs_np, load_image, rays_from_pose
from nerfsr_tpu.data.colmap import read_model


# ---------------------------------------------------------------------------
# pose math (numpy; dataset-side precompute)
# ---------------------------------------------------------------------------

def _normalize(v):
    return v / np.linalg.norm(v)


def average_pose(poses):
    """Average c2w: mean center, mean z, y via x = y' x z (parity:
    ``data/llff_dataset.py:20-56``)."""
    center = poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses):
    """Recenter all poses about the average pose (parity: :59-84)."""
    avg = average_pose(poses)
    avg_homo = np.eye(4)
    avg_homo[:3] = avg
    last = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    homo = np.concatenate([poses, last], 1)
    centered = (np.linalg.inv(avg_homo) @ homo)[:, :3]
    return centered, avg


def spiral_path(radii, focus_depth, n_poses=120):
    """Two-turn spiral render path (parity: :87-118)."""
    poses = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = _normalize(center - np.array([0, 0, -focus_depth]))
        x = _normalize(np.cross(np.array([0, 1.0, 0]), z))
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center], 1))
    return np.stack(poses)


def spheric_path(radius, n_poses=120):
    """Circular path looking 36 degrees down (parity: :121-159)."""
    def pose(theta, phi, r):
        trans = np.array([[1, 0, 0, 0], [0, 1, 0, -0.9 * r],
                          [0, 0, 1, r], [0, 0, 0, 1.0]])
        rot_phi = np.array([
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1]])
        rot_theta = np.array([
            [np.cos(theta), 0, -np.sin(theta), 0],
            [0, 1, 0, 0],
            [np.sin(theta), 0, np.cos(theta), 0],
            [0, 0, 0, 1]])
        c2w = rot_theta @ rot_phi @ trans
        flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                         [0, 1, 0, 0], [0, 0, 0, 1.0]])
        return (flip @ c2w)[:3]

    return np.stack([pose(th, -np.pi / 5, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]])


def ndc_rays_np(h, w, focal, near, rays_o, rays_d):
    """Numpy twin of core.rays.ndc_rays for dataset-side precompute."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return (np.stack([o0, o1, o2], -1).astype(np.float32),
            np.stack([d0, d1, d2], -1).astype(np.float32))


def llff_eval_raygen_spec(ds_obj, idx, with_viewdir_split=False):
    """Shared LLFF pose-selection + static geometry for device-side eval
    raygen (used by LLFFDataset and LLFFDownXDataset; mirrors their
    ``image_rays`` pose selection and ``_pose_rays*`` geometry so the
    pose path and the host-ray path stay in lockstep)."""
    if ds_obj.mode == "val":
        c2w = ds_obj.poses[ds_obj.val_idx]
    elif ds_obj.mode == "test_train":
        c2w = ds_obj.poses[idx]
    else:
        c2w = ds_obj._poses_test[idx]
    vd_c2w = c2w
    if with_viewdir_split and ds_obj.mode == "test_viewdir":
        # fixed render pose, per-idx view dirs (parity: reference
        # data/llff_dataset.py:412-415)
        c2w = ds_obj._poses_test[10]
    near, far = ds_obj._near_far()
    w, h = ds_obj.img_wh
    if ds_obj.spheric:
        geom = ("world", float(near), float(far))
    else:
        geom = ("ndc", h, w, float(ds_obj.focal), float(near),
                float(far))
    return {"c2w": c2w, "vd_c2w": vd_c2w, "geom": geom}


def load_colmap_scene(root_dir, img_wh):
    """COLMAP sparse model -> (poses (N,3,4), bounds (N,2), focal,
    image_paths), fully processed (axis flip, centering, rescale).
    Parity: ``data/llff_dataset.py:196-260``."""
    cams, imdata, pts3d = read_model(os.path.join(root_dir, "sparse/0"))
    cam = cams[min(cams)]
    focal = cam.params[0] * img_wh[0] / cam.width

    keys = list(imdata)
    names = [imdata[k].name for k in keys]
    perm = np.argsort(names)
    image_paths = [os.path.join(root_dir, "images", n)
                   for n in sorted(names)]

    w2c = []
    bottom = np.array([[0, 0, 0, 1.0]])
    for k in keys:
        im = imdata[k]
        R = im.qvec2rotmat()
        t = im.tvec.reshape(3, 1)
        w2c.append(np.concatenate(
            [np.concatenate([R, t], 1), bottom], 0))
    poses = np.linalg.inv(np.stack(w2c))[:, :3]  # c2w, order of `keys`

    # per-image depth bounds from visible 3D points
    id_to_idx = {imdata[k].id: i for i, k in enumerate(keys)}
    n_img = len(keys)
    pts_xyz = np.stack([p.xyz for p in pts3d.values()])  # (P, 3)
    vis = np.zeros((n_img, len(pts_xyz)), bool)
    for j, p in enumerate(pts3d.values()):
        for img_id in p.image_ids:
            if img_id in id_to_idx:
                vis[id_to_idx[img_id], j] = True
    # depth of each point w.r.t. each camera: (p - center) . z_axis
    depths = np.einsum(
        "pk,nk->np", pts_xyz, poses[..., 2]) - np.einsum(
        "nk,nk->n", poses[..., 3], poses[..., 2])[:, None]
    bounds = np.zeros((n_img, 2))
    for i in range(n_img):
        zs = depths[i][vis[i]]
        if len(zs) == 0:
            zs = depths[i]
        bounds[i] = [np.percentile(zs, 0.1), np.percentile(zs, 99.9)]

    poses = poses[perm]
    bounds = bounds[perm]

    # COLMAP "right down front" -> NeRF "right up back"
    poses = np.concatenate(
        [poses[..., 0:1], -poses[..., 1:3], poses[..., 3:4]], -1)
    poses, _ = center_poses(poses)

    scale = bounds.min() * 0.75  # nearest depth at ~1.33
    bounds /= scale
    poses[..., 3] /= scale
    return poses.astype(np.float32), bounds.astype(np.float32), focal, \
        image_paths


@register_dataset("llff")
class LLFFDataset:
    """Modes: train, val, test, test_train, test_viewdir."""

    def __init__(self, opt, mode):
        assert mode in ("train", "val", "test", "test_train",
                        "test_viewdir")
        self.opt = opt
        self.mode = mode
        self.img_wh = tuple(opt.img_wh)
        self.spheric = opt.spheric_poses
        w, h = self.img_wh

        self.poses, self.bounds, self.focal, self.image_paths = \
            load_colmap_scene(opt.dataset_root, self.img_wh)
        self.directions = _ray_dirs_np(h, w, self.focal,
                                       opt.use_pixel_centers)
        dists = np.linalg.norm(self.poses[..., 3], axis=1)
        self.val_idx = int(np.argmin(dists))

        self._poses_test = None
        if mode in ("test", "test_viewdir"):
            if not self.spheric:
                radii = np.percentile(
                    np.abs(self.poses[..., 3]), 90, axis=0)
                self._poses_test = spiral_path(radii, focus_depth=3.5)
            else:
                self._poses_test = spheric_path(1.1 * self.bounds.min())

    # -- bounds ------------------------------------------------------------
    def _near_far(self):
        if not self.spheric:
            return 0.0, 1.0
        near = float(self.bounds.min())
        return near, float(min(8 * near, self.bounds.max()))

    @property
    def depth_bounds(self):
        return self._near_far()

    # -- rays --------------------------------------------------------------
    def _pose_rays(self, c2w, viewdir_from=None):
        """World rays -> (optionally NDC) rays dict for one pose."""
        ro, rd = rays_from_pose(self.directions, c2w)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        near, far = self._near_far()
        w, h = self.img_wh
        if not self.spheric:
            ro, rd = ndc_rays_np(h, w, self.focal, 1.0, ro, rd)
            viewdirs = rd
        else:
            viewdirs = rd
        n = ro.shape[0]
        return {
            "origins": ro,
            "directions": rd,
            "viewdirs": viewdirs,
            "near": np.full((n, 1), near, np.float32),
            "far": np.full((n, 1), far, np.float32),
        }

    def __len__(self):
        if self.mode == "train":
            n = len(self.image_paths)
            return (n if self.opt.include_var else n - 1) * \
                self.img_wh[0] * self.img_wh[1]
        if self.mode == "val":
            return max(1, self.opt.val_num)
        if self.mode == "test_train":
            return len(self.poses)
        return len(self._poses_test)

    def ray_buffer(self):
        """All training rays (val view excluded unless --include_var,
        parity: :289-291) as a flat struct-of-arrays buffer."""
        assert self.mode == "train"
        w, h = self.img_wh
        keep = [i for i in range(len(self.image_paths))
                if self.opt.include_var or i != self.val_idx]

        from nerfsr_tpu import native
        if native.available() and not self.spheric:
            # multithreaded C++ builder (nerfsr_tpu/native/raygen.cpp)
            origins, dirs = native.build_rays(
                self.poses[keep], h, w, self.focal,
                self.opt.use_pixel_centers, apply_ndc=True)
            origins = origins.reshape(-1, 3)
            dirs = dirs.reshape(-1, 3)
            near, far = self._near_far()
            n = origins.shape[0]
            rgbs = np.concatenate([
                load_image(self.image_paths[i], self.img_wh)
                .reshape(-1, 3) for i in keep]).astype(np.float32)
            return {
                "origins": origins,
                "directions": dirs,
                "viewdirs": dirs,
                "near": np.full((n, 1), near, np.float32),
                "far": np.full((n, 1), far, np.float32),
                "rgbs": rgbs,
            }

        parts = {k: [] for k in ("origins", "directions", "viewdirs",
                                 "near", "far", "rgbs")}
        for i in keep:
            rays = self._pose_rays(self.poses[i])
            img = load_image(self.image_paths[i],
                             self.img_wh).reshape(-1, 3)
            rays["rgbs"] = img.astype(np.float32)
            for k in parts:
                parts[k].append(rays[k])
        return {k: np.concatenate(v) for k, v in parts.items()}

    def ref_buffer(self, downscale=None):
        """HR rays + rgbs of the reference view (index --ref_idx==0) at
        ``img_wh * downscale`` resolution for the --with_ref loss
        (parity: ``data/llff_dataset.py:290-312``)."""
        ds = downscale or self.opt.downscale
        w, h = self.img_wh
        wh_hr = (w * ds, h * ds)
        focal_hr = self.focal * ds
        dirs = _ray_dirs_np(h * ds, w * ds, focal_hr,
                            self.opt.use_pixel_centers)
        ref_idx = getattr(self.opt, "ref_idx", 0)
        ro, rd = rays_from_pose(dirs, self.poses[ref_idx])
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        near, far = self._near_far()
        if not self.spheric:
            ro, rd = ndc_rays_np(h * ds, w * ds, focal_hr, 1.0, ro, rd)
        n = ro.shape[0]
        img = load_image(self.image_paths[ref_idx], wh_hr)
        return {
            "origins": ro,
            "directions": rd,
            "viewdirs": rd,
            "near": np.full((n, 1), near, np.float32),
            "far": np.full((n, 1), far, np.float32),
            "rgbs": img.reshape(-1, 3).astype(np.float32),
        }

    def image_buffer(self):
        """Image-structured training rays (N_img, H, W, C) for patch-mode
        training (--patch_size > 1)."""
        assert self.mode == "train"
        w, h = self.img_wh
        flat = self.ray_buffer()
        n_img = len(next(iter(flat.values()))) // (h * w)
        return {k: v.reshape(n_img, h, w, v.shape[-1])
                for k, v in flat.items()}

    def eval_raygen_spec(self, idx):
        """Pose + static geometry for device-side eval raygen (rays are
        generated on-chip by ``NeRFSystem.render_pose``; only this 3x4
        pose pair crosses the host->device link per image)."""
        return llff_eval_raygen_spec(self, idx, with_viewdir_split=True)

    def eval_dirs(self):
        from nerfsr_tpu.data.blender import cached_eval_dirs
        return cached_eval_dirs(self)

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

        if self.mode == "test_viewdir":
            # fixed pose (test pose 10), per-idx view dirs (parity: :412-415)
            sample = self._pose_rays(self._poses_test[10])
            vd = self._pose_rays(c2w)
            sample["viewdirs"] = vd["directions"]
        else:
            sample = self._pose_rays(c2w)
        sample["c2w"] = c2w
        if pose_idx is not None:
            img = load_image(self.image_paths[pose_idx], self.img_wh)
            sample["rgbs"] = img.reshape(-1, 3).astype(np.float32)
        else:
            sample["rgbs"] = None
        return sample
