"""Refinement-stage dataset (``--dataset_mode llff_refine``).

Capability parity with ``data/llff_refine_dataset.py`` of
cwchenwang/NeRF-SR:

- train: the reference view (``--ref_idx``) paired with its NeRF-SR
  synthesis ``{ref_idx}-fine-ori.png`` from ``--syn_dataroot``, augmented
  with ``--aug_num`` random perspective warps (+ identity) and per-warp
  valid bounding boxes (:113-146); each item is a random (sr, gt) patch
  plus ``--num_ref_patches`` nearby gt patches within ``--ref_offset``
  (:214-238), optionally planting the gt patch (``--with_gt_patch``).
- val: random aligned patches from every (gt, synthesis) image pair.
- test / test_train: each image tiled into ``--patch_len`` patches;
  reference patches located through the warp.py ``{i}_locs.npz``
  correspondences (:273-288), padded with the sr patch; returns
  start_locs for stitching, chunked by ``--test_img_split``.

Images are normalized to (-1, 1) (:192-195). Perspective warps use
cv2 (host-side preprocessing); the reference used torchvision.
"""

from __future__ import annotations

import os

import numpy as np

from nerfsr_tpu.data import register_dataset


def _to_norm(img):
    """[0,1] float -> (-1,1)."""
    return (img * 2.0 - 1.0).astype(np.float32)


def random_perspective_params(w, h, distortion_scale, rng):
    """Random corner displacements (same scheme as
    torchvision.RandomPerspective.get_params): each corner moves
    uniformly within distortion_scale * (w/2, h/2) toward the center."""
    half_w = int(distortion_scale * w // 2)
    half_h = int(distortion_scale * h // 2)
    tl = [rng.randint(0, half_w + 1), rng.randint(0, half_h + 1)]
    tr = [w - 1 - rng.randint(0, half_w + 1), rng.randint(0, half_h + 1)]
    br = [w - 1 - rng.randint(0, half_w + 1),
          h - 1 - rng.randint(0, half_h + 1)]
    bl = [rng.randint(0, half_w + 1), h - 1 - rng.randint(0, half_h + 1)]
    start = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                     np.float32)
    end = np.array([tl, tr, br, bl], np.float32)
    return start, end


def warp_perspective(img, start, end):
    import cv2

    m = cv2.getPerspectiveTransform(start, end)
    h, w = img.shape[:2]
    return cv2.warpPerspective(img, m, (w, h))


def valid_bbox(start, end, wh):
    """Bounding box (x0, y0, x1, y1) of the warped image's valid region
    (replaces the reference's threshold+findContours on the warped gt)."""
    import cv2

    w, h = wh
    mask = warp_perspective(np.ones((h, w), np.float32), start, end)
    ys, xs = np.nonzero(mask > 0.5)
    if len(xs) == 0:
        return np.array([0, 0, w, h])
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])


@register_dataset("llff_refine")
class LLFFRefineDataset:
    """Modes: train, val, test_train, test."""

    def __init__(self, opt, mode):
        assert mode in ("train", "val", "test_train", "test")
        self.opt = opt
        self.mode = mode
        self.img_wh = tuple(opt.img_wh)
        self.plen = opt.patch_len
        self.rng = np.random.RandomState(opt.seed)

        # image list comes from the COLMAP model like the llff datasets
        from nerfsr_tpu.data.colmap import read_model
        _, imdata, _ = read_model(
            os.path.join(opt.dataset_root, "sparse/0"))
        names = sorted(im.name for im in imdata.values())
        self.image_paths = [
            os.path.join(opt.dataset_root, "images", n) for n in names]
        self.ref_idx = getattr(opt, "ref_idx", 0)

        if mode == "train":
            self._setup_train()
        elif mode in ("val", "test_train"):
            self._load_pairs()
            if mode == "test_train":
                self.locs = np.stack([
                    self._load_locs(i)
                    for i in range(len(self.image_paths))])
        else:  # test: spiral-path syntheses; ref = first train image
            self.sr_imgs = np.stack([
                self._load_syn(i) for i in range(self._n_test_syn())])
            self.ref_img = self._load_gt(self.image_paths[self.ref_idx])
            self.locs = np.stack([
                self._load_locs(i) for i in range(len(self.sr_imgs))])

    # -- loading helpers -----------------------------------------------
    def _load_gt(self, path):
        from nerfsr_tpu.data.blender import load_image
        return _to_norm(load_image(path, self.img_wh))

    def _load_syn(self, idx):
        from PIL import Image
        p = os.path.join(self.opt.syn_dataroot, f"{idx}-fine-ori.png")
        img = Image.open(p).convert("RGB")
        # synthesized strips may carry [pred | depth] panels; crop pred
        img = img.crop((0, 0, self.img_wh[0], self.img_wh[1]))
        return _to_norm(np.asarray(img, np.float32) / 255.0)

    def _load_locs(self, idx):
        z = np.load(os.path.join(self.opt.syn_dataroot,
                                 f"{idx}_locs.npz"))
        key = "arr_0" if "arr_0" in z else list(z.keys())[0]
        return z[key]

    def _n_test_syn(self):
        n = 0
        while os.path.exists(os.path.join(
                self.opt.syn_dataroot, f"{n}-fine-ori.png")):
            n += 1
        return n

    def _setup_train(self):
        w, h = self.img_wh
        gt = self._load_gt(self.image_paths[self.ref_idx])
        sr = self._load_syn(self.ref_idx)
        gts, srs, bboxes = [gt], [sr], [np.array([0, 0, w, h])]
        for _ in range(self.opt.aug_num - 1):
            start, end = random_perspective_params(
                w, h, self.opt.distort_scale, self.rng)
            gts.append(warp_perspective(gt, start, end))
            srs.append(warp_perspective(sr, start, end))
            bboxes.append(valid_bbox(start, end, self.img_wh))
        self.gt_imgs = np.stack(gts)
        self.sr_imgs = np.stack(srs)
        self.bboxes = np.stack(bboxes)
        self.gt_img = gt

    def device_buffers(self):
        """Train-mode image stacks for DEVICE-RESIDENT patch sampling
        (``RefineSystem.train_steps_scan``): uploaded to HBM once, after
        which each train step samples its patch batch inside the jitted
        program — no per-step host->device traffic (a 32-patch batch is
        ~16 MB, which costs ~1 s/step through a tunneled link)."""
        return {
            "sr_imgs": self.sr_imgs,
            "gt_imgs": self.gt_imgs,
            "gt_img": self.gt_img,
            "bboxes": np.asarray(self.bboxes, np.int32),
        }

    def _load_pairs(self):
        self.gt_imgs = np.stack([self._load_gt(p)
                                 for p in self.image_paths])
        self.sr_imgs = np.stack([self._load_syn(i)
                                 for i in range(len(self.image_paths))])
        self.ref_img = self.gt_imgs[self.ref_idx]

    # -- sampling ------------------------------------------------------
    def __len__(self):
        if self.mode == "train":
            return int(self.opt.data_num)
        if self.mode == "val":
            return len(self.image_paths)
        if self.mode == "test_train":
            return len(self.image_paths) * self.opt.test_img_split
        return len(self.sr_imgs) * self.opt.test_img_split

    def sample_train_batch(self, batch_size):
        """Random train batch: sr/gt patch + num_ref_patches nearby gt
        patches (reference __getitem__ train branch :214-238)."""
        plen = self.plen
        k = self.opt.num_ref_patches
        off = self.opt.ref_offset
        rng = self.rng
        sr_p = np.empty((batch_size, plen, plen, 3), np.float32)
        gt_p = np.empty_like(sr_p)
        ref_p = np.empty((batch_size, k, plen, plen, 3), np.float32)
        for b in range(batch_size):
            i = rng.randint(len(self.sr_imgs))
            x0, y0, x1, y1 = self.bboxes[i]
            xs = rng.randint(x0, max(x0 + 1, x1 - plen))
            ys = rng.randint(y0, max(y0 + 1, y1 - plen))
            sr_p[b] = self.sr_imgs[i][ys:ys + plen, xs:xs + plen]
            gt_p[b] = self.gt_imgs[i][ys:ys + plen, xs:xs + plen]
            rxl = max(x0, xs - off)
            rxh = min(x1 - plen, xs + off)
            ryl = max(y0, ys - off)
            ryh = min(y1 - plen, ys + off)
            for j in range(k):
                rx = rng.randint(rxl, max(rxl + 1, rxh))
                ry = rng.randint(ryl, max(ryl + 1, ryh))
                ref_p[b, j] = self.gt_img[ry:ry + plen, rx:rx + plen]
            if self.opt.with_gt_patch:
                ref_p[b, rng.randint(k)] = gt_p[b]
        return {"sr_patch": sr_p, "ref_patches": ref_p, "gt_patch": gt_p}

    def sample_val_item(self, idx):
        """One random aligned patch triple from image idx (val branch)."""
        plen = self.plen
        w, h = self.img_wh
        rng = self.rng
        i = idx % len(self.image_paths)
        # max(1, .): a patch spanning the full image dimension must
        # pin to 0, not crash randint(0, 0)
        xs = rng.randint(0, max(1, w - plen))
        ys = rng.randint(0, max(1, h - plen))
        k = self.opt.num_ref_patches
        ref_p = np.empty((k, plen, plen, 3), np.float32)
        rxl, rxh = max(0, xs - plen), min(w - plen, xs + plen)
        ryl, ryh = max(0, ys - plen), min(h - plen, ys + plen)
        for j in range(k):
            rx = rng.randint(rxl, max(rxl + 1, rxh))
            ry = rng.randint(ryl, max(ryl + 1, ryh))
            ref_p[j] = self.ref_img[ry:ry + plen, rx:rx + plen]
        return {
            "sr_patch": self.sr_imgs[i][ys:ys + plen, xs:xs + plen][None],
            "gt_patch": self.gt_imgs[i][ys:ys + plen, xs:xs + plen][None],
            "ref_patches": ref_p[None],
        }

    def tiles_for_image(self, img_idx):
        """All patches of one image with warp-located reference patches
        and start locations for stitching (test/test_train branches)."""
        plen = self.plen
        w, h = self.img_wh
        k = self.opt.num_ref_patches
        sr_img = self.sr_imgs[img_idx]
        gt_img = self.gt_imgs[img_idx] if hasattr(self, "gt_imgs") and \
            self.mode != "test" else None
        locs = self.locs[img_idx]

        srs, gts, refs, starts = [], [], [], []
        for i in range(0, w, plen):
            for j in range(0, h, plen):
                xs = min(w - plen, i)
                ys = min(h - plen, j)
                starts.append((xs, ys))
                srs.append(sr_img[ys:ys + plen, xs:xs + plen])
                if gt_img is not None:
                    gts.append(gt_img[ys:ys + plen, xs:xs + plen])
                # first k valid correspondences within the patch,
                # scanned column-major (x outer, y inner) like the
                # reference's loop — vectorized: mask the tile's loc
                # block and take the first k hits in that order.
                block = locs[ys:ys + plen, xs:xs + plen]   # [y, x, 2]
                flat = block.transpose(1, 0, 2).reshape(-1, 2)
                valid = ((flat[:, 0] >= 0) & (flat[:, 0] < w)
                         & (flat[:, 1] >= 0) & (flat[:, 1] < h))
                hits = flat[valid][:k]
                ref_patch = []
                for loc in hits:
                    rx = min(w - plen, int(loc[0]))
                    ry = min(h - plen, int(loc[1]))
                    ref_patch.append(
                        self.ref_img[ry:ry + plen, rx:rx + plen])
                while len(ref_patch) < k:
                    ref_patch.append(sr_img[ys:ys + plen, xs:xs + plen])
                refs.append(np.stack(ref_patch))
        out = {
            "sr_patch": np.stack(srs).astype(np.float32),
            "ref_patches": np.stack(refs).astype(np.float32),
            "start_locs": np.array(starts, np.int32),
            "wh": np.array(self.img_wh, np.int32),
            "patch_len": plen,
        }
        if gt_img is not None:
            out["gt_patch"] = np.stack(gts).astype(np.float32)
        return out

    def n_images(self):
        if self.mode == "test":
            return len(self.sr_imgs)
        return len(self.image_paths)
