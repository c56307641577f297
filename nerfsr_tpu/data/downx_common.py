"""Shared sub-pixel grouping / downscaling helpers for the supersampling
datasets (parity with the einops grouping convention
``'(h s1) (w s2) c -> (h w) (s1 s2) c'`` used in
``data/blender_downX_dataset.py:139-157`` and
``data/llff_downX_dataset.py:351-357``)."""

from __future__ import annotations

import numpy as np


def group_subpixels(arr: np.ndarray, ds: int) -> np.ndarray:
    """(H, W, C) -> (H/ds * W/ds, ds*ds, C): each LR pixel's ds^2 HR
    sub-elements, in row-major order within the block."""
    h, w = arr.shape[:2]
    c = arr.shape[2:]
    x = arr.reshape((h // ds, ds, w // ds, ds) + c)
    x = np.moveaxis(x, 1, 2)  # (h1, w1, ds, ds, C)
    return x.reshape((h // ds * (w // ds), ds * ds) + c)


def ungroup_subpixels(arr: np.ndarray, hw, ds: int) -> np.ndarray:
    """Inverse of group_subpixels: (N_lr, ds^2, C) -> (H, W, C)."""
    h, w = hw
    c = arr.shape[2:]
    x = arr.reshape((h // ds, w // ds, ds, ds) + c)
    x = np.moveaxis(x, 2, 1)
    return x.reshape((h, w) + c)


def downscale_pil(img, ds: int, method: str):
    """Downscale a PIL image by ds with 'lanc' (Lanczos) or 'avg'
    (average pooling). Returns a float32 numpy array in [0, 1] with the
    original channel count."""
    from PIL import Image

    w, h = img.size
    if method == "lanc":
        small = img.resize((w // ds, h // ds), Image.LANCZOS)
        return np.asarray(small, np.float32) / 255.0
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    hh, ww = (h // ds) * ds, (w // ds) * ds
    arr = arr[:hh, :ww]
    return arr.reshape(h // ds, ds, w // ds, ds, -1).mean((1, 3))


def blend_white(arr: np.ndarray) -> np.ndarray:
    """RGBA -> RGB over white (blender convention)."""
    if arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:]
        return rgb * a + (1.0 - a)
    return arr
