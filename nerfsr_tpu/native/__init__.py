"""ctypes bindings for the native ray-buffer builder (raygen.cpp).

``build_rays`` computes world-space (optionally NDC-warped) rays for a
stack of poses, multithreaded in C++ — the TPU-host replacement for the
reference datasets' Python per-image ray precompute loops. Falls back to
the numpy implementations in ``nerfsr_tpu.data`` when the shared library
hasn't been built (``tools/build_native.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libraygen.so")
_lib: Optional[ctypes.CDLL] = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.build_rays.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            f32p, f32p, ctypes.c_int,
        ]
        lib.group_subpixels.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p,
        ]
        _lib = lib
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_rays(c2w: np.ndarray, h: int, w: int, focal: float,
               use_pixel_centers: bool = True, apply_ndc: bool = False,
               ndc_near: float = 1.0, n_threads: int = 0):
    """(n_img, 3, 4) poses -> origins, dirs each (n_img, h, w, 3).

    Matches ``data.blender.rays_from_pose`` (+ ``data.llff.ndc_rays_np``
    when apply_ndc) exactly; see tests/test_native.py.
    """
    lib = _load()
    c2w = np.ascontiguousarray(c2w, np.float32)
    n_img = c2w.shape[0]
    origins = np.empty((n_img, h, w, 3), np.float32)
    dirs = np.empty((n_img, h, w, 3), np.float32)
    if lib is None:
        from nerfsr_tpu.data.blender import _ray_dirs_np, rays_from_pose
        from nerfsr_tpu.data.llff import ndc_rays_np
        cam_dirs = _ray_dirs_np(h, w, focal, use_pixel_centers)
        for i in range(n_img):
            ro, rd = rays_from_pose(cam_dirs, c2w[i])
            if apply_ndc:
                ro, rd = ndc_rays_np(h, w, focal, ndc_near,
                                     ro.reshape(-1, 3), rd.reshape(-1, 3))
                ro, rd = ro.reshape(h, w, 3), rd.reshape(h, w, 3)
            origins[i], dirs[i] = ro, rd
        return origins, dirs
    lib.build_rays(_ptr(c2w), n_img, h, w, float(focal),
                   int(use_pixel_centers), int(apply_ndc),
                   float(ndc_near), _ptr(origins), _ptr(dirs),
                   int(n_threads))
    return origins, dirs
