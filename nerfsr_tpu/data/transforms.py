"""pix2pix-style image preprocessing helpers (host-side numpy/cv2).

Capability parity with the transform half of the reference's
``data/base_dataset.py:51-145`` (``get_params`` / ``get_transform`` and
the ``__make_power_2 / __scale_width / __crop / __flip`` helpers) —
vestigial pix2pix-harness code that no NeRF-SR dataset calls. Notably,
the flags it reads (``opt.preprocess / load_size / crop_size /
no_flip``) are never registered by the reference's options, so the
reference version is UNCALLABLE as shipped; this rewrite takes the same
knobs as explicit arguments instead, making the capability actually
usable.

Images are numpy HWC, uint8 or float. ``convert=True`` maps to float32
CHW-free NHWC-convention (-1, 1) — the reference's
``ToTensor + Normalize(0.5, 0.5)``.
"""

from __future__ import annotations

import numpy as np

_WARNED_POWER2 = False


def _interp(method: str):
    import cv2

    return {"bicubic": cv2.INTER_CUBIC, "bilinear": cv2.INTER_LINEAR,
            "nearest": cv2.INTER_NEAREST, "lanczos": cv2.INTER_LANCZOS4,
            }[method]


def get_params(preprocess: str, size, load_size: int, crop_size: int,
               rng: np.random.RandomState | None = None):
    """Sample crop position + flip decision for one image (parity:
    ``data/base_dataset.py:51-66``). ``size`` is (w, h)."""
    rng = rng or np.random
    w, h = size
    new_w, new_h = w, h
    if preprocess == "resize_and_crop":
        new_w = new_h = load_size
    elif preprocess == "scale_width_and_crop":
        new_w = load_size
        new_h = load_size * h // w
    x = rng.randint(0, max(0, new_w - crop_size) + 1)
    y = rng.randint(0, max(0, new_h - crop_size) + 1)
    flip = rng.rand() > 0.5
    return {"crop_pos": (int(x), int(y)), "flip": bool(flip)}


def resize(img: np.ndarray, wh, method: str = "bicubic") -> np.ndarray:
    import cv2

    return cv2.resize(img, tuple(wh), interpolation=_interp(method))


def scale_width(img: np.ndarray, target_size: int, crop_size: int,
                method: str = "bicubic") -> np.ndarray:
    """Parity: ``__scale_width`` (:115-121)."""
    h, w = img.shape[:2]
    if w == target_size and h >= crop_size:
        return img
    new_w = target_size
    new_h = int(max(target_size * h / w, crop_size))
    return resize(img, (new_w, new_h), method)


def make_power_2(img: np.ndarray, base: int = 4,
                 method: str = "bicubic") -> np.ndarray:
    """Round H/W to a multiple of ``base`` (parity: ``__make_power_2``,
    :103-112, incl. the print-once warning)."""
    global _WARNED_POWER2
    h, w = img.shape[:2]
    nh = int(round(h / base) * base)
    nw = int(round(w / base) * base)
    if nh == h and nw == w:
        return img
    if not _WARNED_POWER2:
        print(f"The image size needs to be a multiple of {base}. "
              f"The loaded image size was ({w}, {h}), so it was adjusted "
              f"to ({nw}, {nh}).")
        _WARNED_POWER2 = True
    return resize(img, (nw, nh), method)


def crop(img: np.ndarray, pos, size: int) -> np.ndarray:
    """Parity: ``__crop`` (:124-130) — crops only when either image
    dimension is strictly larger than the target. PIL's ``Image.crop``
    zero-pads regions of the box outside the image, always returning a
    ``size x size`` result; the numpy equivalent is an explicit
    zero-filled canvas."""
    h, w = img.shape[:2]
    x, y = pos
    if w > size or h > size:
        out = np.zeros((size, size) + img.shape[2:], img.dtype)
        sub = img[y:y + size, x:x + size]
        out[:sub.shape[0], :sub.shape[1]] = sub
        return out
    return img


def flip(img: np.ndarray, do_flip: bool) -> np.ndarray:
    return img[:, ::-1] if do_flip else img


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma (torchvision Grayscale parity), kept HWC with C=1."""
    f = img.astype(np.float32)
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return g[..., None].astype(img.dtype)


def get_transform(preprocess: str = "resize_and_crop",
                  load_size: int = 286, crop_size: int = 256,
                  no_flip: bool = False, params: dict | None = None,
                  grayscale: bool = False, method: str = "bicubic",
                  convert: bool = True,
                  rng: np.random.RandomState | None = None):
    """Compose the reference's transform pipeline (parity:
    ``get_transform``, :69-101) as one callable over an HWC numpy image.

    Order matches the reference: grayscale -> resize/scale_width ->
    crop -> make_power_2 (preprocess == 'none') -> flip ->
    uint8->float32 (-1, 1).
    """
    rng = rng or np.random

    def apply(img: np.ndarray) -> np.ndarray:
        p = params
        if p is None and ("crop" in preprocess or not no_flip):
            h, w = img.shape[:2]
            p = get_params(preprocess, (w, h), load_size, crop_size,
                           rng if isinstance(rng, np.random.RandomState)
                           else None)
        out = to_grayscale(img) if grayscale else img
        if "resize" in preprocess:
            out = resize(out, (load_size, load_size), method)
        elif "scale_width" in preprocess:
            out = scale_width(out, load_size, crop_size, method)
        if "crop" in preprocess:
            out = crop(out, p["crop_pos"], crop_size)
        if preprocess == "none":
            out = make_power_2(out, base=4, method=method)
        if not no_flip:
            out = flip(out, p["flip"])
        if out.ndim == 2:
            out = out[..., None]
        if convert:
            f = out.astype(np.float32)
            if np.issubdtype(out.dtype, np.integer):
                f = f / 255.0
            out = f * 2.0 - 1.0
        return np.ascontiguousarray(out)

    return apply
