"""Observability: artifact saving and scalar logging.

Capability parity with ``utils/visualizer.py`` of cwchenwang/NeRF-SR:
typed visual artifacts (image / images / gif / matrix), PNG/GIF writers,
depth-map colormapping + npz dumps (the ``{i}-fine-depth-ori.npz`` files
consumed by warp.py), and TensorBoard scalar logging — with a JSONL
metrics sink as the TPU-side default (TensorBoard attaches when the
package is importable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# visual artifacts
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Visualizee:
    """Typed artifact (parity: ``utils/visualizer.py:20-44``).

    kind: 'image' | 'images' | 'gif' | 'matrix'
    data: HWC float array(s) in ``range``, or raw matrix for 'matrix'.
    """

    kind: str
    data: Any
    name: str
    timestamp: bool = False
    range: tuple = (0, 1)
    img_format: str = "png"


def _to_uint8(img, rng=(0, 1)):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        # already display-quantized (device-side quantized eval readback,
        # NeRFSystem.render_pose(quantize_rgb=True)) — pass through so the
        # saved bytes match the f32 path's floor conversion exactly
        return img
    img = img.astype(np.float32)
    lo, hi = rng
    img = (img - lo) / (hi - lo + 1e-12)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_visuals(visuals: Sequence[Visualizee], out_dir: str,
                 prefix: str = ""):
    """Dispatch saver (parity: ``utils/visualizer.py:105-127``)."""
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    for v in visuals:
        stamp = f"-{int(time.time())}" if v.timestamp else ""
        base = f"{prefix}{v.name}{stamp}"
        if v.kind == "image":
            Image.fromarray(_to_uint8(v.data, v.range)).save(
                os.path.join(out_dir, f"{base}.{v.img_format}"))
        elif v.kind == "images":
            for i, im in enumerate(v.data):
                Image.fromarray(_to_uint8(im, v.range)).save(
                    os.path.join(out_dir, f"{base}-{i}.{v.img_format}"))
        elif v.kind == "gif":
            import imageio
            frames = [_to_uint8(im, v.range) for im in v.data]
            imageio.mimsave(os.path.join(out_dir, f"{base}.gif"), frames,
                            duration=0.1)
        elif v.kind == "pc":
            # point cloud: (N, 3) xyz or (N, 6) xyz+rgb -> .ply
            pts = np.asarray(v.data, np.float32)
            _write_ply(os.path.join(out_dir, f"{base}.ply"), pts)
        elif v.kind == "matrix":
            # npz + colormapped png (utils/visualizer.py:94-99); the npz is
            # the correspondence input for the refinement stage.
            mat = np.asarray(v.data)
            np.savez(os.path.join(out_dir, f"{base}.npz"), matrix=mat)
            lo, hi = v.range
            Image.fromarray(depth2im(mat, lo, hi)).save(
                os.path.join(out_dir, f"{base}.png"))
        else:
            raise ValueError(f"unknown visual kind {v.kind}")


def _write_ply(path, pts):
    """Minimal ascii PLY writer for point-cloud artifacts (parity with
    the reference's 'pc' Visualizee kind)."""
    has_rgb = pts.shape[-1] >= 6
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_rgb:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for p in pts:
            line = f"{p[0]} {p[1]} {p[2]}"
            if has_rgb:
                rgb = (np.clip(p[3:6], 0, 1) * 255).astype(int)
                line += f" {rgb[0]} {rgb[1]} {rgb[2]}"
            f.write(line + "\n")


def depth2im(depth, near, far):
    """near/far-normalized JET colormap (parity:
    ``utils/visualizer.py:164-176``). Returns uint8 HWC."""
    import cv2

    d = np.asarray(depth, np.float32)
    d = (d - near) / max(far - near, 1e-8)
    d = np.clip(d, 0, 1)
    im = cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


# ---------------------------------------------------------------------------
# scalar metrics
# ---------------------------------------------------------------------------

class MetricsWriter:
    """Console + JSONL (+ TensorBoard when available) scalar sink.

    Replaces ``create_writer`` (``utils/visualizer.py:15-17``); the JSONL
    stream at ``{summary_dir}/{name}/metrics.jsonl`` is the durable record.
    """

    def __init__(self, summary_dir: str, name: str):
        self.dir = os.path.join(summary_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}{k}", v, step)
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullMetricsWriter:
    """No-op scalar sink for non-master processes (the reference logs on
    rank 0 only, ``train.py:90``)."""

    def add_scalar(self, tag, value, step):
        pass

    def add_scalars(self, scalars, step, prefix=""):
        pass

    def close(self):
        pass
