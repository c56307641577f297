"""History buffer of generated images for discriminator updates.

Counterpart of the reference's ``utils/image_pool.py`` (the pix2pix
ImagePool): with probability 1/2 a query image is swapped with one from
the buffer, stabilizing GAN training by showing the discriminator a
mixture of current and historical generator outputs. Host-side numpy —
the buffer feeds batches into the jitted D step.
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.RandomState(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, C) freshly generated. Returns a same-shape
        batch mixing current and buffered images."""
        if self.pool_size <= 0:
            return images
        out = []
        for img in np.asarray(images):
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.rand() > 0.5:
                idx = self.rng.randint(len(self.images))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)
