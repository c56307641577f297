"""Data layer.

TPU-first redesign of the reference's dataset stack (``data/__init__.py``,
``data/*_dataset.py``): instead of a torch DataLoader that ships ray
batches host->device every step, each dataset produces

- a flat numpy **ray buffer** for training (uploaded to HBM once; batches
  are gathered *inside* the jitted train step), and
- per-image ray dicts for val/test rendering.

A plain dict registry replaces importlib-by-name discovery
(``data/__init__.py:18-38``).
"""

DATASET_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def create_dataset(opt, mode: str):
    """name -> dataset instance (parity: ``data/__init__.py:68-79``)."""
    import importlib
    for mod in ("blender", "llff", "blender_downx", "llff_downx", "refine",
                "template"):
        try:
            importlib.import_module(f"nerfsr_tpu.data.{mod}")
        except ModuleNotFoundError as e:
            # tolerate only the dataset module ITSELF being absent
            # (trimmed installs); a broken import INSIDE it must
            # surface, not masquerade as "dataset not found"
            if e.name != f"nerfsr_tpu.data.{mod}":
                raise
    name = opt.dataset_mode
    if name not in DATASET_REGISTRY:
        raise KeyError(
            f"dataset '{name}' not found; available: "
            f"{sorted(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[name](opt, mode)
