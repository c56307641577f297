"""Model zoo and experiment systems.

A plain-dict registry replaces the reference's importlib-by-name discovery
(``models/__init__.py:26-62``, ``utils/utils.py:155-175``).
"""

MODEL_REGISTRY = {}


def register_model(name):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def create_model(opt):
    """name -> system instance (parity: ``models/__init__.py:65-79``)."""
    # import for registration side effects
    import importlib
    for mod in ("nerf_system", "nerf_downx_system", "refine_system",
                "template_system"):
        try:
            importlib.import_module(f"nerfsr_tpu.models.{mod}")
        except ModuleNotFoundError as e:
            # tolerate only the system module ITSELF being absent
            # (trimmed installs); a broken import INSIDE it must
            # surface, not masquerade as "model not found"
            if e.name != f"nerfsr_tpu.models.{mod}":
                raise
    name = opt.model
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"model '{name}' not found; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](opt)
