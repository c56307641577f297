"""Checkpoint / resume.

Capability parity with ``models/base_model.py:85-110,181-219`` of
cwchenwang/NeRF-SR — per-epoch checkpoints plus a ``latest`` alias,
``--continue_train`` resume from latest or ``--load_epoch N``,
``--init_weights name:epoch`` cross-experiment initialization with an
``--init_weights_keys`` regex, and ``--fix_layers`` regex freezing —
upgraded in one way the reference lacks: **optimizer state and step are
saved too**, so resume is exact (the reference restarts Adam moments,
SURVEY.md §5).

Serialization is msgpack via ``flax.serialization`` (single-host;
orbax can be swapped in for multi-host async checkpointing later).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.serialization
import jax


def _ckpt_dir(opt):
    return os.path.join(opt.checkpoints_dir, opt.name)


def _path(opt, epoch, name=None):
    d = _ckpt_dir(opt) if name is None else os.path.join(
        opt.checkpoints_dir, name)
    return os.path.join(d, f"{epoch}_state.msgpack")


def _atomic_write(path: str, blob: bytes) -> None:
    """Write-to-tmp + fsync + ``os.replace`` so a crash mid-write can
    never leave a torn file at ``path`` (the reference writes in place,
    ``models/base_model.py:181-196``, so a crash corrupts ``latest``)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(opt, state, epoch) -> str:
    """Save params+opt_state+step as ``{epoch}_state.msgpack`` and refresh
    ``latest_state.msgpack`` (parity: save_networks + the latest copy,
    ``models/base_model.py:181-196``, ``train.py:133-136``). Both writes
    are atomic (tmp + rename), so ``--continue_train`` always finds a
    loadable ``latest`` even if the process dies mid-save."""
    os.makedirs(_ckpt_dir(opt), exist_ok=True)
    state = jax.device_get(state)
    blob = flax.serialization.to_bytes(state)
    path = _path(opt, epoch)
    _atomic_write(path, blob)
    _atomic_write(_path(opt, "latest"), blob)
    return path


def checkpoint_is_valid(path: str) -> bool:
    """Cheap integrity check: the blob must parse as msgpack end to end.

    Files written by ``save_checkpoint`` are atomic, so torn files only
    arise from older writers or external truncation — but resume must
    never pick one (``find_resume_epoch`` skips invalid candidates)."""
    try:
        with open(path, "rb") as f:
            flax.serialization.msgpack_restore(f.read())
        return True
    except Exception:
        return False


def find_resume_epoch(opt) -> Optional[int]:
    """Latest saved integer epoch whose file is loadable (parity: the
    max-epoch scan in ``models/base_model.py:89-94``; torn/corrupt files
    are skipped instead of crashing resume)."""
    d = _ckpt_dir(opt)
    if not os.path.isdir(d):
        return None
    epochs = []
    for fn in os.listdir(d):
        m = re.match(r"(\d+)_state\.msgpack$", fn)
        if m:
            epochs.append(int(m.group(1)))
    for epoch in sorted(epochs, reverse=True):
        if checkpoint_is_valid(_path(opt, epoch)):
            return epoch
    return None


def load_checkpoint(opt, state_template, epoch=None, name=None):
    """Restore a TrainState saved by save_checkpoint.

    epoch: int, or 'latest' (default = opt.load_epoch).
    name: other experiment name (for --init_weights).
    """
    epoch = epoch if epoch is not None else opt.load_epoch
    path = _path(opt, epoch, name)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if epoch == "latest" and name is None and not checkpoint_is_valid(path):
        # A torn ``latest`` (pre-atomic writer / external truncation):
        # fall back to the newest intact epoch file instead of crashing.
        fallback = find_resume_epoch(opt)
        if fallback is None:
            raise OSError(f"corrupt checkpoint {path} and no valid fallback")
        path = _path(opt, fallback)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(state_template, f.read())


def init_weights_from(opt, state, state_template):
    """Cross-experiment init: ``--init_weights name:epoch`` with
    ``--init_weights_keys`` regex filtering over flattened param paths
    (parity: ``models/base_model.py:85-87``)."""
    if not opt.init_weights:
        return state
    name, _, epoch = opt.init_weights.partition(":")
    other = load_checkpoint(opt, state_template, epoch=epoch or "latest",
                            name=name)
    pattern = re.compile(opt.init_weights_keys)

    flat_self = _flatten(state.params)
    flat_other = _flatten(other.params)
    for k in flat_self:
        if k in flat_other and pattern.search(k):
            if flat_self[k].shape == flat_other[k].shape:
                flat_self[k] = flat_other[k]
    params = _unflatten(flat_self, state.params)
    return state.replace(params=params)


def fix_layers_mask(opt, params) -> Any:
    """Boolean pytree: True where params should be FROZEN
    (``--fix_layers`` regex over flattened paths, parity:
    ``models/base_model.py:96-103``). Feed to ``optax.masked`` /
    zero-update wrappers."""
    if not opt.fix_layers:
        return jax.tree_util.tree_map(lambda _: False, params)
    pattern = re.compile(opt.fix_layers)
    flat = _flatten(params)
    mask_flat = {k: bool(pattern.search(k)) for k in flat}
    return _unflatten(mask_flat, params, leaves_from=mask_flat)


def _flatten(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_key_str(p) for p in path)
        flat[key] = leaf
    return flat


def _key_str(p):
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _unflatten(flat, template, leaves_from=None):
    src = leaves_from if leaves_from is not None else flat
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, _ in paths:
        key = "/".join(_key_str(p) for p in path)
        leaves.append(src[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)
