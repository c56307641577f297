"""Checkpoint / resume.

Capability parity with ``models/base_model.py:85-110,181-219`` of
cwchenwang/NeRF-SR — per-epoch checkpoints plus a ``latest`` alias,
``--continue_train`` resume from latest or ``--load_epoch N``,
``--init_weights name:epoch`` cross-experiment initialization with an
``--init_weights_keys`` regex, and ``--fix_layers`` regex freezing —
upgraded in one way the reference lacks: **optimizer state and step are
saved too**, so resume is exact (the reference restarts Adam moments,
SURVEY.md §5).

Two serialization backends (``--ckpt_backend``):

- ``msgpack`` (default): single-file ``flax.serialization`` blobs with
  write-to-tmp + rename atomicity. Correct for this framework on any
  topology — params/opt_state are REPLICATED under the DP mesh (SURVEY
  §2.8: the reference has no model parallelism, so neither do we), so
  the master process holds the full state and saves it alone.
- ``orbax``: ``orbax.checkpoint.StandardCheckpointer`` directories
  (``{epoch}_state.orbax/``). Saves are ASYNC — the device→host copy
  is synchronous (safe w.r.t. donated-state reuse by the next scanned
  step) but the disk write happens in a background thread, so training
  does not stall on checkpoint IO (orbax's own commit protocol makes
  the directory rename atomic). ``wait_for_saves()`` barriers before
  process exit / immediate reload.

Resume dispatches on what is actually on disk, so switching backends
between runs keeps ``--continue_train`` working.
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


def _orbax_path(opt, epoch, name=None):
    d = _ckpt_dir(opt) if name is None else os.path.join(
        opt.checkpoints_dir, name)
    # orbax requires absolute paths
    return os.path.abspath(os.path.join(d, f"{epoch}_state.orbax"))


def _use_orbax(opt) -> bool:
    return getattr(opt, "ckpt_backend", "msgpack") == "orbax"


_ORBAX_CKPTR = None
_WARNED_ORBAX_MULTIHOST = False


def _orbax_ckptr():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp
        _ORBAX_CKPTR = ocp.StandardCheckpointer()
    return _ORBAX_CKPTR


def wait_for_saves() -> None:
    """Barrier for in-flight async (orbax) checkpoint writes. Call
    before process exit and before immediately reloading a checkpoint
    this process just saved. No-op for the msgpack backend."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


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
    if _use_orbax(opt):
        if jax.process_count() > 1:
            # StandardCheckpointer's save runs cross-process sync
            # barriers that EVERY process must join, but engine saves
            # are master-only (params are replicated under the DP
            # mesh) — orbax would deadlock at the first commit. Fall
            # back to the atomic msgpack writer on multi-controller
            # runs; resume reads either format.
            global _WARNED_ORBAX_MULTIHOST
            if not _WARNED_ORBAX_MULTIHOST:
                _WARNED_ORBAX_MULTIHOST = True
                print("[checkpoint] --ckpt_backend orbax falls back "
                      "to msgpack on multi-controller runs "
                      "(master-only saves would deadlock orbax's "
                      "cross-process barriers)")
        else:
            ckptr = _orbax_ckptr()
            path = _orbax_path(opt, epoch)
            ckptr.save(path, state, force=True)
            ckptr.save(_orbax_path(opt, "latest"), state, force=True)
            return path
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
    """Latest saved integer epoch whose checkpoint is loadable (parity:
    the max-epoch scan in ``models/base_model.py:89-94``; torn/corrupt
    files are skipped instead of crashing resume). Considers BOTH
    backends so resume survives a ``--ckpt_backend`` switch."""
    d = _ckpt_dir(opt)
    if not os.path.isdir(d):
        return None
    epochs = set()
    for fn in os.listdir(d):
        m = re.match(r"(\d+)_state\.(msgpack|orbax)$", fn)
        if m:
            epochs.add(int(m.group(1)))
    for epoch in sorted(epochs, reverse=True):
        if (checkpoint_is_valid(_path(opt, epoch))
                or os.path.isdir(_orbax_path(opt, epoch))):
            return epoch
    return None


def _resolve_ckpt_path(opt, epoch, name=None) -> str:
    """Pick the on-disk checkpoint for ``epoch``: prefer the configured
    backend's artifact, fall back to the other one if only that exists
    (resume after a backend switch). When BOTH exist, a torn msgpack
    file yields to its intact orbax sibling instead of crashing the
    load."""
    op = _orbax_path(opt, epoch, name)
    mp = _path(opt, epoch, name)
    order = (op, mp) if _use_orbax(opt) else (mp, op)
    existing = [p for p in order if os.path.exists(p)]
    if not existing:
        raise FileNotFoundError(order[0])
    if (len(existing) == 2 and existing[0].endswith(".msgpack")
            and not checkpoint_is_valid(existing[0])):
        return existing[1]
    return existing[0]


def _orbax_restore(path, state_template):
    template = jax.device_get(state_template)
    return _orbax_ckptr().restore(path, template)


def load_checkpoint(opt, state_template, epoch=None, name=None):
    """Restore a TrainState saved by save_checkpoint (either backend).

    epoch: int, or 'latest' (default = opt.load_epoch).
    name: other experiment name (for --init_weights).
    """
    epoch = epoch if epoch is not None else opt.load_epoch
    wait_for_saves()  # an in-flight async save must commit first
    path = _resolve_ckpt_path(opt, epoch, name)
    if path.endswith(".orbax"):
        try:
            return _orbax_restore(path, state_template)
        except Exception:
            if epoch != "latest" or name is not None:
                raise
            fallback = find_resume_epoch(opt)
            if fallback is None:
                raise
            return load_checkpoint(opt, state_template, epoch=fallback)
    try:
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(state_template, f.read())
    except Exception:
        # A torn ``latest`` (pre-atomic writer / external truncation):
        # fall back to the newest intact epoch file instead of
        # crashing. (Parsing directly and catching the failure avoids
        # a redundant full msgpack pre-validation parse on EVERY
        # resume of a potentially multi-hundred-MB state.)
        if epoch != "latest" or name is not None:
            raise
        fallback = find_resume_epoch(opt)
        if fallback is None:
            raise OSError(f"corrupt checkpoint {path} and no valid fallback")
        return load_checkpoint(opt, state_template, epoch=fallback)


def resume_if_requested(opt, state):
    """``--continue_train`` resume -> (state, start_epoch). One shared
    implementation for every training loop (engine.train and
    engine.train_refine previously each carried a drifting copy)."""
    if not getattr(opt, "continue_train", False):
        return state, 0
    resume = (int(opt.load_epoch) if opt.load_epoch != "latest"
              else find_resume_epoch(opt))
    if resume is None:
        return state, 0
    return load_checkpoint(opt, state, epoch=resume), resume


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
