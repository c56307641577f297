"""Device-mesh data parallelism.

This module is the TPU-native replacement for the reference's ENTIRE
parallelism stack (SURVEY.md §2.8): ``torch.nn.DataParallel`` scatter/
gather (``models/networks.py:54-69``), DDP + NCCL process groups
(``utils/distributed.py``, ``models/networks.py:72-86``) and the
``DistributedSampler`` batch splitting (``data/__init__.py:95-133``).

On TPU all of that collapses into a 1-D ``jax.sharding.Mesh`` over the ray
batch: parameters are replicated, the batch is sharded on axis ``data``,
and XLA inserts the gradient all-reduce (psum over ICI) automatically when
the jitted loss reduces over the sharded axis. The same code path runs on
1 chip, a v4-8 slice, or multi-host (via ``jax.distributed.initialize``).

The NeRF batch has no sequence/tensor axes worth sharding (a 0.6M-param
MLP; samples along a ray interact only through a length-192 prefix
product), so batch-DP is the whole story — see SURVEY.md §5.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization (the TPU equivalent of the reference's
    ``utils/distributed.py:5-18`` setup_env: no process groups or NCCL —
    ``jax.distributed.initialize`` wires DCN and ``jax.devices()`` spans
    the slice; the same mesh code then runs unchanged)."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def is_master() -> bool:
    """Process-0 check for logging/checkpointing (parity:
    ``opt.is_master``, ``options/base_options.py:150``)."""
    return jax.process_index() == 0


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """Create a 1-D data-parallel mesh over local (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices and n_devices > 0:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh]):
    """Constrain a pytree of (N, ...) arrays to be row-sharded over the mesh.

    Called inside jit: XLA propagates the sharding through the whole render
    step, so each chip evaluates its own slice of rays and only the scalar
    loss / replicated grads communicate (psum over ICI).
    """
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return batch
    spec = P(DATA_AXIS)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)),
        batch,
    )


def replicate(tree, mesh: Optional[Mesh]):
    """Place a pytree fully replicated on the mesh (params/opt state).

    Multi-controller safe: when the mesh spans processes, every process
    holds the full (identical) host value and the global array is
    assembled from the process-local copies."""
    if mesh is None:
        return tree
    sh = replicated_sharding(mesh)
    if mesh_spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.device_put(tree, sh)


def mesh_spans_processes(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and len(
        {d.process_index for d in mesh.devices.flat}) > 1


def to_device_buffer(tree, mesh: Optional[Mesh]):
    """Upload a host pytree (e.g. the ray buffer, identical on every
    process) as fully-replicated device arrays valid under the mesh.

    Single-process: plain ``jnp.asarray`` (the jitted step's sharding
    constraints handle placement). Multi-controller: the buffer must be
    a GLOBAL array addressable by the global-mesh program, so it is
    assembled replicated from each process's identical copy."""
    import jax.numpy as jnp

    if mesh is not None and mesh_spans_processes(mesh):
        sh = replicated_sharding(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(jnp.asarray, tree)
