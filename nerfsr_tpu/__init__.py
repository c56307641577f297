"""NeRF-SR TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of cwchenwang/NeRF-SR (NeRF-SR: High-Quality Neural Radiance
Fields using Supersampling, ACM MM 2022).

Built from scratch, TPU-first:

- the whole render path (embed -> MLP -> composite -> resample -> MLP ->
  composite) is one fused XLA program per training step — no host-side
  chunking (reference: ``utils/utils.py:130-152`` chunk_batch);
- rays live on device in HBM and batches are gathered *inside* jit, so a
  training step does zero host<->device transfers;
- scaling is a 1-D ``jax.sharding.Mesh`` over the ray batch with XLA
  collectives — the TPU equivalent of the reference's
  DataParallel/DDP+NCCL (``utils/distributed.py``, ``models/networks.py:47-86``).
"""

__version__ = "0.1.0"
