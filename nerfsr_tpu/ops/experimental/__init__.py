"""EXPERIMENTAL Pallas kernels — none are production paths.

Every kernel here was measured head-to-head against the XLA lowering on
the real v5e chip and LOST (or tied); the gather-free XLA path is the
production default everywhere. They are kept as tested baselines and
negative results, with regression tests in tests/test_pallas.py. Do not
enable any of these flags expecting a speedup.

Measured A/Bs (LLFF x2 SS flagship shapes, mixed bf16):

- ``pallas_sampling.py`` (``--use_pallas_sampling``, fused inverse-CDF
  resample): LOSES — NI=24 slim two-round 2.64 -> 3.29 ms/step; NI=16
  slim 2.05 -> 2.71 ms/step. The XLA compare-all searchsorted +
  ``select_along_axis`` one-hot gather is faster.
  Re-measure with tools/probe_pallas_sampling.py.
- ``pallas_composite.py`` (``--use_pallas``, fused alpha compositing):
  runs on device, loss-identical, NO speedup (XLA already fuses the
  composite chain).
- ``pallas_mlp.py`` (``--use_pallas_mlp``, fused MLP megakernel):
  fwd (posenc-outside v2) 9.9 ms ~= XLA's 8.8 ms at 393K points; the
  fully tile-aligned fused bwd crashes the remote AOT Mosaic compiler
  (internal limit on the combined ~30-matmul program), so
  ``--pallas_mlp_bwd xla`` (default) recomputes the backward in XLA.
  Raw-matmul probes: the chip does 157 TFLOP/s on 8192^3 but only
  ~33 TFLOP/s on the skinny (N,256)x(256,256) NeRF shapes — XLA's
  fused step is already near the practical ceiling for this
  architecture, which is why perf work went algorithmic
  (``--fast_sampling``) instead.
"""
