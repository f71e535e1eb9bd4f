"""oryon_tpu — a TPU-native (JAX/XLA/Pallas) open-vocabulary 6D pose framework.

Re-designed from scratch with the capabilities of the reference Oryon pipeline
(CVPR'24): CLIP-driven open-vocabulary segmentation + dense feature matching
between an anchor and a query RGBD view, lifted to a relative 6D pose via
spectral registration (PointDSC) or RANSAC/Kabsch, scored with BOP metrics.

Design stance (TPU-first, not a port):
  * every stage is a pure function over statically-shaped, batched arrays;
  * variable-size structures (mask pixels, correspondences) become
    fixed-capacity buffers + validity masks;
  * the hot paths (cost volume, window attention, masked NN matching,
    batched registration) run fused under jit, with Pallas kernels where
    XLA fusion is not enough;
  * scaling is a `jax.sharding.Mesh` data-parallel axis over ICI, not DDP.
"""

__version__ = "0.1.0"
