"""NU-NeRF TPU: a TPU-native (JAX/XLA/Pallas) framework for neural reconstruction
of nested transparent objects.

Re-designed from scratch for TPU hardware with the capabilities of the reference
PyTorch+CUDA/OptiX implementation (jjjkkyz/NU-NeRF):

* Stage 1: outer transparent surface as a NeuS-style neural SDF with a
  physically-motivated shading network and a NeRF++ background.
* Stage 2: inner object reconstruction by differentiable refractive ray tracing
  through the extracted outer mesh (zero-thickness and curvature-aware shell).

Design principles (TPU-first):
* everything under ``jit`` is static-shape, masked (no boolean-indexing
  compaction); volume rendering transmittance is a parallel scan;
* the mesh intersection runs on-chip (XLA/Pallas BVH traversal) instead of the
  reference's GPU->CPU->OptiX round trip;
* multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with rays
  sharded over the ``data`` axis and parameters replicated (psum gradients).
"""

__version__ = "0.1.0"
