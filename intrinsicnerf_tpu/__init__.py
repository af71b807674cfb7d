"""IntrinsicNeRF-TPU: a TPU-native (JAX/XLA/Pallas) intrinsic-decomposition NeRF framework.

A from-scratch re-design of the capabilities of zju3dv/IntrinsicNeRF
(hierarchical coarse/fine volume rendering with intrinsic heads
``rgb = albedo * shading + residual``, distance-aware intrinsic priors on
neighbor-paired ray batches, iterative adaptive reflectance clustering,
semantic supervision, and an editing/recoloring pipeline), built
TPU-first: pure jitted functions over pytrees, sharding over device
meshes instead of chunk loops, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
