"""PillarNet-LTS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
PillarNet / Pillar R-CNN point-cloud 3D detection framework.

Capability reference: VISION-SJTU/PillarNet-LTS (PyTorch+CUDA). This codebase is a
from-scratch TPU-first design, not a port:

- Dynamic pillar voxelization + PillarFeatureNet max-pooling run as fused,
  statically-shaped segment ops (XLA scatter / Pallas kernels) over padded point
  buffers instead of CUDA atomics over dynamically-sized buffers.
- The spconv sparse 2D BEV backbone is re-expressed as occupancy-masked dense
  convolutions (exact SubM / strided SparseConv semantics, incl. BatchNorm over
  active sites only) so all FLOPs land on the MXU.
- CenterHead decode + rotated/circular NMS run fully on device with fixed
  pre/post sizes -- no host sync until the final copy-out.
- Data parallelism is a `jax.sharding.Mesh` + jit sharding annotations; gradient
  reduction and cross-replica BatchNorm are compiler-inserted collectives.
"""

__version__ = "0.1.0"
