"""FOTS-TPU: a TPU-native (JAX/XLA/Pallas) text-spotting framework.

A ground-up re-design of the capabilities of chenjun2hao/FOTS.pytorch
(detection + recognition with a shared backbone, EAST-style geometry heads,
RoIRotate feature cropping, CTC recognition, locality-aware polygon NMS)
for TPU hardware:

- all device compute is JAX/XLA (NHWC layouts, static shapes, bucketed
  batching instead of per-box kernel launches);
- the RoIRotate op (reference: rroi_align/src/rroi_align_kernel.cu) is a
  batched gather/bilinear-interp program with a Pallas fast path;
- the locality-aware NMS (reference: nms/adaptor.cpp, nms/nms.h) is a
  vectorized on-device decode plus a small native C++ host merge;
- training runs as one pjit-compiled step over a `jax.sharding.Mesh`
  (data-parallel by default, tensor-parallel vocabulary head available).
"""

__version__ = "0.1.0"

from fots.codec import ICDAR15_ALPHABET, LabelCodec  # noqa: F401
