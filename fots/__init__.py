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


def enable_compilation_cache(path: str = "/root/.cache/fots_jax_cache"):
    """Persist compiled XLA programs across processes (huge win where
    compilation is remote/slow).  Safe to call multiple times.

    NOT called at import: jax 0.9's XLA:CPU AOT cache reload fails its own
    machine-feature check (+prefer-no-scatter pseudo-features recorded as
    required host features) and can SIGILL, so caching must be opted into
    by entry points that know they run on the TPU (fots.cli does)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from fots.codec import ICDAR15_ALPHABET, LabelCodec  # noqa: F401
