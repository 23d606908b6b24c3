"""RoIRotate: crop rotated boxes from feature maps into axis-aligned strips.

TPU-native re-design of the reference CUDA op
(rroi_align/src/rroi_align_kernel.cu:28-187).  Instead of one CUDA thread
per output element, the whole op is a single batched XLA program:
coordinates for every (roi, ph, pw) cell are computed with broadcasted
arithmetic and the 4 bilinear neighbors are fetched with one gather each —
XLA lowers this to TPU-native dynamic-gather; the backward pass is the
exact scatter-add adjoint via autodiff (replacing the hand-written
atomicAdd backward, rroi_align_kernel.cu:193-278).

Sampling semantics match the reference kernel exactly:
- roi = [batch_idx, cx, cy, h, w, angle_degrees] (kernel.cu:58-65)
- aspect-preserving valid width ``roi_pooled_width = ph * w / h``; columns
  beyond it are zero (kernel.cu:68,107)
- each output cell samples the *center* of its source bin, where the bin
  corner coordinates are rounded (half away from zero) and clamped before
  averaging (kernel.cu:86-105)
- bilinear neighbors with index 0 excluded (strict ``> 0`` bound,
  kernel.cu:116-126)

Layout note: features are NHWC (TPU-native); the reference is NCHW.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PI = 3.1415926535  # keep the reference's literal (kernel.cu:65)


def _round_half_away(x):
    """C round(): halfway cases away from zero (jnp.round is half-to-even)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _sample_centers(rois, pooled_height, pooled_width, spatial_scale, height, width):
    """Bin-center source coordinates for every (roi, ph, pw) cell.

    Returns (bin_cx, bin_cy) each [N, ph, pw], plus the per-cell validity
    mask [N, 1, pw] (``pw <= roi_pooled_width``).
    """
    cx = rois[:, 1][:, None, None]
    cy = rois[:, 2][:, None, None]
    h = rois[:, 3][:, None, None]
    w = rois[:, 4][:, None, None]
    angle = rois[:, 5][:, None, None] / 180.0 * PI

    # degenerate rois (h<=0 or w<=0) produce NaN in the reference CUDA
    # kernel; here they are masked out entirely instead
    roi_ok = (h > 0) & (w > 0)
    h = jnp.where(roi_ok, h, 1.0)
    w = jnp.where(roi_ok, w, 1.0)

    roi_pw = pooled_height * w / h
    dx = -roi_pw / 2.0
    dy = -pooled_height / 2.0
    sx = w * spatial_scale / roi_pw
    sy = h * spatial_scale / pooled_height
    alpha = jnp.cos(angle)
    beta = jnp.sin(angle)
    gx = cx * spatial_scale
    gy = cy * spatial_scale

    m00 = alpha * sx
    m01 = beta * sy
    m02 = alpha * sx * dx + beta * sy * dy + gx
    m10 = -beta * sx
    m11 = alpha * sy
    m12 = -beta * sx * dx + alpha * sy * dy + gy

    ph_idx = jnp.arange(pooled_height, dtype=rois.dtype)[None, :, None]
    pw_idx = jnp.arange(pooled_width, dtype=rois.dtype)[None, None, :]

    def corner(pw_off, ph_off):
        px = m00 * (pw_idx + pw_off) + m01 * (ph_idx + ph_off) + m02
        py = m10 * (pw_idx + pw_off) + m11 * (ph_idx + ph_off) + m12
        return px, py

    p0x, p0y = corner(0.0, 0.0)
    p1x, p1y = corner(0.0, 1.0)
    p2x, p2y = corner(1.0, 0.0)
    p3x, p3y = corner(1.0, 1.0)

    left = jnp.maximum(_round_half_away(jnp.minimum(jnp.minimum(p0x, p1x), jnp.minimum(p2x, p3x))), 0.0)
    right = jnp.minimum(_round_half_away(jnp.maximum(jnp.maximum(p0x, p1x), jnp.maximum(p2x, p3x))), width - 1.0)
    top = jnp.maximum(_round_half_away(jnp.minimum(jnp.minimum(p0y, p1y), jnp.minimum(p2y, p3y))), 0.0)
    bottom = jnp.minimum(_round_half_away(jnp.maximum(jnp.maximum(p0y, p1y), jnp.maximum(p2y, p3y))), height - 1.0)

    bin_cx = (left + right) / 2.0
    bin_cy = (top + bottom) / 2.0
    valid = (pw_idx <= roi_pw) & roi_ok  # [N,1,pw] broadcast over ph
    return bin_cx, bin_cy, valid


@functools.partial(
    jax.jit, static_argnames=("pooled_height", "pooled_width", "spatial_scale")
)
def rroi_align(features, rois, pooled_height: int, pooled_width: int, spatial_scale: float = 1.0):
    """Crop + rotate + scale rois out of a feature map.

    Args:
      features: ``[B, H, W, C]`` (NHWC).
      rois: ``[N, 6]`` float rows ``[batch_idx, cx, cy, h, w, angle_deg]``
        in input-image coordinates (scaled by ``spatial_scale`` internally).
      pooled_height / pooled_width: static output strip size.
      spatial_scale: feature-map stride relative to the roi coordinates
        (1/4 when cropping the shared 1/4-scale OCR features).

    Returns:
      ``[N, pooled_height, pooled_width, C]`` strips; columns beyond each
      roi's aspect-preserving width are zero.
    """
    b_count, height, width, channels = features.shape
    del channels
    # coordinate math stays in f32 even for bf16 features: bf16 has ~3
    # significant digits, far too coarse for pixel coordinates
    rois = rois.astype(jnp.float32)
    bin_cx, bin_cy, valid = _sample_centers(
        rois, pooled_height, pooled_width, spatial_scale, height, width
    )

    bidx = rois[:, 0].astype(jnp.int32)[:, None, None]

    x0 = jnp.floor(bin_cx)
    y0 = jnp.floor(bin_cy)
    x1 = jnp.ceil(bin_cx)
    y1 = jnp.ceil(bin_cy)
    rx = bin_cx - x0
    ry = bin_cy - y0

    flat = features.reshape(b_count * height * width, -1)

    def fetch(yi, xi):
        # neighbor contributes only when 0 < idx < limit (kernel.cu:116-126)
        ok = (yi > 0) & (xi > 0) & (yi < height) & (xi < width)
        yc = jnp.clip(yi.astype(jnp.int32), 0, height - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, width - 1)
        idx = (bidx * height + yc) * width + xc
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (flat.shape[-1],))
        return vals * ok[..., None].astype(features.dtype)

    wdt = features.dtype
    wlt = ((1.0 - rx) * (1.0 - ry))[..., None].astype(wdt)
    wrt = (rx * (1.0 - ry))[..., None].astype(wdt)
    wrb = (rx * ry)[..., None].astype(wdt)
    wlb = ((1.0 - rx) * ry)[..., None].astype(wdt)

    out = (
        fetch(y0, x0) * wlt
        + fetch(y0, x1) * wrt
        + fetch(y1, x1) * wrb
        + fetch(y1, x0) * wlb
    )
    return out * valid[..., None].astype(wdt)


def pooled_width_for(rois, pooled_height: int) -> int:
    """Host helper: max aspect-preserving width, ceil'd (reference
    src/ocr_process.py:260-263).  Use with bucketing to keep shapes static."""
    import math

    import numpy as np

    r = np.asarray(rois)
    ratio = (r[:, 4] / r[:, 3]).max()
    return int(math.ceil(pooled_height * float(ratio)))


def width_bucket(width: int, buckets=(32, 64, 96, 128, 160, 192, 256, 320, 416, 512)) -> int:
    """Snap a pooled width to a small set of compiled bucket shapes.

    TPU replacement for per-batch dynamic ``pooled_width`` (the reference
    recompiles nothing but launches dynamic kernels; XLA instead compiles
    one program per bucket — the bucket grid mirrors the spirit of
    ocr_gen.py:19-21's ``8+4i`` width buckets, coarsened to stay cache- and
    lane-friendly).
    """
    for b in buckets:
        if width <= b:
            return b
    return buckets[-1]
