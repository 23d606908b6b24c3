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


def pack_neighbors(features, prefer_pallas: bool = True):
    """Pre-pack every 2x2 bilinear-neighbor tile of a feature map into one
    4C-wide row: ``quads[b*H*W + y*W + x] = [f[y,x], f[y,x+1], f[y+1,x],
    f[y+1,x+1]]``.

    TPU gathers cost ~35 cycles/row regardless of row width, so fetching
    the 4 neighbors as ONE take of a 4C row beats 4 takes of C rows
    (~1.5x at serving shapes on v5e).  The pack itself reads/writes the
    whole map (~4x the map's bytes) — so when several recognition
    programs crop the same features (one per strip-width bucket), build
    the packed map ONCE inside the detection program and pass it to every
    bucket program via :func:`rroi_align_packed` instead of letting each
    one rebuild it (the round-4 profile showed the per-bucket rebuild
    dominating recognition device time at fine-bucket loads).

    Layout: the flat map is viewed as row PAIRS ``[B*H*W/2, 2C]`` so every
    concat operand is >= 128 lanes for the 64-channel focr (the naive
    [BHW, C]-operand concat lane-pads each 64-wide piece to 128 and
    moved ~3x the bytes: measured 12.2 -> 3.9 ms per 32x176x320x64 bf16
    map on v5e).  The 8-piece [n/2, 8C] output equals the [BHW, 4C] quad
    rows in row-major order.  Out-of-map neighbors read zeros (the
    original formulation wrapped around instead); both are masked to
    weight 0 by ``tile_weights``'s strict in-bounds rule, so crops are
    bit-identical.
    """
    b_count, height, width, channels = features.shape
    n = b_count * height * width
    c = channels
    if (prefer_pallas and width % 2 == 0 and 2 * c == 128
            and (n // 2) % 8 == 0 and _on_tpu()):
        # the hot serving case (64-ch focr): XLA's concat codegen moves
        # this at ~50-60 GB/s (measured 20-25 ms per 32x176x320x64 bf16
        # map on v5e, every formulation tried); the double-buffered
        # Pallas copy kernel streams it at HBM rate.  The custom-VJP
        # wrapper keeps the op differentiable (the training path
        # backprops through RoIRotate; Pallas kernels have no autodiff)
        return _pack_pallas_diff(features)
    return _pack_neighbors_xla(features)


@jax.custom_vjp
def _pack_pallas_diff(features):
    return _pack_neighbors_pallas(features)


def _pack_pallas_diff_fwd(features):
    return _pack_neighbors_pallas(features), features.shape


def _pack_pallas_diff_bwd(shape, g):
    """pack_neighbors is linear: quads[i] = [x[i], x[i+1], x[i+W],
    x[i+W+1]], so the cotangent of x[i] is the shifted sum of the four
    quad slots that read it.  Out-of-map slots (zero-filled forward)
    receive zero cotangent from the weight-masked gather downstream, so
    plain zero-fill shifts are exact."""
    b, h, w, c = shape
    n = b * h * w
    g = g.reshape(n, 4, c)

    def down(x, k):  # x[i-k] with zero fill
        if k == 0:
            return x
        return jnp.concatenate(
            [jnp.zeros((k, c), x.dtype), x[:-k]], axis=0)

    df = (g[:, 0] + down(g[:, 1], 1)
          + down(g[:, 2], w) + down(g[:, 3], w + 1))
    return (df.reshape(b, h, w, c),)


_pack_pallas_diff.defvjp(_pack_pallas_diff_fwd, _pack_pallas_diff_bwd)


def _pack_neighbors_xla(features):
    """Plain-XLA pack (rolled concats).  Out-of-map neighbor rows wrap
    around here (vs the Pallas kernel's zeros) — both are weight-masked
    by ``tile_weights``'s strict in-bounds rule, so crops are identical."""
    b_count, height, width, channels = features.shape
    n = b_count * height * width
    flat = features.reshape(n, channels)
    right = jnp.concatenate([flat[1:], flat[:1]], axis=0)
    pairs = jnp.concatenate([flat, right], axis=1)
    below = jnp.concatenate([pairs[width:], pairs[:width]], axis=0)
    return jnp.concatenate([pairs, below], axis=1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _pack_neighbors_pallas(features, interpret: bool = False):
    """Pallas streaming pack for the 64-channel case (row-pair view is
    exactly 128 lanes).  Pure DMA + VMEM lane-concat: each grid step
    copies an (R + W/2 + halo)-row window of the [n/2, 128] pair view
    in, assembles the [R, 512] quad-pair tile, and DMAs it out —
    bandwidth-bound by the 4C output write (measured ~70% of the chip's
    plain-copy rate vs ~60% for the best XLA concat formulation; worth
    ~11 ms/batch32 end-to-end at 704x1280 serving).  Out-of-map
    neighbors read zeros (the last window's halo is zeroed in VMEM);
    they are weight-masked downstream, see :func:`pack_neighbors`."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_count, height, width, channels = features.shape
    n = b_count * height * width
    n2, c, w2 = n // 2, channels, width // 2
    x2 = features.reshape(n2, 2 * c)

    # block rows: largest power-of-two divisor of n2 (exact division, so
    # only the LAST block's halo over-read needs special-casing), capped
    # to keep the 2x double-buffered scratch a few MB
    R = min(2048, n2 & -n2)
    halo = ((w2 + 1 + 7) // 8) * 8  # window tail, 8-row aligned for DMA
    if R < max(256, halo):
        return _pack_neighbors_xla(features)
    n_blocks = n2 // R
    full = R + halo

    def kernel(x_hbm, o_hbm, win, tile, t0, tE, tW, tF, in_sems, out_sems):
        # Double-buffered streaming copy: block i+1's window DMA is issued
        # before block i's compute, and the output DMA is waited two steps
        # later — the per-block DMA latency (~20 us each way on v5e) no
        # longer serializes (the single-buffered version ran at ~60 GB/s;
        # this one is HBM-bound).  The four row-shifted views become
        # VALUE copies at sublane-0 before the lane-concat (Mosaic
        # rejects lane-concat of operands at different sublane offsets).
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def start_in(b, s):
            # n_blocks == 1 must not even TRACE the full-window branch:
            # its (R + halo)-row slice is statically out of bounds then
            if n_blocks > 1:
                @pl.when(b < n_blocks - 1)
                def _():
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(b * R, full)], win.at[s],
                        in_sems.at[s]).start()

            @pl.when(b == n_blocks - 1)
            def _():
                # the last window's halo is past the map: zero it (the
                # out-of-map neighbor rows are weight-masked downstream)
                win[s, pl.ds(R, halo), :] = jnp.zeros(
                    (halo, 2 * c), win.dtype)
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(b * R, R)], win.at[s, pl.ds(0, R)],
                    in_sems.at[s]).start()

        def wait_in(b, s):
            if n_blocks > 1:
                @pl.when(b < n_blocks - 1)
                def _():
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(b * R, full)], win.at[s],
                        in_sems.at[s]).wait()

            @pl.when(b == n_blocks - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(b * R, R)], win.at[s, pl.ds(0, R)],
                    in_sems.at[s]).wait()

        def out_copy(b, s):
            return pltpu.make_async_copy(
                tile.at[s], o_hbm.at[pl.ds(b * R, R)], out_sems.at[s])

        @pl.when(i == 0)
        def _():
            start_in(i, slot)

        @pl.when(i + 1 < n_blocks)
        def _():
            start_in(i + 1, jax.lax.rem(i + 1, 2))

        wait_in(i, slot)

        if n_blocks > 2:
            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

        # materialize the shifted views at sublane offset 0 first: Mosaic
        # rejects lane-concat of operands at different sublane offsets
        t0[...] = win[slot, 0:R]
        tE[...] = win[slot, 1:R + 1]
        tW[...] = win[slot, w2:w2 + R]
        tF[...] = win[slot, w2 + 1:w2 + R + 1]
        tile[slot] = jnp.concatenate([
            t0[...],                                          # A,B
            tW[...],                                          # C,D
            jnp.concatenate([t0[:, c:], tE[:, :c]], axis=1),  # B,E
            jnp.concatenate([tW[:, c:], tF[:, :c]], axis=1),  # D,F
        ], axis=1)
        out_copy(i, slot).start()

        @pl.when(i == n_blocks - 1)
        def _():
            if n_blocks > 1:
                out_copy(i - 1, jax.lax.rem(i + 1, 2)).wait()
            out_copy(i, slot).wait()

    out2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n2, 8 * c), x2.dtype),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, full, 2 * c), x2.dtype),
            pltpu.VMEM((2, R, 8 * c), x2.dtype),
            pltpu.VMEM((R, 2 * c), x2.dtype),
            pltpu.VMEM((R, 2 * c), x2.dtype),
            pltpu.VMEM((R, 2 * c), x2.dtype),
            pltpu.VMEM((R, 2 * c), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2)
    return out2.reshape(n, 4 * c)


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
    return rroi_align_packed(pack_neighbors(features), features.shape, rois,
                             pooled_height, pooled_width, spatial_scale)


def rroi_align_packed(quads, feature_shape, rois, pooled_height: int,
                      pooled_width: int, spatial_scale: float = 1.0):
    """:func:`rroi_align` over a map pre-packed by :func:`pack_neighbors`.

    Args:
      quads: ``[B*H*W, 4C]`` packed neighbor rows.
      feature_shape: the original ``(B, H, W, C)`` (static).
    """
    b_count, height, width, channels = feature_shape
    # coordinate math stays in f32 even for bf16 features: bf16 has ~3
    # significant digits, far too coarse for pixel coordinates
    rois = rois.astype(jnp.float32)
    bin_cx, bin_cy, valid = _sample_centers(
        rois, pooled_height, pooled_width, spatial_scale, height, width
    )

    bidx = rois[:, 0].astype(jnp.int32)[:, None, None]

    x0 = jnp.floor(bin_cx)
    y0 = jnp.floor(bin_cy)
    rx = bin_cx - x0
    ry = bin_cy - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)

    xs = jnp.clip(xi, 0, width - 2)
    ys = jnp.clip(yi, 0, height - 2)

    def tile_weights(orig, start, frac, lim):
        """Weights per tile position.  The original neighbor j (at orig+j)
        lands at tile position j + (orig - start); clamping only shifts at
        the borders where the strict ``0 < idx < limit`` rule
        (kernel.cu:116-126) zeroes the out-of-tile neighbor anyway."""
        d = orig - start
        ok0 = ((orig > 0) & (orig < lim)).astype(jnp.float32)
        ok1 = ((orig + 1 > 0) & (orig + 1 < lim)).astype(jnp.float32)
        w0 = (1.0 - frac) * ok0
        w1 = frac * ok1
        t0 = jnp.where(d == 0, w0, 0.0) + jnp.where(d == -1, w1, 0.0)
        t1 = jnp.where(d == 1, w0, 0.0) + jnp.where(d == 0, w1, 0.0)
        return t0, t1

    wx0, wx1 = tile_weights(xi, xs, rx, width)
    wy0, wy1 = tile_weights(yi, ys, ry, height)

    idx = (bidx * height + ys) * width + xs
    g = jnp.take(quads, idx.reshape(-1), axis=0).reshape(
        idx.shape + (2, 2, channels))
    wdt = quads.dtype
    out = (
        g[..., 0, 0, :] * (wy0 * wx0)[..., None].astype(wdt)
        + g[..., 0, 1, :] * (wy0 * wx1)[..., None].astype(wdt)
        + g[..., 1, 0, :] * (wy1 * wx0)[..., None].astype(wdt)
        + g[..., 1, 1, :] * (wy1 * wx1)[..., None].astype(wdt)
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
