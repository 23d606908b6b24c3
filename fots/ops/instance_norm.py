"""Fused instance normalization (+ affine + optional leaky-relu).

Instance norm is the most frequent op in this model family (every stem /
residual / recognition block, reference tools/models.py:45,91,98,274-279).
A naive mean -> var -> normalize schedule touches HBM 3-4 times; this
module provides:

- a single-pass jnp formulation (sum + sum-of-squares in one read, then a
  fused normalize+activation pass): 3 HBM touches, used on CPU and as the
  autodiff path;
- a Pallas TPU kernel that keeps one (batch, channel-tile) block resident
  in VMEM and does stats + normalize + affine + activation in ONE read and
  ONE write (2 HBM touches), exposed through custom_vjp (backward runs the
  jnp math on saved residuals).

Non-affine instance norm passes scale=1, bias=0 (numerically identical).
Channel tiles are sized to fit VMEM; channels here are powers of two
(16..512) so tiles always divide evenly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 14 * 1024 * 1024  # total VMEM budget for one grid step


def instance_norm_jnp(x, scale, bias, eps=1e-5, negative_slope=None):
    """NHWC instance norm in f32 with single-pass sum/sumsq stats."""
    x32 = x.astype(jnp.float32)
    n = x32.shape[1] * x32.shape[2]
    s1 = jnp.sum(x32, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    if negative_slope is not None:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y.astype(x.dtype)


def masked_instance_norm_jnp(x, valid_w, scale=None, bias=None, eps=1e-5,
                             negative_slope=None):
    """Instance norm with per-sample statistics over columns < ``valid_w``.

    x: [N, H, W, C]; valid_w: [N] int (1..W).  Statistics ignore the
    padding columns of a bucketed strip, and the output's padding columns
    are re-zeroed — together this makes the normalized features of a roi
    INDEPENDENT of the bucket width it was batched into (the unmasked IN's
    statistics shift with the padding fraction, which measurably corrupts
    recognition when serve-time buckets differ from train-time buckets).

    Equals instance_norm_jnp followed by re-zeroing when valid_w == W and
    the input's padding columns are zero.
    """
    x32 = x.astype(jnp.float32)
    n_, h, w, c = x32.shape
    mask = (jnp.arange(w)[None, :] < valid_w[:, None]).astype(jnp.float32)
    mask = mask[:, None, :, None]                       # [N,1,W,1]
    xm = x32 * mask
    n = (h * valid_w).astype(jnp.float32)[:, None, None, None]
    s1 = jnp.sum(xm, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(xm * xm, axis=(1, 2), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    if negative_slope is not None:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return (y * mask).astype(x.dtype)


def _channel_tile(h, w, c, itemsize):
    """Largest legal channel tile, or 0 if the Pallas kernel can't apply.

    TPU lowering requires the last block dim to be a multiple of 128 or the
    whole channel dim; the budget counts double-buffered in + out blocks
    (Pallas pipelines the next block's DMA during compute) plus one f32
    temporary.
    """
    per_c = h * w * (4 * itemsize + 4)
    if c % 128 == 0:
        ct = c
        while ct > 128 and per_c * ct > _VMEM_BUDGET:
            ct //= 2
        if ct % 128 == 0 and per_c * ct <= _VMEM_BUDGET:
            return ct
        return 0
    # small channel counts: must take the whole channel dim
    return c if per_c * c <= _VMEM_BUDGET else 0


def _in_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps, slope):
    x = x_ref[0].astype(jnp.float32)           # [H, W, Ct]
    n = x.shape[0] * x.shape[1]
    s1 = jnp.sum(x, axis=(0, 1))               # [Ct]
    s2 = jnp.sum(x * x, axis=(0, 1))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, None, :]) * rstd[None, None, :]
    y = y * scale_ref[0][None, None, :] + bias_ref[0][None, None, :]
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)
    o_ref[0] = y.astype(o_ref.dtype)


def _instance_norm_pallas(x, scale, bias, eps, negative_slope):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)
    ct = _channel_tile(h, w, c, x.dtype.itemsize)
    if ct == 0:
        return instance_norm_jnp(x, scale, bias, eps, negative_slope)

    kernel = functools.partial(_in_kernel, eps=eps, slope=negative_slope)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, c // ct),
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
    )(x, scale2, bias2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_in(x, scale, bias, eps, negative_slope):
    return _instance_norm_pallas(x, scale, bias, eps, negative_slope)


def _fused_in_fwd(x, scale, bias, eps, negative_slope):
    y = _instance_norm_pallas(x, scale, bias, eps, negative_slope)
    return y, (x, scale, bias)


def _fused_in_bwd(eps, negative_slope, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: instance_norm_jnp(x, s, b, eps, negative_slope),
        x, scale, bias,
    )
    return vjp(g)


_fused_in.defvjp(_fused_in_fwd, _fused_in_bwd)


# ---------------------------------------------------------------------------
# Spatially-tiled two-pass kernels: for tensors whose full (H, W) extent does
# not fit VMEM (the stem / early-stage activations, where instance norm is
# pure HBM bandwidth).  Pass 1 reads x once, accumulating per-channel
# sum/sumsq across row tiles (TPU grids run sequentially, so the stats block
# stays resident while its batch index is unchanged).  The affine transform
# is folded on the host into per-channel (a, c) with y = x*a + c, so pass 2
# is one read + one write with a single fused multiply-add (+ optional
# leaky).  Total: 2 reads + 1 write of x — the floor for out-of-VMEM IN.
# ---------------------------------------------------------------------------


def _row_tile(h, w, c, itemsize, out_mul=0, budget=10 * 1024 * 1024):
    """Largest divisor of h fitting the (default 10 MiB) scoped-vmem budget.

    Counts double-buffered in/out blocks plus the f32 stack temporaries
    (x32 and per-output intermediates); out_mul=0 sizes the stats pass
    (no tensor output), 1/2 the normalize/crelu pass.  Channels are padded
    to the 128-lane tile in VMEM.
    """
    cpad = -(-c // 128) * 128
    row = w * cpad * (2 * itemsize            # in, double-buffered
                      + 2 * out_mul * itemsize  # out, double-buffered
                      + 4 * (2 + 2 * out_mul))  # f32 temps on stack
    best = 0
    for ht in range(1, h + 1):
        if h % ht == 0 and ht * row <= budget:
            best = ht
    return best


def _stats_kernel(x_ref, o_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)           # [ht, W, C]
    s1 = jnp.sum(x, axis=(0, 1))
    s2 = jnp.sum(x * x, axis=(0, 1))

    @pl.when(j == 0)
    def _():
        o_ref[0, 0] = s1
        o_ref[0, 1] = s2

    @pl.when(j > 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + s1
        o_ref[0, 1] = o_ref[0, 1] + s2


def _norm_kernel(x_ref, v_ref, o_ref, *, slope):
    x = x_ref[0].astype(jnp.float32)
    a = v_ref[0, 0][None, None, :]
    c = v_ref[0, 1][None, None, :]
    y = x * a + c
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)
    o_ref[0] = y.astype(o_ref.dtype)


def _crelu_kernel(x_ref, v_ref, o_ref, *, slope, c):
    x = x_ref[0].astype(jnp.float32)
    ap = v_ref[0, 0][None, None, :]
    cp = v_ref[0, 1][None, None, :]
    an = v_ref[0, 2][None, None, :]
    cn = v_ref[0, 3][None, None, :]
    yp = x * ap + cp
    yn = x * an + cn
    if slope is not None:
        yp = jnp.where(yp >= 0, yp, yp * slope)
        yn = jnp.where(yn >= 0, yn, yn * slope)
    o_ref[0, :, :, :c] = yp.astype(o_ref.dtype)
    o_ref[0, :, :, c:] = yn.astype(o_ref.dtype)


def _spatial_stats(x, ht, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    return pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=(b, h // ht),
        in_specs=[pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _spatial_norm(x, vecs, ht, slope, out_mul=1, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    nvec = vecs.shape[1]
    kernel = (functools.partial(_norm_kernel, slope=slope) if out_mul == 1
              else functools.partial(_crelu_kernel, slope=slope, c=c))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_mul * c), x.dtype),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nvec, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, out_mul * c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, vecs)


def _instance_norm_spatial(x, scale, bias, eps, negative_slope,
                           interpret=False):
    """Two-pass spatially-tiled IN (+affine +leaky)."""
    b, h, w, c = x.shape
    ht_n = _row_tile(h, w, c, x.dtype.itemsize, out_mul=1)
    if ht_n == 0:
        return instance_norm_jnp(x, scale, bias, eps, negative_slope)
    stats = _spatial_stats(x, _row_tile(h, w, c, x.dtype.itemsize), interpret)
    n = h * w
    mean = stats[:, 0] / n
    var = jnp.maximum(stats[:, 1] / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = rstd * scale.astype(jnp.float32)[None, :]
    cvec = bias.astype(jnp.float32)[None, :] - mean * a
    vecs = jnp.stack([a, cvec], axis=1)                   # [B, 2, C]
    return _spatial_norm(x, vecs, ht_n, negative_slope, 1, interpret)


def crelu_instance_norm_half(x, scale, bias, groups, eps=1e-5,
                             negative_slope=0.01, interpret=None):
    """Fused CReLU + grouped IN + leaky over a space-to-depth tensor,
    HALF-layout output: channels ``[:C] = +x part, [C:] = -x part``.

    x: [B, Hc, Wc, C] with C = groups * Cg (sub-position-major groups of an
    S2D tensor; groups=1 for a plain tensor).  Statistics are per original
    channel cg across all groups; ``mean(-x) = -mean(x)`` and equal
    variance mean the concat is never materialized and x is read only
    twice (stats + normalize).  scale/bias: [2*Cg] affine of the canonical
    IN over concat(x, -x).

    The half layout keeps every vector store lane-aligned; downstream S2D
    convs absorb the permutation into their derived kernels
    (fots/ops/s2d.py:s2d_conv ``crelu_half_in``).
    """
    b, h, w, c = x.shape
    if interpret is None:
        # measured on v5e: the standalone Pallas two-pass kernels match the
        # jnp formulation, but in model context the opaque pallas_call is a
        # fusion barrier (XLA fuses the jnp normalize pass into adjacent
        # convs) and end-to-end throughput drops ~20%.  Keep the jnp path
        # as the default; the kernels stay for shapes XLA mishandles.
        return _crelu_half_jnp(x, scale, bias, groups, eps, negative_slope)
    if _row_tile(h, w, c, x.dtype.itemsize, out_mul=2) == 0:
        return _crelu_half_jnp(x, scale, bias, groups, eps, negative_slope)
    if interpret:
        return _crelu_half_pallas(x, scale, bias, groups, eps, negative_slope, True)
    return _fused_crelu_half(x, scale, bias, groups, eps, negative_slope)


def _crelu_half_pallas(x, scale, bias, groups, eps, negative_slope,
                       interpret=False):
    b, h, w, c = x.shape
    cg = c // groups
    stats = _spatial_stats(x, _row_tile(h, w, c, x.dtype.itemsize), interpret)
    n = h * w * groups
    sg = stats.reshape(b, 2, groups, cg).sum(2)           # [B, 2, Cg]
    mean = sg[:, 0] / n
    var = jnp.maximum(sg[:, 1] / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    sp = scale.astype(jnp.float32)[None, :cg]
    sn = scale.astype(jnp.float32)[None, cg:]
    bp = bias.astype(jnp.float32)[None, :cg]
    bn = bias.astype(jnp.float32)[None, cg:]
    ap = rstd * sp
    cp = bp - mean * ap
    an = -rstd * sn
    cn = bn - mean * an
    tile = lambda v: jnp.tile(v, (1, groups))             # [B, C]
    vecs = jnp.stack([tile(ap), tile(cp), tile(an), tile(cn)], axis=1)
    return _spatial_norm(x, vecs,
                         _row_tile(h, w, c, x.dtype.itemsize, out_mul=2),
                         negative_slope, 2, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_crelu_half(x, scale, bias, groups, eps, negative_slope):
    return _crelu_half_pallas(x, scale, bias, groups, eps, negative_slope)


def _fused_crelu_half_fwd(x, scale, bias, groups, eps, negative_slope):
    y = _crelu_half_pallas(x, scale, bias, groups, eps, negative_slope)
    return y, (x, scale, bias)


def _fused_crelu_half_bwd(groups, eps, negative_slope, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _crelu_half_jnp(x, s, b, groups, eps, negative_slope),
        x, scale, bias,
    )
    return vjp(g)


_fused_crelu_half.defvjp(_fused_crelu_half_fwd, _fused_crelu_half_bwd)


def _crelu_half_jnp(x, scale, bias, groups, eps, negative_slope):
    """jnp reference of crelu_instance_norm_half (also the autodiff path)."""
    b, h, w, c = x.shape
    cg = c // groups
    n = h * w * groups
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32.reshape(b, h * w, groups, cg), axis=(1, 2))
    s2 = jnp.sum((x32 * x32).reshape(b, h * w, groups, cg), axis=(1, 2))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_t = jnp.tile(mean, (1, groups))[:, None, None, :]
    rstd_t = jnp.tile(rstd, (1, groups))[:, None, None, :]
    z = (x32 - mean_t) * rstd_t
    sp = jnp.tile(scale.astype(jnp.float32)[None, :cg], (1, groups))
    sn = jnp.tile(scale.astype(jnp.float32)[None, cg:], (1, groups))
    bp = jnp.tile(bias.astype(jnp.float32)[None, :cg], (1, groups))
    bn = jnp.tile(bias.astype(jnp.float32)[None, cg:], (1, groups))
    yp = z * sp + bp
    yn = -z * sn + bn
    if negative_slope is not None:
        yp = jnp.where(yp >= 0, yp, yp * negative_slope)
        yn = jnp.where(yn >= 0, yn, yn * negative_slope)
    return jnp.concatenate([yp, yn], axis=-1).astype(x.dtype)


def instance_norm(x, scale=None, bias=None, eps=1e-5, negative_slope=None,
                  use_pallas: Optional[bool] = None):
    """Fused instance norm; picks the best kernel for the shape on TPU:
    whole-(H,W)-in-VMEM single-pass when it fits, spatially-tiled two-pass
    otherwise.

    scale/bias None => non-affine (identity affine is applied internally).
    """
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu and _channel_tile(h, w, c, x.dtype.itemsize) > 0
    if use_pallas:
        return _fused_in(x, scale, bias, eps, negative_slope)
    # NOTE: the spatially-tiled two-pass Pallas path (_fused_in_spatial)
    # measured slower in model context than the jnp formulation on v5e (the
    # pallas_call is a fusion barrier); jnp remains the fallback.
    return instance_norm_jnp(x, scale, bias, eps, negative_slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_in_spatial(x, scale, bias, eps, negative_slope):
    return _instance_norm_spatial(x, scale, bias, eps, negative_slope)


def _fused_in_spatial_fwd(x, scale, bias, eps, negative_slope):
    return _instance_norm_spatial(x, scale, bias, eps, negative_slope), (x, scale, bias)


def _fused_in_spatial_bwd(eps, negative_slope, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: instance_norm_jnp(x, s, b, eps, negative_slope),
        x, scale, bias,
    )
    return vjp(g)


_fused_in_spatial.defvjp(_fused_in_spatial_fwd, _fused_in_spatial_bwd)
