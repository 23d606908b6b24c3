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


def instance_norm(x, scale=None, bias=None, eps=1e-5, negative_slope=None,
                  use_pallas: Optional[bool] = None):
    """Fused instance norm; picks the Pallas kernel on TPU.

    scale/bias None => non-affine (identity affine is applied internally).
    """
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and _channel_tile(h, w, c, x.dtype.itemsize) > 0)
    if use_pallas:
        return _fused_in(x, scale, bias, eps, negative_slope)
    return instance_norm_jnp(x, scale, bias, eps, negative_slope)
