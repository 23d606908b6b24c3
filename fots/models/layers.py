"""Building-block layers (flax.linen, NHWC, TPU-friendly).

Re-designs of the reference's torch modules (tools/models.py:36-195):
instance norm is stateless (always instance statistics — matching
InstanceNorm2d with track_running_stats=False), batch norm carries running
stats in a mutable collection, and bilinear resize is implemented as two
separable matmuls (MXU-friendly) with align_corners=True semantics to match
``F.interpolate(..., align_corners=True)``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def leaky_relu(x, negative_slope=0.01):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (NHWC).

    Equivalent to torch InstanceNorm2d(eps=1e-5, track_running_stats=False)
    (reference tools/models.py:45,91,98): statistics are always computed
    from the current sample, so the layer is stateless and identical in
    train and eval — ideal under jit.  Backed by the fused op in
    fots.ops.instance_norm (Pallas single-VMEM-pass kernel on TPU);
    ``fused_slope`` folds a trailing leaky-relu into the same pass.
    """

    features: int
    affine: bool = True
    eps: float = 1e-5
    fused_slope: Optional[float] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, valid_w=None):
        from fots.ops.instance_norm import (instance_norm,
                                            masked_instance_norm_jnp)

        scale = bias = None
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if valid_w is not None:
            # bucket-width-invariant statistics for padded strips; same
            # params, so checkpoints are interchangeable with the plain path
            return masked_instance_norm_jnp(x, valid_w, scale, bias, self.eps,
                                            negative_slope=self.fused_slope)
        return instance_norm(x, scale, bias, self.eps,
                             negative_slope=self.fused_slope)


class CReLUIN(nn.Module):
    """concat(x, -x) -> InstanceNorm(affine) -> leaky_relu(0.01)
    (reference CReLU_IN, tools/models.py:42-49). Doubles channels."""

    features: int  # input channel count; output is 2x

    @nn.compact
    def __call__(self, x):
        cat = jnp.concatenate([x, -x], axis=-1)
        return InstanceNorm(self.features * 2, affine=True, fused_slope=0.01,
                            name="in")(cat)


def conv(features, kernel=(3, 3), stride=1, dilation=1, bias=False, name=None,
         feature_group_count=1, padding="SAME", dtype=None):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if padding == "SAME":
        # torch Conv2d(padding=(k-1)//2) semantics: symmetric padding for
        # EVERY stride.  XLA's 'SAME' pads (0,1) for stride-2/K=3/even
        # input — one pixel to the right of where torch samples — which
        # silently shifts every stride-2 feature map vs imported reference
        # weights (caught by tests/test_torch_parity.py).
        padding = tuple((d * (k - 1) // 2, d * (k - 1) // 2)
                        for k, d in zip(kernel, dilation))
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel),
        strides=stride,
        kernel_dilation=dilation,
        use_bias=bias,
        padding=padding,
        feature_group_count=feature_group_count,
        name=name,
        dtype=dtype,
    )


class BatchNorm(nn.Module):
    """BatchNorm with running stats in the 'batch_stats' collection.

    Used only where the reference uses BatchNorm2d (the 1x1 downsample
    projections, tools/models.py:319-323, and the Sep blocks' conv_dw).
    """

    features: int
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)


class ConvDWIn(nn.Module):
    """depthwise 3x3 -> pointwise 1x1 -> InstanceNorm(no affine) -> leaky
    (reference conv_dw_in, tools/models.py:87-93)."""

    in_features: int
    out_features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = conv(self.in_features, (3, 3), self.stride, self.dilation,
                 feature_group_count=self.in_features, name="dw")(x)
        x = conv(self.out_features, (1, 1), 1, name="pw")(x)
        return InstanceNorm(self.out_features, affine=False, fused_slope=0.01,
                            name="in")(x)


class ConvDWResIn(nn.Module):
    """dw3x3 -> IN(affine) -> leaky -> pw1x1 -> IN(affine)
    (reference conv_dw_res_in, tools/models.py:95-103)."""

    in_features: int
    out_features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = conv(self.in_features, (3, 3), self.stride,
                 feature_group_count=self.in_features, name="dw")(x)
        x = InstanceNorm(self.in_features, affine=True, fused_slope=0.01,
                         name="in1")(x)
        x = conv(self.out_features, (1, 1), 1, name="pw")(x)
        return InstanceNorm(self.out_features, affine=True, name="in2")(x)


class ConvDWPlain(nn.Module):
    """dw3x3 + pw1x1, no norm/act (reference conv_dw_plain, models.py:71-75)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, (3, 3), 1, feature_group_count=self.features, name="dw")(x)
        return conv(self.features, (1, 1), 1, name="pw")(x)


class BasicBlockIn(nn.Module):
    """conv3x3 -> IN -> relu -> conv3x3 -> IN (+skip) -> relu
    (reference BasicBlockIn, tools/models.py:140-168). Downsample is a 1x1
    conv + BatchNorm (reference _make_layer, models.py:315-324)."""

    in_features: int
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv(self.features, (3, 3), self.stride, name="conv1")(x)
        # fused_slope=0.0 == ReLU folded into the norm pass
        y = InstanceNorm(self.features, affine=True, fused_slope=0.0, name="in1")(y)
        y = conv(self.features, (3, 3), 1, name="conv2")(y)
        y = InstanceNorm(self.features, affine=True, name="in2")(y)
        if self.stride != 1 or self.in_features != self.features:
            residual = conv(self.features, (1, 1), self.stride, name="down_conv")(x)
            residual = BatchNorm(self.features, name="down_bn")(residual, train=train)
        return nn.relu(y + residual)


class BasicBlockSepIn(nn.Module):
    """Separable residual block (reference BasicBlockSepIn, models.py:170-195)."""

    in_features: int
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvDWIn(self.in_features, self.features, self.stride, self.dilation, name="sep1")(x)
        y = ConvDWResIn(self.features, self.features, 1, name="conv2")(y)
        if self.stride != 1 or self.in_features != self.features:
            residual = conv(self.features, (1, 1), self.stride, name="down_conv")(x)
            residual = BatchNorm(self.features, name="down_bn")(residual, train=train)
        return leaky_relu(y + residual)


def _resize_matrix(src: int, dst: int, dtype=jnp.float32):
    """1-D align_corners=True bilinear interpolation matrix [dst, src]."""
    if dst == 1:
        w = jnp.zeros((1, src), dtype)
        return w.at[0, 0].set(1.0)
    if src == 1:
        return jnp.ones((dst, 1), dtype)
    pos = jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
    hi = jnp.clip(lo + 1, 0, src - 1)
    frac = pos - lo.astype(jnp.float32)
    rows = jnp.arange(dst)
    w = jnp.zeros((dst, src), jnp.float32)
    w = w.at[rows, lo].add(1.0 - frac)
    w = w.at[rows, hi].add(frac)
    return w.astype(dtype)


def resize_bilinear(x, out_hw: Tuple[int, int]):
    """align_corners=True bilinear resize of NHWC via two separable matmuls.

    Matches torch F.interpolate(mode='bilinear', align_corners=True)
    (reference tools/models.py:409-432); expressed as matmuls so XLA maps
    it onto the MXU instead of a gather.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    ry = _resize_matrix(h, oh, x.dtype)  # [oh, h]
    rx = _resize_matrix(w, ow, x.dtype)  # [ow, w]
    y = jnp.einsum("oh,bhwc->bowc", ry, x)
    return jnp.einsum("pw,bowc->bopc", rx, y)


def max_pool(x, window: Tuple[int, int], stride: Tuple[int, int], padding="VALID"):
    return nn.max_pool(x, window_shape=window, strides=stride, padding=padding)
