"""FOTS shared backbone + EAST detection heads + CTC recognition head (flax).

TPU-native re-design of the reference ``ModelResNetSep2``
(tools/models.py:237-505): same topology — CReLU-IN stem, four
instance-norm residual stages, attention-gated FPN top-down merge, 1/4 and
1/8 scale score/geometry/angle heads, and a fully-convolutional CTC
recognition head over RoIRotated 1/4-scale features — expressed as pure
flax modules in NHWC with bilinear upsampling as separable matmuls.

Key reference behaviors preserved:
- the attention 1x1 conv is a single set of weights applied at three
  pyramid levels (models.py:406,415,425);
- conv6 / conv8 / conv9 in the recognition head are each applied twice
  with shared weights (models.py:340-359);
- angle head output is (sin, cos), sigmoid*2-1 then L2-normalized
  (models.py:452-455); rbox distances are sigmoid*128 (models.py:451).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fots.models.layers import (
    BasicBlockIn,
    BasicBlockSepIn,
    CReLUIN,
    InstanceNorm,
    conv,
    leaky_relu,
    max_pool,
    resize_bilinear,
)


class _ConvKernel(nn.Module):
    """Holds a conv kernel with nn.Conv's exact param name/shape/init, for
    paths that apply the conv with custom math (S2D)."""

    features: int
    in_features: int
    kernel: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel + (self.in_features, self.features), jnp.float32)


class _INParams(nn.Module):
    """Holds InstanceNorm affine params (same names/shapes as InstanceNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _CReLUParams(nn.Module):
    """Param twin of CReLUIN (child named 'in', 2x-channel affine)."""

    features2: int

    @nn.compact
    def __call__(self):
        return _INParams(self.features2, name="in")()


class Stem(nn.Module):
    """layer0 + layer0_1 (reference models.py:250-264): 3 -> 64ch at 1/4.

    The 1/4-scale output doubles as the shared OCR feature ``focr``
    (models.py:389-391).

    Executes via space-to-depth by default (fots/ops/s2d.py): the full- and
    half-resolution 16/32/64-channel tensors of the canonical formulation
    waste 2-8x HBM bandwidth on TPU lane padding and made the stem 2/3 of
    the whole detector forward (measured 55 of 83 ms at 16x704x1280 on
    v5e).  The S2D path computes the identical function (same taps, same
    instance-norm statistics; float reassociation only) on 1/2- and
    1/4-resolution cell grids with 64-256 channels.  Parameter names,
    shapes, and init are unchanged, so checkpoints and the .h5 importer are
    path-agnostic.
    """

    s2d: bool = True
    # conv1a form: per-subposition split convs (2.25x less MXU work than
    # the dense derived kernel — the inference win) vs the single dense
    # cell kernel.  Numerically identical (tests/test_s2d.py); the flag
    # only selects the faster schedule for the workload.
    split_conv1a: bool = True

    @nn.compact
    def __call__(self, x):
        if self.s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            return self._s2d_path(x)
        x = conv(16, (3, 3), 1, name="conv0a")(x)
        x = CReLUIN(16, name="crelu0a")(x)
        x = conv(32, (3, 3), 2, name="conv0b")(x)
        x = CReLUIN(32, name="crelu0b")(x)
        x = conv(64, (3, 3), 1, name="conv1a")(x)
        x = nn.relu(x)
        x = conv(64, (3, 3), 2, name="conv1b")(x)
        return nn.relu(x)

    def _s2d_path(self, images):
        from fots.ops.s2d import (
            crelu_instance_norm_s2d,
            s2d_conv,
            s2d_conv_split,
            space_to_depth,
        )

        k0a = _ConvKernel(16, 3, name="conv0a")()
        s0a, b0a = _CReLUParams(32, name="crelu0a")()
        k0b = _ConvKernel(32, 32, name="conv0b")()
        s0b, b0b = _CReLUParams(64, name="crelu0b")()
        k1a = _ConvKernel(64, 64, name="conv1a")()
        k1b = _ConvKernel(64, 64, name="conv1b")()

        h2, w2 = images.shape[1] // 2, images.shape[2] // 2
        h4, w4 = images.shape[1] // 4, images.shape[2] // 4
        x = space_to_depth(images, 2)                      # [B,H/2,W/2,12]
        # conv0a (3x3 s1, full res) on 1/2-res cells: 12 -> 64ch
        x = s2d_conv(x, k0a, 2, 2, 1, (h2, w2))
        # CReLU+IN of the full-res 32ch tensor, fused, no concat
        # (half-layout output; consuming convs absorb the permutation)
        x = crelu_instance_norm_s2d(x, s0a, b0a, 2)        # 128ch
        # conv0b (3x3 s2, full -> 1/2) producing 1/2-res repr on 1/4 cells
        x = s2d_conv(x, k0b, 2, 2, 2, (h4, w4), crelu_half_in=True)  # 128ch
        x = crelu_instance_norm_s2d(x, s0b, b0b, 2)        # 256ch
        # conv1a (3x3 s1 at 1/2) stays on 1/4-res cells; split per output
        # sub-position: the dense derived kernel is 75% structural zeros
        # and MXU-bound (7.6 ms of the 23.4 ms stem at 16x704x1280), the
        # split form does 2.25x less MXU work
        if self.split_conv1a:
            x = nn.relu(s2d_conv_split(x, k1a, 2, 2, 1, (h4, w4),
                                       crelu_half_in=True))
        else:
            x = nn.relu(s2d_conv(x, k1a, 2, 2, 1, (h4, w4),
                                 crelu_half_in=True))
        # conv1b (3x3 s2, 1/2 -> 1/4) collapses to the plain 1/4 tensor
        x = s2d_conv(x, k1b, 2, 1, 2, (h4, w4))            # 64ch plain
        return nn.relu(x)


class RecognitionHead(nn.Module):
    """Fully-conv CTC head over RoIRotated strips (models.py:334-379).

    Input: [N, 11, W, 64] strips; output: [N, W, nclass] log-probs.
    (The reference returns [N, nclass, W]; NW-major is the natural TPU
    layout and what the CTC loss consumes.)
    """

    nclass: int

    @nn.compact
    def __call__(self, x, train: bool = False, valid_w=None):
        """valid_w [N] (optional): per-strip content width in columns.
        When given, every InstanceNorm computes bucket-width-invariant
        masked statistics (see fots.ops.instance_norm) so a roi's features
        do not depend on which padded bucket it was batched into."""
        conv5 = conv(128, (3, 3), 1, name="conv5")
        conv6 = conv(128, (3, 3), 1, name="conv6")
        conv7 = conv(256, (3, 3), 1, name="conv7")
        conv8 = conv(256, (3, 3), 1, name="conv8")
        conv9 = conv(256, (3, 3), 1, name="conv9")
        conv10 = conv(256, (2, 3), 1, padding="VALID", name="conv10_s")
        conv11 = conv(self.nclass, (1, 1), 1, bias=True, name="conv11")

        x = conv5(x)
        x = InstanceNorm(128, affine=True, fused_slope=0.01, name="batch5")(x, valid_w)
        x = leaky_relu(conv6(x))
        x = leaky_relu(conv6(x))  # shared weights, applied twice
        x = max_pool(x, (2, 1), (2, 1))
        x = conv7(x)
        x = InstanceNorm(256, affine=True, fused_slope=0.01, name="batch7")(x, valid_w)
        x = leaky_relu(conv8(x))
        x = leaky_relu(conv8(x))
        x = leaky_relu(conv9(x))
        x = leaky_relu(conv9(x))
        x = max_pool(x, (2, 1), (2, 1))
        # (2,3) valid conv in height, same-ish in width (reference pads w by 1)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = conv10(x)
        x = InstanceNorm(256, affine=True, fused_slope=0.01, name="batch10_s")(x, valid_w)
        x = nn.Dropout(0.2, broadcast_dims=(1, 2), deterministic=not train, name="drop")(x)
        x = conv11(x)
        x = jnp.squeeze(x, axis=1)  # height collapsed to 1 -> [N, W, nclass]
        return nn.log_softmax(x, axis=-1)


class FOTSDetector(nn.Module):
    """The flagship model: detection + shared features + recognition head."""

    nclass: int = 87
    attention: bool = True
    multi_scale: bool = True
    stem_s2d: bool = True
    stem_split_conv1a: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.stem = Stem(s2d=self.stem_s2d,
                         split_conv1a=self.stem_split_conv1a, name="stem")
        self.layer1 = [BasicBlockIn(64, 64, 1, name=f"layer1_{i}") for i in range(3)]
        self.layer2 = [
            BasicBlockIn(64 if i == 0 else 128, 128, 2 if i == 0 else 1, name=f"layer2_{i}")
            for i in range(4)
        ]
        self.layer3 = [
            BasicBlockSepIn(128 if i == 0 else 256, 256, 2 if i == 0 else 1, name=f"layer3_{i}")
            for i in range(6)
        ]
        self.layer4 = [
            BasicBlockSepIn(256 if i == 0 else 512, 512, 2 if i == 0 else 1, name=f"layer4_{i}")
            for i in range(4)
        ]
        self.feature1 = conv(256, (1, 1), 1, name="feature1")
        self.feature2 = conv(256, (1, 1), 1, name="feature2")
        self.feature3 = conv(256, (1, 1), 1, name="feature3")
        self.feature4 = conv(256, (1, 1), 1, name="feature4")
        from fots.models.layers import ConvDWPlain

        self.upconv1 = ConvDWPlain(256, name="upconv1")
        self.upconv2 = ConvDWPlain(256, name="upconv2")
        if self.attention:
            self.conv_attention = conv(1, (1, 1), 1, bias=True, name="conv_attention")
        self.act_head = conv(1, (1, 1), 1, bias=True, name="act")
        self.rbox_head = conv(4, (1, 1), 1, bias=True, name="rbox")
        self.angle_head = conv(2, (1, 1), 1, bias=True, name="angle")
        self.drop = nn.Dropout(0.2, broadcast_dims=(1, 2), name="drop")
        self.ocr = RecognitionHead(self.nclass, name="ocr")

    def _heads(self, x):
        if self.is_initializing():
            # create the three convs' params with their canonical trees
            out = jnp.concatenate(
                [self.act_head(x), self.rbox_head(x), self.angle_head(x)],
                axis=-1)
        else:
            # one fused 1x1 conv over the concatenated head kernels instead
            # of three separate convs: the 256ch input tensor is read once,
            # not three times (exact same math, derived at trace time;
            # dtype promotion mirrors nn.Conv so f32 head params keep the
            # geometry in f32 under bf16 inference)
            k = jnp.concatenate(
                [self.act_head.variables["params"]["kernel"],
                 self.rbox_head.variables["params"]["kernel"],
                 self.angle_head.variables["params"]["kernel"]], axis=-1)
            b = jnp.concatenate(
                [self.act_head.variables["params"]["bias"],
                 self.rbox_head.variables["params"]["bias"],
                 self.angle_head.variables["params"]["bias"]], axis=-1)
            dt = jnp.promote_types(x.dtype, k.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dt)
        segm = nn.sigmoid(out[..., 0:1])
        rbox = nn.sigmoid(out[..., 1:5]) * 128.0
        angle = nn.sigmoid(out[..., 5:7]) * 2.0 - 1.0
        # eps guards the 0/0 at exactly-zero activations (the reference
        # divides unguarded, models.py:453-455)
        den = jnp.sqrt(jnp.sum(angle * angle, axis=-1, keepdims=True) + 1e-12)
        angle = angle / den
        return segm, rbox, angle

    def __call__(self, images, train: bool = False):
        """Detection forward (reference forward, models.py:387-457).

        images: [B, H, W, 3] normalized (x/128 - 1).  Returns a dict:
          segm/rbox/angle: lists [1/4-scale, 1/8-scale] NHWC maps;
          features: final 1/4 merged feature (256ch); focr: shared OCR
          feature (64ch, 1/4).
        """
        x = self.stem(images)
        focr = x

        x = self.drop(x, deterministic=not train)
        for blk in self.layer1:
            x = blk(x, train=train)
        su3 = x
        f1 = self.feature1(su3)
        for blk in self.layer2:
            x = blk(x, train=train)
        su2 = x
        f2 = self.feature2(su2)
        for blk in self.layer3:
            x = blk(x, train=train)
        su1 = x
        f3 = self.feature3(su1)
        for blk in self.layer4:
            x = blk(x, train=train)
        x = self.drop(x, deterministic=not train)
        f4 = self.feature4(x)

        def att_of(t):
            return nn.sigmoid(self.conv_attention(t))

        if self.attention:
            att_up = resize_bilinear(att_of(f4), f3.shape[1:3])
        x = resize_bilinear(f4, f3.shape[1:3])
        if self.attention:
            x = x + f3 * att_up
            att_up = resize_bilinear(att_of(x), f2.shape[1:3])
        else:
            x = x + f3

        x = resize_bilinear(x, f2.shape[1:3])
        x = self.upconv1(x)
        if self.attention:
            f2m = x + f2 * att_up
            att_up = resize_bilinear(att_of(f2m), f1.shape[1:3])
        else:
            f2m = x + f2
        x = f2m

        x = resize_bilinear(x, f1.shape[1:3])
        x = self.upconv2(x)
        x = x + (f1 * att_up if self.attention else f1)

        segm2, rbox2, angle2 = self._heads(f2m)
        x = self.drop(x, deterministic=not train)
        segm, rbox, angle = self._heads(x)

        return {
            "segm": [segm, segm2],
            "rbox": [rbox, rbox2],
            "angle": [angle, angle2],
            "features": x,
            "focr": focr,
        }

    def forward_features(self, images):
        """Stem only -> shared OCR features (reference models.py:381-385)."""
        return self.stem(images)

    def recognize(self, strips, train: bool = False, valid_w=None):
        """CTC head over RoIRotated strips (reference forward_ocr).

        valid_w [N] (optional): per-strip content widths for bucket-width-
        invariant masked InstanceNorm statistics (fots.ops.instance_norm).
        Same parameters either way — checkpoints are interchangeable."""
        return self.ocr(strips, train=train, valid_w=valid_w)


def init_detector(model: FOTSDetector, rng, image_shape=(1, 64, 64, 3),
                  strip_shape=(1, 11, 32, 64)):
    """Initialize ALL parameter trees (detection + recognition paths).

    flax only materializes params touched by the traced method, so a plain
    ``model.init(rng, images)`` would miss the recognition head.

    The whole init is jitted into ONE device program: un-jitted flax init
    dispatches every traced op separately, which costs minutes over a
    remote-chip link.  Parameter values depend only on parameter shapes and
    the rng (fan-in initializers never see activations), so the fully-conv
    model can — and should — be initialized at the tiny default
    ``image_shape`` no matter what resolution it will serve at.
    """

    def touch_all(m, images, strips):
        out = m(images, train=False)
        m.recognize(strips, train=False)
        return out

    import jax

    @jax.jit
    def _init(rng):
        return model.init(rng, jnp.zeros(image_shape), jnp.zeros(strip_shape),
                          method=touch_all)

    return _init(rng)
