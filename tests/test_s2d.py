"""Space-to-depth stem: exact-function parity with the canonical path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fots.models import FOTSDetector
from fots.models.detector import Stem, init_detector
from fots.ops.s2d import (
    crelu_instance_norm_s2d,
    depth_to_space,
    s2d_conv,
    space_to_depth,
)


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    for f in (2, 4):
        y = space_to_depth(x, f)
        assert y.shape == (2, 8 // f, 12 // f, f * f * 5)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, f)), np.asarray(x))


@pytest.mark.parametrize("stride,f_in,f_out", [(1, 2, 2), (2, 2, 2), (2, 2, 1)])
def test_s2d_conv_matches_plain_conv(rng, stride, f_in, f_out):
    """s2d_conv == the canonical conv, up to float reassociation.

    Canonical = torch Conv2d(padding=(k-1)//2) semantics (symmetric for
    every stride), NOT XLA-'SAME' — for stride 2 they differ by one pixel
    and the reference weights were trained with torch alignment."""
    h, w, cin, cout, k = 16, 24, 3, 5, 3
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))

    pad = (k - 1) // 2
    want = jax.lax.conv_general_dilated(
        x, kern, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ho, wo = h // stride, w // stride
    xc = space_to_depth(x, f_in)
    got = s2d_conv(xc, kern, f_in, f_out, stride, (ho // f_out, wo // f_out))
    got = depth_to_space(got, f_out) if f_out > 1 else got
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("stride,f_in,f_out", [(1, 2, 2), (2, 2, 2), (2, 2, 1)])
def test_s2d_conv_split_matches_dense(rng, stride, f_in, f_out):
    """Per-subposition split form == the dense derived kernel (the split
    removes structural zeros; the summed taps are identical)."""
    from fots.ops.s2d import s2d_conv_split

    h, w, cin, cout, k = 16, 24, 4, 6, 3
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    ho, wo = h // stride, w // stride
    xc = space_to_depth(x, f_in)
    out_cells = (ho // f_out, wo // f_out)
    want = s2d_conv(xc, kern, f_in, f_out, stride, out_cells)
    got = s2d_conv_split(xc, kern, f_in, f_out, stride, out_cells)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_s2d_conv_split_crelu_half_in(rng):
    """Split form with the half-layout input permutation (the conv1a
    configuration used by the stem)."""
    from fots.ops.s2d import s2d_conv_split

    cin = 8  # canonical input channels (2*Corig after CReLU)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 4 * cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, cin, 5)).astype(np.float32))
    want = s2d_conv(x, kern, 2, 2, 1, (8, 12), crelu_half_in=True)
    got = s2d_conv_split(x, kern, 2, 2, 1, (8, 12), crelu_half_in=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def _half_to_dense(y_half, f, c):
    """Map the half-layout S2D output back to the canonical 2C dense form."""
    b, hc, wc, _ = y_half.shape
    pos = y_half[..., : f * f * c].reshape(b, hc, wc, f * f, c)
    neg = y_half[..., f * f * c:].reshape(b, hc, wc, f * f, c)
    cat = jnp.concatenate([pos, neg], axis=-1)  # sub-major (u, 2C)
    return depth_to_space(cat.reshape(b, hc, wc, f * f * 2 * c), f)


def test_crelu_instance_norm_s2d_matches_dense(rng):
    """fused S2D CReLU+IN == concat(x,-x) -> per-channel IN -> leaky."""
    from fots.ops.instance_norm import instance_norm_jnp

    b, h, w, c = 2, 8, 12, 6
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(2 * c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2 * c,)).astype(np.float32))

    cat = jnp.concatenate([x, -x], axis=-1)
    want = instance_norm_jnp(cat, scale, bias, 1e-5, 0.01)

    got = crelu_instance_norm_s2d(space_to_depth(x, 2), scale, bias, 2)
    np.testing.assert_allclose(
        np.asarray(_half_to_dense(got, 2, c)), np.asarray(want), atol=1e-4)


def test_crelu_half_pallas_interpret_matches_jnp(rng):
    """The Pallas two-pass CReLU-IN (interpret mode) == the jnp reference."""
    from fots.ops.instance_norm import _crelu_half_jnp, crelu_instance_norm_half

    b, h, w, c = 2, 8, 128, 256
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(2 * (c // 4),)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2 * (c // 4),)).astype(np.float32))
    want = _crelu_half_jnp(x, scale, bias, 4, 1e-5, 0.01)
    got = crelu_instance_norm_half(x, scale, bias, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_instance_norm_spatial_interpret_matches_jnp(rng):
    """The spatially-tiled two-pass IN (interpret mode) == single-pass jnp."""
    from fots.ops.instance_norm import _instance_norm_spatial, instance_norm_jnp

    b, h, w, c = 2, 16, 128, 128
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    want = instance_norm_jnp(x, scale, bias, 1e-5, 0.01)
    got = _instance_norm_spatial(x, scale, bias, 1e-5, 0.01, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_stem_s2d_matches_plain(rng):
    """Whole stem: S2D path == canonical path with the same params."""
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    plain = Stem(s2d=False)
    s2d = Stem(s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    # identical param trees (names, shapes) in both paths
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = plain.apply(variables, x)
    got = s2d.apply(variables, x)
    assert got.shape == want.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_stem_s2d_gradients_flow(rng):
    """Autodiff reaches the canonical kernels through the S2D derivation."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    stem = Stem(s2d=True)
    variables = stem.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(stem.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every conv kernel gets signal
    assert all(float(jnp.abs(g).max()) > 0 for g in flat)


def test_detector_s2d_flag_parity(rng):
    """Full detector: stem_s2d on/off agree (same checkpoint works in both)."""
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3)
    m1 = FOTSDetector(nclass=11, stem_s2d=True)
    m0 = FOTSDetector(nclass=11, stem_s2d=False)
    variables = init_detector(m1, jax.random.PRNGKey(0), image_shape=(1, 64, 64, 3))
    o1 = m1.apply(variables, x, train=False)
    o0 = m0.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(o1["segm"][0]), np.asarray(o0["segm"][0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1["focr"]), np.asarray(o0["focr"]), atol=1e-4)
