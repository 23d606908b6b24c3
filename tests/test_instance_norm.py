"""Fused instance norm: jnp path, Pallas kernel (interpret mode), VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fots.ops.instance_norm import (
    _channel_tile,
    instance_norm,
    instance_norm_jnp,
)


def _ref(x, scale, bias, eps=1e-5, slope=None):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    y = y * scale + bias
    if slope is not None:
        y = np.where(y >= 0, y, y * slope)
    return y


def test_jnp_path_matches_two_pass(rng):
    x = rng.standard_normal((2, 8, 16, 4)).astype(np.float32)
    scale = rng.standard_normal(4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(instance_norm_jnp(jnp.asarray(x), scale, bias))
    np.testing.assert_allclose(got, _ref(x, scale, bias), atol=1e-4)


def test_fused_leaky(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(instance_norm_jnp(jnp.asarray(x), np.ones(4, np.float32),
                                       np.zeros(4, np.float32),
                                       negative_slope=0.01))
    want = _ref(x, 1.0, 0.0, slope=0.01)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_interpret_matches_jnp(rng):
    from jax.experimental.pallas import tpu as pltpu

    x = rng.standard_normal((2, 8, 16, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(scale),
                                       jnp.asarray(bias), use_pallas=True))
    want = np.asarray(instance_norm_jnp(jnp.asarray(x), scale, bias))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_vjp_matches_jnp_grad(rng):
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(4).astype(np.float32))

    def loss_pallas(x, s, b):
        return jnp.sum(instance_norm(x, s, b, use_pallas=True,
                                     negative_slope=0.01) ** 2)

    def loss_jnp(x, s, b):
        return jnp.sum(instance_norm_jnp(x, s, b, negative_slope=0.01) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_channel_tile_rules():
    # 1/16-scale 256ch f32: fits with a 128-channel tile
    assert _channel_tile(44, 80, 256, 4) == 128
    # 1/32-scale 512ch f32 fits a 128 tile
    assert _channel_tile(22, 40, 512, 4) >= 128
    # bf16 1/16 fits the whole 256 channels
    assert _channel_tile(44, 80, 256, 2) == 256
    # big early maps: kernel not applicable -> 0 (falls back to jnp)
    assert _channel_tile(352, 640, 32, 4) == 0
    assert _channel_tile(176, 320, 64, 4) == 0
    assert _channel_tile(88, 160, 128, 4) == 0
    # small maps keep all channels
    assert _channel_tile(8, 8, 16, 4) == 16


def test_non_affine(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x), use_pallas=False))
    want = _ref(x, 1.0, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_masked_instance_norm_full_width_matches_plain():
    import jax.numpy as jnp

    from fots.ops.instance_norm import (instance_norm_jnp,
                                        masked_instance_norm_jnp)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 11, 32, 16)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    want = instance_norm_jnp(x, scale, bias, 1e-5, 0.01)
    got = masked_instance_norm_jnp(x, jnp.full((2,), 32), scale, bias, 1e-5, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_masked_instance_norm_ignores_padding():
    """Statistics over a zero-padded strip equal the unpadded strip's."""
    import jax.numpy as jnp

    from fots.ops.instance_norm import masked_instance_norm_jnp

    rng = np.random.default_rng(1)
    content = rng.standard_normal((1, 11, 40, 16)).astype(np.float32)
    pad = np.zeros((1, 11, 88, 16), np.float32)
    x128 = jnp.asarray(np.concatenate([content, pad], axis=2))
    x40 = jnp.asarray(content)
    v = jnp.full((1,), 40)
    y40 = np.asarray(masked_instance_norm_jnp(x40, v, None, None, 1e-5, None))
    y128 = np.asarray(masked_instance_norm_jnp(x128, v, None, None, 1e-5, None))
    np.testing.assert_allclose(y128[:, :, :40], y40, atol=5e-6)
    assert np.abs(y128[:, :, 40:]).max() == 0.0
