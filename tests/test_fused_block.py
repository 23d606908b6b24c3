"""Fused conv3x3+IN+residual+act Pallas kernel vs the XLA composition.

The kernel runs in interpret mode here (CPU test tier); the on-TPU timing
verdict lives in docs/PERFORMANCE.md (tools/profile_fused_block.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fots.ops.fused_block import (_conv_in_act_pallas, conv_in_act_reference,
                                  fused_conv3x3_in_act)


def _data(n=2, h=32, w=48, c=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.standard_normal(c) * 0.3 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    return x, wk, g, b, r


@pytest.mark.parametrize("slope", [None, 0.01])
@pytest.mark.parametrize("with_res", [True, False])
def test_interpret_matches_reference(slope, with_res):
    x, wk, g, b, r = _data()
    res = r if with_res else None
    ref = conv_in_act_reference(x, wk, g, b, res, negative_slope=slope)
    got = _conv_in_act_pallas(x, wk, g, b, res, 1e-5, slope, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_interpret_multi_row_tiles():
    # H=40 -> row tile 8, 5 tiles: exercises halo DMA at both edges and
    # the cross-tile stats accumulation
    x, wk, g, b, r = _data(n=1, h=40, w=32, c=64, seed=3)
    ref = conv_in_act_reference(x, wk, g, b, r)
    got = _conv_in_act_pallas(x, wk, g, b, r, 1e-5, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_interpret_bf16():
    x, wk, g, b, r = _data(dtype=jnp.bfloat16, seed=1)
    ref = conv_in_act_reference(x, wk, g, b, r)
    got = _conv_in_act_pallas(x, wk, g, b, r, 1e-5, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.1, rtol=0.1)


def test_public_entry_cpu_fallback_and_grad():
    # off-TPU the public entry routes to the XLA composition, and the
    # custom_vjp backward is the XLA composition's autodiff either way
    x, wk, g, b, r = _data(n=1, h=16, w=16, c=64, seed=2)
    y = fused_conv3x3_in_act(x, wk, g, b, r)
    ref = conv_in_act_reference(x, wk, g, b, r)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    def loss_fused(x, wk, g, b):
        return jnp.sum(fused_conv3x3_in_act(x, wk, g, b, r) ** 2)

    def loss_ref(x, wk, g, b):
        return jnp.sum(conv_in_act_reference(x, wk, g, b, r) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wk, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wk, g, b)
    for a, c in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)
