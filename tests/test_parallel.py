"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fots.parallel import batch_sharding, make_mesh, param_shardings


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_model=1)


def test_batch_sharded_matmul_runs():
    mesh = make_mesh(n_data=8)
    x = jnp.zeros((16, 32))
    xs = jax.device_put(x, batch_sharding(mesh))
    w = jax.device_put(jnp.ones((32, 8)), jax.sharding.NamedSharding(mesh, P()))

    @jax.jit
    def f(x, w):
        return x @ w

    y = f(xs, w)
    assert y.shape == (16, 8)


def test_param_shardings_vocab_over_model_axis():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "ocr": {"conv11": {"kernel": jnp.zeros((1, 1, 256, 7500)),
                           "bias": jnp.zeros((7500,))}},
        "stem": {"conv0a": {"kernel": jnp.zeros((3, 3, 3, 16))}},
    }
    sh = param_shardings(params, mesh)
    assert sh["ocr"]["conv11"]["kernel"].spec == P(None, None, None, "model")
    assert sh["ocr"]["conv11"]["bias"].spec == P("model")
    assert sh["stem"]["conv0a"]["kernel"].spec == P()


def test_vocab_not_sharded_when_indivisible():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {"conv11": {"kernel": jnp.zeros((1, 1, 4, 87))}}  # 87 % 2 != 0
    sh = param_shardings(params, mesh)
    assert sh["conv11"]["kernel"].spec == P()
