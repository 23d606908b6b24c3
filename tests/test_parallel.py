"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles / subprocess drives; smoke tier = -m "not slow"
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


def test_mesh_serving_matches_single_device(rng):
    """FOTSInference on a data-parallel mesh matches the unmeshed engine.

    Compares at the device-output level (candidate pixel sets + geometry):
    random weights put scores near the NMS threshold, where layout-dependent
    f32 summation order can flip candidates, so the score head is biased
    high to keep every pixel far from the decision boundary.
    """
    import jax.numpy as jnp

    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.pipeline import FOTSInference

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    variables["params"]["act"]["bias"] = jnp.full_like(
        variables["params"]["act"]["bias"], 4.0)  # all pixels fire
    plain = FOTSInference(model, dict(variables))
    meshed = FOTSInference(model, dict(variables), mesh=make_mesh(n_data=8))
    assert meshed._data_parallel == 8

    # 3 images: exercises batch padding 3 -> 8 shards
    ims = np.stack([rng.uniform(-1, 1, (64, 96, 3)) for _ in range(3)]
                   ).astype(np.float32)
    cw, _ = plain._forward_sparse(plain.variables, jnp.asarray(ims))
    padded = np.concatenate([ims, np.zeros((5, 64, 96, 3), np.float32)])
    cg, _ = meshed._forward_sparse(meshed.variables, meshed._put_batch(padded))
    from fots.ops.nms import unpack_candidates

    # both engines emit the u16 transport pack; compare VALUES, not bits
    cw = unpack_candidates(np.asarray(cw))
    cg = unpack_candidates(np.asarray(cg))
    for i in range(3):
        # same candidate pixel set, same geometry (idx row is channel 7)
        ow, og = np.argsort(cw[i, 7]), np.argsort(cg[i, 7])
        np.testing.assert_array_equal(cw[i, 7, ow], cg[i, 7, og])
        # mesh collectives change float rounding; after the f16 transport
        # quantization a sub-ulp difference lands on a full ulp step
        # (0.0625 at distances ~64 px), hence the rtol term
        np.testing.assert_allclose(cw[i, :, ow], cg[i, :, og],
                                   atol=5e-2, rtol=2e-3)

    # and the full meshed pipeline runs end to end (rois padded 3->8 etc.)
    results = meshed.batch_call(
        [rng.uniform(0, 255, (70, 100, 3)).astype(np.uint8)], serve_hw=(64, 96))
    assert len(results) == 1
    for r in results[0]:
        assert np.isfinite(r["box"][:8]).all() and isinstance(r["text"], str)
