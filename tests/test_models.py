"""Model topology smoke tests: shapes, scales, determinism, dropout rngs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fots.models import CRNN, FOTSDetector
from fots.models.detector import init_detector
from fots.models.layers import resize_bilinear


@pytest.fixture(scope="module")
def detector_and_params():
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0), image_shape=(1, 128, 128, 3))
    return model, variables


def test_detector_output_shapes(detector_and_params):
    model, variables = detector_and_params
    x = jnp.zeros((2, 128, 128, 3))
    out = model.apply(variables, x, train=False)
    # 1/4 scale heads
    assert out["segm"][0].shape == (2, 32, 32, 1)
    assert out["rbox"][0].shape == (2, 32, 32, 4)
    assert out["angle"][0].shape == (2, 32, 32, 2)
    # 1/8 scale heads
    assert out["segm"][1].shape == (2, 16, 16, 1)
    # shared features
    assert out["features"].shape == (2, 32, 32, 256)
    assert out["focr"].shape == (2, 32, 32, 64)


def test_detector_head_ranges(detector_and_params):
    model, variables = detector_and_params
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 128, 128, 3)), jnp.float32)
    out = model.apply(variables, x, train=False)
    segm = np.asarray(out["segm"][0])
    rbox = np.asarray(out["rbox"][0])
    angle = np.asarray(out["angle"][0])
    assert (segm >= 0).all() and (segm <= 1).all()
    assert (rbox >= 0).all() and (rbox <= 128).all()
    # angle is L2-normalized (sin, cos)
    np.testing.assert_allclose((angle ** 2).sum(-1), 1.0, atol=1e-5)


def test_recognition_head_shapes(detector_and_params):
    model, variables = detector_and_params
    strips = jnp.zeros((3, 11, 64, 64))
    out = model.apply(variables, strips, train=False, method=FOTSDetector.recognize)
    assert out.shape == (3, 64, 87)
    # log-softmax normalization
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-4)


def test_detector_train_mode_needs_dropout_rng(detector_and_params):
    model, variables = detector_and_params
    x = jnp.zeros((1, 128, 128, 3))
    out = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out[0]["segm"][0].shape == (1, 32, 32, 1)


def test_crnn_shapes():
    model = CRNN(nclass=100)
    x = jnp.zeros((2, 32, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # width: 48 -> /2 -> /2 = 12, then two (2,1)-stride pools with pad keep
    # w+1, and a final valid (2,2) conv
    assert out.ndim == 3 and out.shape[0] == 2 and out.shape[2] == 100
    assert out.shape[1] >= 12


def test_resize_bilinear_matches_numpy_linear():
    # align_corners=True: endpoints map to endpoints exactly
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1))
    y = resize_bilinear(x, (1, 15))
    got = np.asarray(y)[0, 0, :, 0]
    want = np.linspace(0, 7, 15)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_param_count_sanity(detector_and_params):
    _, variables = detector_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    # reference ModelResNetSep2 is a ~10M-param model; topology match should
    # land in the same ballpark
    assert 5e6 < n < 30e6, n


def test_head_conv_grads_nonzero():
    """Gradients flow through all three fused head convs (_heads reads the
    act/rbox/angle kernels via .variables at trace time — the fusion must
    not detach them from autodiff).  Small shape so the full-detector
    backward compiles in test time."""
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0),
                              image_shape=(1, 32, 32, 3))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 32, 32, 3)).astype(np.float32))

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, x, train=False)
        return (jnp.sum(out["segm"][0]) + jnp.sum(out["rbox"][0] / 128.0)
                + jnp.sum(out["angle"][0] * jnp.array([0.3, 0.7])))

    grads = jax.grad(loss_fn)(variables["params"])
    for head in ("act", "rbox", "angle"):
        for leaf in ("kernel", "bias"):
            g = np.asarray(grads[head][leaf])
            assert np.isfinite(g).all(), (head, leaf)
            assert np.abs(g).max() > 0, f"zero grad through {head}/{leaf}"


def test_recognition_bucket_invariance_with_masked_norm(detector_and_params):
    """With valid_w, a strip's log-probs on its content frames are the same
    whatever bucket width it was padded into (masked InstanceNorm)."""
    model, variables = detector_and_params
    rng = np.random.default_rng(3)
    k = 40  # content width
    content = rng.standard_normal((2, 11, k, 64)).astype(np.float32)
    pad = lambda W: np.concatenate(
        [content, np.zeros((2, 11, W - k, 64), np.float32)], axis=2)
    v = jnp.full((2,), k)
    lp64 = model.apply(variables, jnp.asarray(pad(64)), train=False,
                       valid_w=v, method=model.recognize)
    lp128 = model.apply(variables, jnp.asarray(pad(128)), train=False,
                        valid_w=v, method=model.recognize)
    np.testing.assert_allclose(np.asarray(lp128)[:, :k], np.asarray(lp64)[:, :k],
                               atol=2e-4)
    # and without valid_w the same comparison fails (documents the skew)
    lp64u = model.apply(variables, jnp.asarray(pad(64)), train=False,
                        method=model.recognize)
    lp128u = model.apply(variables, jnp.asarray(pad(128)), train=False,
                         method=model.recognize)
    assert np.abs(np.asarray(lp128u)[:, :k] - np.asarray(lp64u)[:, :k]).max() > 1e-2


def test_init_values_independent_of_traced_shape():
    """init_detector at any image/strip shape yields byte-identical params.

    The serving CLIs and bench rely on this: they init at the tiny default
    shape regardless of serving resolution (fan-in initializers only see
    parameter shapes, never activations)."""
    model = FOTSDetector(nclass=87)
    a = init_detector(model, jax.random.PRNGKey(0))
    b = init_detector(model, jax.random.PRNGKey(0),
                      image_shape=(1, 128, 128, 3), strip_shape=(2, 11, 96, 64))
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
