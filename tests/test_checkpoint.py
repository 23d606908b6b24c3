"""Torch state_dict import: mapping completeness + value placement."""

import numpy as np
import pytest

import jax

from fots.checkpoint import (
    import_torch_state_dict,
    reference_key_map,
)
from fots.models import FOTSDetector
from fots.models.detector import init_detector


@pytest.fixture(scope="module")
def variables():
    model = FOTSDetector(nclass=87)
    return init_detector(model, jax.random.PRNGKey(0))


def _get_path(tree, path):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _make_torch_shaped_state_dict(variables, rng):
    """Synthesize a torch-layout state_dict whose shapes invert our mapping."""
    sd = {}
    for tk, (fpath, kind) in reference_key_map().items():
        coll = "batch_stats" if kind == "stat" else "params"
        try:
            leaf = _get_path(variables[coll], fpath)
        except KeyError:
            raise AssertionError(f"flax path missing for {tk} -> {fpath}")
        arr = rng.standard_normal(np.shape(leaf)).astype(np.float32)
        if kind in ("conv", "dw"):
            arr = np.transpose(arr, (3, 2, 0, 1))  # flax->torch layout
        if tk.endswith("running_var"):
            arr = np.abs(arr) + 0.5  # variances must be positive
        sd[tk] = arr
    return sd


def test_every_mapped_path_exists_in_model(variables):
    # _make_torch_shaped_state_dict asserts on missing paths
    rng = np.random.default_rng(0)
    _make_torch_shaped_state_dict(variables, rng)


def test_import_roundtrip_values(variables):
    rng = np.random.default_rng(1)
    sd = _make_torch_shaped_state_dict(variables, rng)
    new_vars, imported, skipped = import_torch_state_dict(sd, variables)
    assert len(imported) == len(sd)
    assert skipped == []
    # spot-check: conv kernel transposed correctly
    got = np.asarray(_get_path(new_vars["params"], "stem/conv0a/kernel"))
    want = np.transpose(sd["layer0.0.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    # depthwise kernel
    got = np.asarray(_get_path(new_vars["params"], "upconv1/dw/kernel"))
    want = np.transpose(sd["upconv1.0.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
    # batch stats landed in the right collection
    got = np.asarray(_get_path(new_vars["batch_stats"], "layer2_0/down_bn/bn/mean"))
    np.testing.assert_array_equal(got, sd["layer2.0.downsample.1.running_mean"])


def test_import_skip_substrings(variables):
    rng = np.random.default_rng(2)
    sd = _make_torch_shaped_state_dict(variables, rng)
    new_vars, imported, skipped = import_torch_state_dict(
        sd, variables, skip_substrings=("conv11",)
    )
    assert any("conv11" in k for k in skipped)
    # conv11 keeps its original (random init) value
    got = np.asarray(_get_path(new_vars["params"], "ocr/conv11/kernel"))
    orig = np.asarray(_get_path(variables["params"], "ocr/conv11/kernel"))
    np.testing.assert_array_equal(got, orig)


def test_forward_runs_with_imported_weights(variables):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    sd = _make_torch_shaped_state_dict(variables, rng)
    new_vars, _, _ = import_torch_state_dict(sd, variables)
    model = FOTSDetector(nclass=87)
    out = model.apply(
        {"params": new_vars["params"], "batch_stats": new_vars["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    assert np.isfinite(np.asarray(out["segm"][0])).all()


def test_serving_params_roundtrip(variables, tmp_path):
    import jax
    import jax.numpy as jnp

    from fots.checkpoint import load_serving_params, save_serving_params

    path = str(tmp_path / "sv.npz")
    save_serving_params(path, variables, step=77)
    template = jax.tree_util.tree_map(jnp.zeros_like, dict(variables))
    got, step = load_serving_params(path, template)
    assert step == 77
    for group in ("params", "batch_stats"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            variables[group], got[group])


def test_serving_params_rejects_unknown_keys(variables, tmp_path):
    import pytest as _pytest

    from fots.checkpoint import load_serving_params, save_serving_params

    path = str(tmp_path / "sv.npz")
    save_serving_params(path, variables)
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    flat["params/not_a_real/kernel"] = np.zeros(3, np.float32)
    np.savez(path, **flat)
    with _pytest.raises(AssertionError, match="not in model"):
        load_serving_params(path, dict(variables))


def test_committed_serving_snapshot_loads_onto_current_model():
    """The shipped trained snapshot (artifacts/serving_params.npz — what
    bench.py and the profilers serve) must stay loadable onto the CURRENT
    model architecture: every leaf present, every shape equal.  Catches
    silent drift between the committed weights and detector.py."""
    import os

    from fots.checkpoint import load_serving_params
    from fots.codec import LabelCodec

    npz = os.path.join(os.path.dirname(__file__), "..",
                       "artifacts", "serving_params.npz")
    if not os.path.exists(npz):
        pytest.skip("no committed serving snapshot")
    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    template = init_detector(model, jax.random.PRNGKey(0))
    got, step = load_serving_params(npz, template)
    assert isinstance(step, int) and step > 0
    # a couple of spot leaves actually changed from the random template
    k0 = np.asarray(template["params"]["act"]["kernel"])
    k1 = np.asarray(got["params"]["act"]["kernel"])
    assert k0.shape == k1.shape and not np.allclose(k0, k1)


def test_serving_params_config_roundtrip(variables, tmp_path):
    from fots.checkpoint import (load_serving_config, load_serving_params,
                                 save_serving_params)

    path = str(tmp_path / "sv.npz")
    save_serving_params(path, variables, step=3,
                        config={"masked_norm": True})
    assert load_serving_config(path) == {"masked_norm": True}
    # __config__ must not trip the every-key-accounted check
    got, step = load_serving_params(path, dict(variables))
    assert step == 3
    # snapshots without a config read as {}
    path2 = str(tmp_path / "sv2.npz")
    save_serving_params(path2, variables)
    assert load_serving_config(path2) == {}


def test_load_engine_accepts_npz_snapshot(variables, tmp_path):
    """`-model snapshot.npz` on the CLIs: weights load, masked_norm is
    picked up from the embedded config (the published-.h5 analog)."""
    from fots.checkpoint import save_serving_params
    from fots.cli.detect import load_engine

    path = str(tmp_path / "sv.npz")
    save_serving_params(path, variables, step=5,
                        config={"masked_norm": True})
    engine = load_engine(model_path=path)
    assert engine.masked_norm is True
    k0 = np.asarray(variables["params"]["act"]["kernel"])
    k1 = np.asarray(engine.variables["params"]["act"]["kernel"])
    assert np.array_equal(k0, k1)
