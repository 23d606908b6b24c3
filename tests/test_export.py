"""Exported StableHLO serving bundle == in-process pipeline.

Exports the serving programs of a tiny FOTSInference with jax.export,
reloads them through ExportedEngine (params from npz, programs from
.shlo bytes, NO model code re-trace), and asserts the end-to-end results
match the in-process engine on the same images.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles the detector + an export lowering


@pytest.fixture(scope="module")
def tiny_engine():
    import jax

    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.pipeline import FOTSInference

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    eng = FOTSInference(model, variables, segm_thresh=0.3,
                        max_candidates=64)
    eng.strip_buckets = (64,)  # one bucket keeps the test compile cheap
    return eng


@pytest.fixture(scope="module")
def bundle(tiny_engine, tmp_path_factory):
    from fots.export import export_serving

    out = tmp_path_factory.mktemp("bundle")
    manifest = export_serving(tiny_engine, str(out), batch=2, height=64,
                              width=96, roi_pad=8, platforms=("cpu",))
    return out, manifest


def _images(seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (50, 80, 3), np.uint8),
            rng.integers(0, 255, (64, 96, 3), np.uint8)]


def test_manifest_and_files(bundle):
    import os

    out, manifest = bundle
    assert manifest["format"] == "fots-serving-v1"
    assert manifest["strip_buckets"] == [64]
    assert manifest["programs"]["detect"]["candidates"][0] == [2, 8, 64]
    for p in manifest["programs"].values():
        assert os.path.exists(os.path.join(str(out), p["file"]))
    assert os.path.exists(os.path.join(str(out), "params.npz"))


def test_exported_matches_inprocess(bundle, tiny_engine):
    from fots.export import ExportedEngine

    out, _ = bundle
    eng = ExportedEngine(str(out))
    images = _images()

    got = eng.batch_call(images)
    want = tiny_engine.batch_call(images, serve_hw=(64, 96))

    assert len(got) == len(want) == 2
    total = 0
    for g_img, w_img in zip(got, want):
        assert len(g_img) == len(w_img)
        for g, w in zip(g_img, w_img):
            assert g["text"] == w["text"]
            np.testing.assert_allclose(g["box"], w["box"], rtol=0, atol=1e-5)
            assert g["conf"] == pytest.approx(w["conf"], abs=1e-5)
            total += 1
    # random init at thresh 0.3 must produce at least one detection,
    # otherwise the comparison is vacuous
    assert total > 0


def test_detect_program_bitwise(bundle, tiny_engine):
    """The exported detect program returns the identical candidate pack."""
    from fots.export import ExportedEngine

    out, _ = bundle
    eng = ExportedEngine(str(out))
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 255, (2, 64, 96, 3), np.uint8)

    cands_exp, focr_exp = eng.detect(batch)
    cands_ref, focr_ref = tiny_engine._forward_sparse(
        tiny_engine.variables, batch)
    np.testing.assert_array_equal(np.asarray(cands_exp),
                                  np.asarray(cands_ref))
    np.testing.assert_array_equal(
        np.asarray(focr_exp, dtype=np.float32),
        np.asarray(focr_ref, dtype=np.float32))
