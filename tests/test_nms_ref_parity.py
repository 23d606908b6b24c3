"""Byte-parity vs the reference's compiled NMS adaptor.

Round 1 cross-tested repo-C++ against repo-NumPy only; this upgrades the
chain by building the actual reference ``nms/adaptor.so``
(/root/reference/nms, vendored pybind11 2.3-dev + Clipper) with modern g++
out of tree and asserting our ``fots.ops.nms.get_boxes`` output equals the
reference's on identical random score/geo/angle maps.

The vendored pybind11 predates Python 3.11's opaque ``PyFrameObject``; two
cosmetic frame-walking blocks (a traceback pretty-printer in cast.h:428-447
and a caller-frame recursion check in pybind11.h:1925-1935) are disabled by
regex patch in the /tmp build copy — neither affects binding semantics for
a plain function like ``do_nms``.  The build is cached under /tmp across
test runs (~2 min cold).
"""

import pathlib
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles / subprocess drives; smoke tier = -m "not slow"

REF_NMS = pathlib.Path("/root/reference/nms")
BUILD_ROOT = pathlib.Path("/tmp/fots_ref_nms_build")


def _build_reference_adaptor() -> pathlib.Path:
    so = BUILD_ROOT / "nms" / "adaptor.so"
    if so.exists():
        return so
    if not REF_NMS.is_dir():
        pytest.skip("reference nms sources not available")
    shutil.rmtree(BUILD_ROOT, ignore_errors=True)
    dst = BUILD_ROOT / "nms"  # relative includes require the dir name 'nms'
    shutil.copytree(REF_NMS, dst)

    cast_h = dst / "include/pybind11/cast.h"
    s = cast_h.read_text()
    s2 = re.sub(r"#if !defined\(PYPY_VERSION\)\n    if \(scope\.trace\) \{.*?#endif",
                "#if 0\n#endif", s, flags=re.S, count=1)
    assert s2 != s, "cast.h traceback block not found (pybind11 changed?)"
    cast_h.write_text(s2)

    pyb_h = dst / "include/pybind11/pybind11.h"
    s = pyb_h.read_text()
    s2 = re.sub(r"#if !defined\(PYPY_VERSION\)\n    PyFrameObject \*frame.*?#else",
                "#if 1\n#else", s, flags=re.S, count=1)
    assert s2 != s, "pybind11.h frame block not found"
    pyb_h.write_text(s2)

    r = subprocess.run(["make"], cwd=dst, capture_output=True, text=True,
                       timeout=900)
    if r.returncode != 0 or not so.exists():
        pytest.skip(f"reference adaptor build failed:\n{r.stderr[-2000:]}")
    return so


@pytest.fixture(scope="module")
def ref_get_boxes():
    so = _build_reference_adaptor()
    sys.path.insert(0, str(so.parent))
    try:
        import adaptor  # noqa: F401  (the built .so)
    finally:
        sys.path.pop(0)

    def get_boxes(segm, geo, angle_hwc, segm_thresh=0.5):
        # mirrors reference nms/__init__.py:11-29 (minus the CHW transpose:
        # we already carry angle HWC)
        poly_map = np.full(segm.shape, -1, np.int32)
        ret = np.array(
            adaptor.do_nms(segm, geo, angle_hwc, poly_map, 0.4, 0.2,
                           segm_thresh),
            dtype="float32")
        if len(ret) > 0:
            ret[:, :8] /= 10000
        return ret.reshape(-1, 9)

    return get_boxes


def _synthetic_maps(rng, h=48, w=64, n_words=6):
    """Score/geo/angle maps with word-like blobs + noise pixels."""
    segm = rng.uniform(0.0, 0.45, (h, w)).astype(np.float32)
    geo = rng.uniform(0.0, 4.0, (h, w, 4)).astype(np.float32)
    theta = np.zeros((h, w), np.float32)
    for _ in range(n_words):
        y0 = int(rng.integers(2, h - 8))
        x0 = int(rng.integers(2, w - 14))
        bh = int(rng.integers(2, 5))
        bw = int(rng.integers(4, 12))
        ang = float(rng.uniform(-0.4, 0.4))
        sl = (slice(y0, min(y0 + bh, h)), slice(x0, min(x0 + bw, w)))
        segm[sl] = rng.uniform(0.55, 0.99, segm[sl].shape)
        yy, xx = np.mgrid[sl]
        geo[sl[0], sl[1], 0] = (yy - y0 + 1.0)            # top
        geo[sl[0], sl[1], 1] = (y0 + bh - yy)             # bottom
        geo[sl[0], sl[1], 2] = (xx - x0 + 1.0)            # left
        geo[sl[0], sl[1], 3] = (x0 + bw - xx)             # right
        theta[sl] = ang
    angle = np.stack([np.sin(theta), np.cos(theta)], axis=-1).astype(np.float32)
    return segm, geo, angle


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_get_boxes_byte_parity(ref_get_boxes, seed):
    from fots.ops.nms import get_boxes

    rng = np.random.default_rng(seed)
    segm, geo, angle = _synthetic_maps(rng)
    ref = ref_get_boxes(segm, geo, angle, 0.5)
    ours = get_boxes(segm, geo, angle, 0.5)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    # coords come out of identical int64 fixed-point accumulators; scores
    # are float sums in the same order -> bytes must match
    np.testing.assert_array_equal(ours, ref)


def test_get_boxes_byte_parity_dense(ref_get_boxes):
    """A dense high-score field stresses the locality-aware merge chain."""
    from fots.ops.nms import get_boxes

    rng = np.random.default_rng(7)
    segm, geo, angle = _synthetic_maps(rng, h=32, w=40, n_words=12)
    ref = ref_get_boxes(segm, geo, angle, 0.3)
    ours = get_boxes(segm, geo, angle, 0.3)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)
