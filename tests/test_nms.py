"""NMS: IoU correctness, merge behavior, native-vs-NumPy agreement."""

import numpy as np
import pytest

import fots.ops.nms as nms_mod
from fots.ops.nms import get_boxes, locality_aware_nms, quad_iou


def _axis_quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x0, y1], [x1, y1], [x1, y0]], np.float64)


def test_quad_iou_axis_aligned():
    a = _axis_quad(0, 0, 10, 10)
    b = _axis_quad(5, 0, 15, 10)
    got = quad_iou(a, b)
    np.testing.assert_allclose(got, 50.0 / 150.0, rtol=1e-6)
    assert quad_iou(a, a) == pytest.approx(1.0)
    assert quad_iou(a, _axis_quad(20, 20, 30, 30)) == pytest.approx(0.0)


def test_quad_iou_rotated():
    a = _axis_quad(0, 0, 10, 10)
    # 45-degree rotated square centered same, side 10*sqrt(2)/?  use known:
    b = np.array([[5, -5], [-5, 5], [5, 15], [15, 5]], np.float64)
    # intersection is the full square a (b circumscribes a rotated by 45):
    # b is a square with diagonal 20 centered at (5,5): area 200... compute
    got = quad_iou(a, b)
    # |a|=100, |b|=200, intersection = a fully inside b -> 100/200
    np.testing.assert_allclose(got, 0.5, rtol=1e-6)


def test_quad_iou_native_matches_numpy(rng):
    if nms_mod._load_native() is None:
        pytest.skip("native lib unavailable")
    for _ in range(50):
        c1 = rng.uniform(0, 50, 2)
        c2 = rng.uniform(0, 50, 2)
        q1 = _axis_quad(c1[0], c1[1], c1[0] + rng.uniform(5, 30), c1[1] + rng.uniform(5, 30))
        q2 = _axis_quad(c2[0], c2[1], c2[0] + rng.uniform(5, 30), c2[1] + rng.uniform(5, 30))
        native = quad_iou(q1, q2)
        py = nms_mod._quad_iou_np(q1, q2)
        # native rounds coords to 1e-4 fixed point first
        np.testing.assert_allclose(native, py, atol=2e-4)


def _candidates_for_two_clusters():
    """Two clusters of heavily-overlapping candidates + scan metadata."""
    quads, scores, probs, xs, ys = [], [], [], [], []
    for j, base in enumerate([(20.0, 20.0), (200.0, 120.0)]):
        for i in range(4):
            dx = i * 0.5
            q = _axis_quad(base[0] + dx, base[1], base[0] + 60 + dx, base[1] + 20)
            quads.append(q)
            scores.append(0.9 - 0.01 * i)
            probs.append([0.5, 0.5, 0.5, 0.5])
            xs.append(int(base[0] / 4) + i)
            ys.append(int(base[1] / 4))
    return (np.asarray(quads), np.asarray(scores, np.float32),
            np.asarray(probs, np.float32), np.asarray(xs), np.asarray(ys))


def test_locality_aware_nms_merges_clusters():
    quads, scores, probs, xs, ys = _candidates_for_two_clusters()
    out = locality_aware_nms(quads, scores, probs, xs, ys, 128, 64)
    assert out.shape[1] == 9
    assert out.shape[0] == 2  # one box per cluster
    # merged corner coords stay near the cluster
    assert abs(out[0, 0] - 20.0) < 3
    # scores accumulate over merged members (locality-aware behavior)
    assert out[:, 8].max() > 1.0


def test_nms_numpy_fallback_agrees_with_native():
    if nms_mod._load_native() is None:
        pytest.skip("native lib unavailable")
    quads, scores, probs, xs, ys = _candidates_for_two_clusters()
    native = locality_aware_nms(quads, scores, probs, xs, ys, 128, 64)
    lib = nms_mod._lib
    nms_mod._lib = None
    nms_mod._lib_tried = True
    try:
        py = locality_aware_nms(quads, scores, probs, xs, ys, 128, 64)
    finally:
        nms_mod._lib = lib
    assert native.shape == py.shape
    np.testing.assert_allclose(native[:, :8], py[:, :8], atol=2e-4)
    np.testing.assert_allclose(native[:, 8], py[:, 8], rtol=1e-5)


def test_get_boxes_end_to_end(rng):
    """Synthesize maps containing one clean word region -> one box out."""
    H, W = 32, 64
    segm = np.zeros((H, W), np.float32)
    geo = np.zeros((H, W, 4), np.float32)
    angle = np.zeros((H, W, 2), np.float32)
    angle[..., 1] = 1.0  # cos=1, sin=0 (horizontal)
    # word occupying pixels y in [10,14], x in [10,30] at map scale
    for y in range(10, 15):
        for x in range(10, 31):
            segm[y, x] = 0.95
            geo[y, x] = [y - 9.5, 14.5 - y, x - 9.5, 30.5 - x]
    boxes = get_boxes(segm, geo, angle, 0.5)
    assert boxes.shape[0] >= 1
    b = boxes[np.argmax(boxes[:, 8])]
    # expected image-space extent: map coords * 4
    xs = b[0:8:2]
    ys = b[1:8:2]
    assert 30 < xs.min() < 50 and 115 < xs.max() < 130
    assert 35 < ys.min() < 45 and 55 < ys.max() < 62


def test_get_boxes_empty():
    out = get_boxes(np.zeros((8, 8), np.float32), np.zeros((8, 8, 4), np.float32),
                    np.zeros((8, 8, 2), np.float32))
    assert out.shape == (0, 9)


def test_sparse_candidates_match_dense(rng):
    """extract_candidates (device) + get_boxes_from_candidates (host) must
    reproduce the dense get_boxes path exactly when k covers all pixels."""
    import jax.numpy as jnp

    from fots.ops.nms import extract_candidates, get_boxes_from_candidates

    H, W = 32, 64
    B = 2
    segm = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    # carve structured word regions so merges actually happen
    segm[:, 10:15, 10:31] += 0.5
    geo = rng.uniform(0.5, 8.0, (B, H, W, 4)).astype(np.float32)
    theta = rng.uniform(-0.3, 0.3, (B, H, W))
    angle = np.stack([np.sin(theta), np.cos(theta)], -1).astype(np.float32)

    cands = np.asarray(extract_candidates(
        jnp.asarray(segm), jnp.asarray(geo), jnp.asarray(angle),
        k=H * W, segm_thresh=0.9))
    assert cands.shape == (B, 8, H * W)  # channel-first packing
    for b in range(B):
        dense = get_boxes(segm[b], geo[b], angle[b], 0.9)
        sparse = get_boxes_from_candidates(cands[b], H, W, 0.9)
        np.testing.assert_array_equal(dense, sparse)


def test_sparse_candidates_topk_truncation():
    """With k smaller than the candidate count, the k highest-score pixels
    survive and the pipeline still returns finite boxes."""
    import jax.numpy as jnp

    from fots.ops.nms import extract_candidates, get_boxes_from_candidates

    H, W = 16, 16
    segm = np.full((1, H, W), 0.8, np.float32)
    geo = np.full((1, H, W, 4), 2.0, np.float32)
    angle = np.zeros((1, H, W, 2), np.float32)
    angle[..., 1] = 1.0
    cands = np.asarray(extract_candidates(
        jnp.asarray(segm), jnp.asarray(geo), jnp.asarray(angle), k=32))
    assert (cands[0, 0, :] > 0.5).sum() == 32
    out = get_boxes_from_candidates(cands[0], H, W)
    assert out.shape[0] >= 1 and np.isfinite(out).all()


def test_batch_candidates_match_scalar(rng):
    """get_boxes_from_candidates_batch must be bit-identical per image to
    the scalar helper (it re-sorts the top-k pack to raster order and
    vector-decodes the whole batch before the threaded native merges)."""
    import jax.numpy as jnp

    from fots.ops.nms import (extract_candidates, get_boxes_from_candidates,
                              get_boxes_from_candidates_batch)

    H, W = 32, 64
    B = 4
    segm = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    segm[:, 10:15, 10:31] += 0.5
    segm[3] = 0.0                      # one empty image in the batch
    geo = rng.uniform(0.5, 8.0, (B, H, W, 4)).astype(np.float32)
    theta = rng.uniform(-0.3, 0.3, (B, H, W))
    angle = np.stack([np.sin(theta), np.cos(theta)], -1).astype(np.float32)

    for k in (H * W, 64):  # full coverage and top-k truncation
        cands = np.asarray(extract_candidates(
            jnp.asarray(segm), jnp.asarray(geo), jnp.asarray(angle),
            k=k, segm_thresh=0.9))
        batched = get_boxes_from_candidates_batch(cands, H, W, 0.9)
        assert len(batched) == B
        for b in range(B):
            scalar = get_boxes_from_candidates(cands[b], H, W, 0.9)
            np.testing.assert_array_equal(scalar, batched[b])
        assert batched[3].shape == (0, 9)
