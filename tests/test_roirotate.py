"""RoIRotate training sampler: filters, padding, reference-parity quirks."""

import numpy as np

from fots.codec import LabelCodec
from fots.roirotate import MAX_ROIS, sample_rois


BOX_H = 40  # tall enough that the 0.25-px decode offset keeps axis IoU >= 0.9


def _gt_setup(words=("HELLO", "WORLD"), hs=64, ws=64):
    quads = []
    score = np.zeros((1, hs, ws), np.float32)
    gt_idx = np.full((1, hs, ws), -1, np.int64)
    for i, w in enumerate(words):
        y0 = 40 + i * 80
        q = np.array([[20, y0], [20, y0 + BOX_H], [180, y0 + BOX_H], [180, y0]],
                     np.float64)
        quads.append(q)
        ys, xs = slice(y0 // 4, (y0 + BOX_H) // 4), slice(5, 45)
        score[0, ys, xs] = 1
        gt_idx[0, ys, xs] = i
    return quads, list(words), score, gt_idx


def test_gt_only_sampling():
    rng = np.random.default_rng(0)
    quads, words, score, gt_idx = _gt_setup()
    rb = sample_rois(rng, score, gt_idx, [quads], [words], (256, 256),
                     LabelCodec(), jitter=False)
    assert rb.rois.shape == (MAX_ROIS, 6)
    assert rb.roi_mask.sum() == 2
    assert rb.n_gt == 2 and rb.n_predicted == 0
    # labels encoded
    assert rb.label_lengths[0] == 5 and rb.label_lengths[1] == 5
    assert (rb.label_lengths[2:] == 0).all()
    # roi geometry: center/size of the first word quad
    np.testing.assert_allclose(rb.rois[0, 1:3], [100, 60], atol=1e-3)
    np.testing.assert_allclose(rb.rois[0, 3], BOX_H, atol=1e-3)  # h
    np.testing.assert_allclose(rb.rois[0, 4], 160, atol=1e-3)    # w
    assert rb.strip_width >= 32


def test_ignore_tags_and_out_of_image_filtered():
    rng = np.random.default_rng(0)
    quads, words, score, gt_idx = _gt_setup()
    words[0] = "##bad"
    quads.append(np.array([[200, 10], [200, 30], [400, 30], [400, 10]], np.float64))
    words.append("OUT")  # x max 400 > 256 -> filtered
    rb = sample_rois(rng, score, gt_idx, [quads], [words], (256, 256),
                     LabelCodec(), jitter=False)
    assert rb.roi_mask.sum() == 1
    assert rb.n_gt == 1


def test_predicted_roi_sampling_with_perfect_predictions():
    rng = np.random.default_rng(0)
    quads, words, score, gt_idx = _gt_setup()
    hs, ws = score.shape[1:]
    segm = score.copy()  # perfect score prediction
    geo = np.zeros((1, hs, ws, 4), np.float32)
    angle = np.zeros((1, hs, ws, 2), np.float32)
    angle[..., 1] = 1.0  # horizontal
    # perfect distances: to quad edges at map scale
    rows = BOX_H // 4
    for i in range(2):
        y0 = (40 + i * 80) // 4
        for y in range(y0, y0 + rows):
            for x in range(5, 45):
                geo[0, y, x] = [y - y0 + 0.25, y0 + rows - y - 0.25,
                                x - 5 + 0.25, 45 - x - 0.25]
    rb = sample_rois(rng, score, gt_idx, [quads], [words], (256, 256),
                     LabelCodec(), segm_pred=segm, geo_pred=geo,
                     angle_pred=angle, jitter=False)
    assert rb.n_predicted > 0   # some predicted rois pass the IoU>=0.9 gate
    assert rb.n_gt == 2
    assert rb.roi_mask.sum() == rb.n_predicted + rb.n_gt


def test_cap_at_max_rois():
    rng = np.random.default_rng(0)
    words = [f"W{i}" for i in range(40)]
    quads = []
    score = np.zeros((1, 256, 256), np.float32)
    gt_idx = np.full((1, 256, 256), -1, np.int64)
    for i in range(40):
        y0 = 10 + i * 20
        quads.append(np.array([[10, y0], [10, y0 + 12], [100, y0 + 12], [100, y0]],
                              np.float64))
    rb = sample_rois(rng, score, gt_idx, [quads], [words], (1024, 1024),
                     LabelCodec(), jitter=False)
    assert rb.roi_mask.sum() == MAX_ROIS


def test_empty_batch_is_valid():
    rng = np.random.default_rng(0)
    score = np.zeros((1, 16, 16), np.float32)
    gt_idx = np.full((1, 16, 16), -1, np.int64)
    rb = sample_rois(rng, score, gt_idx, [[]], [[]], (64, 64), LabelCodec())
    assert rb.roi_mask.sum() == 0
    assert rb.rois.shape == (MAX_ROIS, 6)
    assert rb.strip_width >= 32
