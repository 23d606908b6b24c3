"""data/tshow-analog debug dump (fots/debug_vis.py).

Reference hook: src/ocr_process.py:224-249 writes sampled roi crops as
images; here we assert the crops land on disk with the GT text in the
filename and that an axis-aligned roi round-trips its pixel content.
"""

import glob
import os

import numpy as np

from fots.codec import LabelCodec
from fots.debug_vis import crop_rroi_image, dump_roi_crops
from fots.roirotate import MAX_LABEL_LEN, MAX_ROIS, RoiBatch


def _roi_batch(codec, texts, rois_list):
    rois = np.zeros((MAX_ROIS, 6), np.float32)
    labels = np.zeros((MAX_ROIS, MAX_LABEL_LEN), np.int32)
    lengths = np.zeros((MAX_ROIS,), np.int32)
    mask = np.zeros((MAX_ROIS,), np.float32)
    for j, (text, roi) in enumerate(zip(texts, rois_list)):
        rois[j] = roi
        ids, ln = codec.encode(text)
        labels[j, : len(ids)] = ids
        lengths[j] = int(ln[0]) if np.ndim(ln) else int(ln)
        mask[j] = 1.0
    return RoiBatch(rois=rois, labels=labels, label_lengths=lengths,
                    roi_mask=mask, strip_width=256,
                    n_predicted=1, n_gt=len(texts) - 1)


def test_crop_axis_aligned_roundtrip():
    im = np.zeros((64, 96, 3), np.uint8)
    im[20:32, 10:58] = (0, 255, 0)  # 12x48 green box
    crop = crop_rroi_image(im, [0, 34.0, 26.0, 12.0, 48.0, 0.0],
                           norm_height=12)
    assert crop.shape == (12, 48, 3)
    # interior pixels are pure green (edges may blend)
    assert (crop[3:-3, 3:-3, 1] > 200).all()
    assert (crop[3:-3, 3:-3, 0] < 50).all()


def test_dump_writes_named_crops(tmp_path):
    codec = LabelCodec()
    rb = _roi_batch(codec, ["HELLO", "ABBA"],
                    [[0, 40, 26, 12, 48, 0.0], [1, 40, 26, 12, 48, 15.0]])
    images = np.random.default_rng(0).uniform(-1, 1, (2, 64, 96, 3))
    n = dump_roi_crops(images.astype(np.float32), rb, codec,
                       str(tmp_path), step=7)
    assert n == 2
    files = sorted(os.path.basename(p)
                   for p in glob.glob(str(tmp_path / "*.jpg")))
    assert files[0] == "crop_000007_00_pred_HELLO.jpg"
    # raw decode keeps the doubled 'B'
    assert files[1] == "crop_000007_01_gt_ABBA.jpg"
