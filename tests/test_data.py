"""Data pipeline tests on synthetic fixtures (hermetic) + reference samples
(when mounted)."""

import os

import numpy as np
import pytest

from fots.data.annotations import load_annotation, parse_icdar_lines, parse_mlt_lines
from fots.data.detection import detection_generator
from fots.data.ocr_crops import (
    BUCKETS,
    batch_sizes_per_bucket,
    best_bucket,
    ocr_crop_generator,
    parse_crop_list,
)
from tests.helpers import write_icdar_dataset

REF = "/root/reference/sample_train_data"


def test_parse_icdar_lines_with_roll():
    lines = ["462,113,526,107,528,128,465,134,ARMANI"]
    polys, tags, labels = parse_icdar_lines(lines, roll_icdar=True)
    assert polys.shape == (1, 4, 2)
    assert labels == ["ARMANI"]
    assert not tags[0]
    # roll by 2: last point (465,134) becomes first
    np.testing.assert_allclose(polys[0, 0], [465, 134])


def test_parse_icdar_ignore_tags():
    lines = ["0,0,10,0,10,10,0,10,1,###ignore", "0,0,10,0,10,10,0,10,1,word"]
    polys, tags, labels = parse_icdar_lines(lines, roll_icdar=False)
    assert tags.tolist() == [True, False]
    assert labels == ["###ignore", "word"]


def test_parse_mlt_lines():
    lines = ["1 0.5 0.5 0.2 0.05 0.0 hello world"]
    polys, tags, labels = parse_mlt_lines(lines, (200, 400))
    assert polys.shape == (1, 4, 2)
    assert labels == ["hello world"]
    centers = polys[0].mean(0)
    np.testing.assert_allclose(centers, [200, 100], atol=1.0)


def test_load_annotation_reference_sample():
    img = os.path.join(REF, "MLT/icdar-2015-Ch4/Train/img_784.jpg")
    if not os.path.exists(img):
        pytest.skip("reference not mounted")
    polys, tags, labels = load_annotation(img, (720, 1280, 3))
    assert polys.shape[0] == 15
    assert "ARMANI" in labels


def test_detection_generator_synthetic(tmp_path):
    list_path = write_icdar_dataset(str(tmp_path))
    gen = detection_generator(list_path, input_size=256, batch_size=2, seed=3,
                              in_train=True)
    batch = next(gen)
    assert batch.images.shape == (2, 256, 256, 3)
    assert batch.images.min() >= -1.0 and batch.images.max() <= 1.0
    assert batch.score_maps.shape == (2, 64, 64)
    assert batch.geo_maps.shape == (2, 64, 64, 5)
    assert batch.training_masks.shape == (2, 64, 64)
    # at least one image in the batch should contain text pixels
    assert batch.score_maps.sum() > 0
    assert any(len(q) > 0 for q in batch.gt_quads)


def test_detection_generator_fewer_images_than_batch(tmp_path):
    """Partial batches must persist across epoch passes: with a 1-image
    list and batch_size=2 the generator must still yield (regression — a
    per-pass reset made it spin forever)."""
    list_path = write_icdar_dataset(str(tmp_path), n_images=1)
    gen = detection_generator(list_path, input_size=256, batch_size=2, seed=0,
                              in_train=True)
    batch = next(gen)
    assert batch.images.shape[0] == 2


def test_detection_generator_eval_mode_terminates(tmp_path):
    list_path = write_icdar_dataset(str(tmp_path), n_images=3)
    gen = detection_generator(list_path, input_size=256, batch_size=2, seed=0,
                              in_train=False)
    batches = list(gen)
    assert 1 <= len(batches) <= 2
    total = sum(b.images.shape[0] for b in batches)
    assert total <= 3


def test_bucket_grid_matches_reference():
    assert BUCKETS[0] == 12 and BUCKETS[1] == 16  # 8 + 4*i
    assert best_bucket(13) in (0, 1)
    sizes = batch_sizes_per_bucket(8)
    assert sizes[0] == 8
    assert sizes[-1] <= sizes[0]
    assert all(s >= 1 for s in sizes)


def test_parse_crop_list_reference():
    gt = os.path.join(REF, "MLT_CROPS/gt.txt")
    if not os.path.exists(gt):
        pytest.skip("reference not mounted")
    samples = parse_crop_list(gt)
    assert len(samples) == 4
    assert samples[0][1] == "Ngee"


def test_ocr_crop_generator_reference():
    gt = os.path.join(REF, "MLT_CROPS/gt.txt")
    if not os.path.exists(gt):
        pytest.skip("reference not mounted")
    gen = ocr_crop_generator(gt, batch_size=1, in_train=False, seed=0)
    batches = list(gen)
    assert len(batches) >= 1
    b = batches[0]
    assert b["images"].ndim == 4 and b["images"].shape[1] == 32
    assert b["images"].shape[2] in BUCKETS
    assert b["labels"].shape[0] == b["images"].shape[0]
    assert (b["label_lengths"] > 0).all()
