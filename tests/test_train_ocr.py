"""Recognition-only trainers: CRNN, FOTS branch, CRNN-E2E (GT crops)."""

import numpy as np
import pytest

from fots.codec import LabelCodec
from fots.data.detection import detection_generator
from fots.train_ocr import (
    CRNNE2ETrainer,
    CRNNTrainer,
    FOTSRecognizerTrainer,
    build_gt_crop_batch,
)
from tests.helpers import write_icdar_dataset


def _crop_batch(rng, codec, w=64, h=32, n=2):
    images = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    labels, lengths = codec.encode_padded(["ab", "c"][:n], 16)
    return {"images": images, "labels": labels, "label_lengths": lengths,
            "texts": ["ab", "c"][:n]}


def test_crnn_trainer_loss_decreases(rng):
    codec = LabelCodec(alphabet="abc")
    t = CRNNTrainer(codec=codec, lr=1e-3)
    batch = _crop_batch(rng, codec)
    losses = [t.step(batch) for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    preds = t.predict_texts(batch["images"])
    assert len(preds) == 2


@pytest.mark.slow  # 80-220 s full-trainer compiles
def test_fots_recognizer_trainer_runs(rng):
    codec = LabelCodec(alphabet="abc")
    t = FOTSRecognizerTrainer(codec=codec, lr=1e-3, norm_height=44)
    batch = _crop_batch(rng, codec, w=64, h=44)
    l0 = t.step(batch)
    l1 = t.step(batch)
    assert np.isfinite(l0) and np.isfinite(l1)
    preds = t.predict_texts(batch["images"])
    assert len(preds) == 2


def test_build_gt_crop_batch_filters():
    codec = LabelCodec()
    quads = [[np.array([[10, 10], [10, 30], [100, 30], [100, 10]], np.float64),
              np.array([[10, 50], [10, 70], [500, 70], [500, 50]], np.float64)]]
    labels = [["GOOD", "OUTSIDE"]]
    rois, lab, lens, mask, width, texts = build_gt_crop_batch(
        quads, labels, codec, (256, 256))
    assert mask.sum() == 1  # second quad out of bounds
    assert texts == ["GOOD"]
    assert width >= 32


@pytest.mark.slow  # 80-220 s full-trainer compiles
def test_crnn_e2e_trainer_on_synthetic(tmp_path, rng):
    list_path = write_icdar_dataset(str(tmp_path))
    # 256 = full synthetic image: crops keep the quads in bounds
    gen = detection_generator(list_path, input_size=256, batch_size=1, seed=0)
    t = CRNNE2ETrainer(lr=1e-3)
    losses = []
    preds = gts = None
    for _ in range(4):
        batch = next(gen)
        losses.append(t.step(batch))
        preds, gts = t.predict(batch)
        assert len(preds) == len(gts)
    assert all(np.isfinite(l) for l in losses)
    # at least one batch must contain usable GT rois (loss > 0)
    assert any(l > 0 for l in losses), losses
