"""Detection training data pipeline (host, NumPy).

Re-implements the reference's infinite augment+target generator
(tools/data_gen.py:564-790): load image + GT, augment (pad, shear, scale,
invert, jitter), word-centered crop to a square input, generate EAST
targets at 1/4 scale, batch, normalize ``x/128 - 1``.

Differences by design:
- deterministic per-worker seeding (``np.random.Generator``);
- batches carry fixed-shape arrays ready for device transfer; variable-
  length GT (quads + transcriptions) rides along as host lists for the
  RoIRotate sampler.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import cv2
import numpy as np

from fots.data import augment as aug
from fots.data.annotations import load_annotation, load_image_list
from fots.data.prefetch import PrefetchPool
from fots.geometry import generate_rbox, generate_rbox2


@dataclass
class DetectionBatch:
    images: np.ndarray          # [B, H, W, 3] float32 normalized
    image_fns: List[str]
    score_maps: np.ndarray      # [B, H/4, W/4] float32
    geo_maps: np.ndarray        # [B, H/4, W/4, 5] float32
    training_masks: np.ndarray  # [B, H/4, W/4] uint8
    gt_idxs: np.ndarray         # [B, H/4, W/4] int64
    gt_quads: List[List[np.ndarray]]   # per-image kept GT quads
    labels: List[List[str]] = field(default_factory=list)


def detection_generator(
    train_list: str,
    input_size: int = 512,
    batch_size: int = 4,
    seed: int = 0,
    in_train: bool = True,
    allow_empty_frac: float = 0.4,
    geo_type: int = 0,
    augment: bool = True,
) -> Iterator[DetectionBatch]:
    """Infinite (train) or single-pass (eval) batch generator.

    geo_type selects the target formulation like the reference's flag
    (data_gen.py:711-714): 0 = edge distances, 1 = row/col-scan variant.
    augment=False skips the pad/shear/scale/invert/jitter chain (and makes
    the crop deterministic): with ``input_size=-1`` every sample is then
    the full image at its native /32 size — the exact eval-time input,
    which is what a memorization/overfit run should train on (the
    augmented path's random 0.5-2x scales give each native-size sample a
    different shape, recompiling every batch).
    """
    image_list = np.asarray(load_image_list(train_list))
    rng = np.random.default_rng(seed)
    index = np.arange(image_list.shape[0])

    # accumulates ACROSS epoch passes: with fewer (loadable) images than
    # batch_size, a per-pass reset would drop the partial batch every pass
    # and the train generator would never yield
    batch_items = []
    while True:
        if in_train:
            rng.shuffle(index)
        for i in index:
            item = _load_one(rng, str(image_list[i]), input_size, in_train,
                             allow_empty_frac, geo_type, augment)
            if item is None:
                continue
            batch_items.append(item)
            if len(batch_items) == batch_size:
                yield _collate(batch_items)
                batch_items = []
        if not in_train:
            if batch_items:
                yield _collate(batch_items)
            return


def _load_one(rng, im_name, input_size, in_train, allow_empty_frac, geo_type=0,
              augment=True):
    try:
        if not os.path.exists(im_name):
            return None
        im = cv2.imread(im_name)
        if im is None:
            return None
        polys, tags, labels = load_annotation(im_name, im.shape)
        allow_empty = rng.uniform() < allow_empty_frac

        if in_train and augment:
            if rng.uniform(0, 100) < 50 or im.shape[0] < 600 or im.shape[1] < 600:
                im, polys = aug.random_border_pad(rng, im, polys)
            if rng.uniform(0, 100) < 30:
                im, polys = aug.random_shear(rng, im, polys)
            im, polys = aug.random_scale(rng, im, polys)
            im = aug.random_invert(rng, im)

        resize_h = resize_w = input_size
        if input_size == -1:
            # native-size mode (reference data_gen.py:667-677)
            size = [im.shape[1] // 32 * 32, im.shape[0] // 32 * 32]
            while size[0] * size[1] > 1024 * 1024:
                size[0] = int(size[0] / 1.2 // 32) * 32
                size[1] = int(size[1] / 1.2 // 32) * 32
            resize_w, resize_h = size

        if augment:
            im, polys = aug.word_centered_crop(rng, im, (resize_h, resize_w), polys)
        else:
            im = im[:resize_h, :resize_w]  # deterministic top-left crop
        if im.shape[0] == 0 or im.shape[1] == 0:
            return None
        if im.shape[1] != resize_w or im.shape[0] != resize_h:
            sx = im.shape[1] / resize_w
            sy = im.shape[0] / resize_h
            if sx < 0.5 or sy < 0.5:
                return None
            im = cv2.resize(im, dsize=(resize_w, resize_h))
            if len(polys) > 0:
                polys[:, :, 0] /= sx
                polys[:, :, 1] /= sy

        if in_train and augment:
            # jitter AFTER the crop like the reference (data_gen.py:703-710)
            # — also ~100x cheaper than jittering the full padded image
            im = aug.color_jitter(rng, im)

        gen_fn = generate_rbox2 if geo_type == 1 else generate_rbox
        score, geo, mask, gt_idx, gt_out, labels_out = gen_fn(
            im.shape[:2], polys, tags, labels
        )
        if score.sum() == 0 and not allow_empty:
            return None
        return (im_name, im.astype(np.float32), score, geo, mask, gt_idx, gt_out, labels_out)
    except Exception:
        import traceback

        traceback.print_exc()
        return None


def _collate(items) -> DetectionBatch:
    images = np.stack([it[1] for it in items]).astype(np.float32)
    images = images / 128.0 - 1.0
    return DetectionBatch(
        images=images,
        image_fns=[it[0] for it in items],
        score_maps=np.stack([it[2] for it in items]),
        geo_maps=np.stack([it[3] for it in items]),
        training_masks=np.stack([it[4] for it in items]),
        gt_idxs=np.stack([it[5] for it in items]),
        gt_quads=[it[6] for it in items],
        labels=[it[7] for it in items],
    )


class _DetectionFactory:
    """Picklable per-worker generator factory (spawn-safe)."""

    def __init__(self, train_list, seed, kwargs):
        self.train_list = train_list
        self.seed = seed
        self.kwargs = kwargs

    def __call__(self, worker_id: int):
        return detection_generator(self.train_list,
                                   seed=self.seed + 1000 * worker_id + worker_id,
                                   **self.kwargs)


def detection_batches(train_list: str, num_workers: int = 4, seed: int = 0,
                      **kwargs) -> PrefetchPool:
    """Multiprocess-prefetched batches (replaces data_gen.get_batch)."""
    return PrefetchPool(_DetectionFactory(train_list, seed, kwargs),
                        num_workers=num_workers)
