"""Recognition-only crop pipeline with width bucketing.

Re-implements the reference crop generator (tools/ocr_gen.py:57-213):
height-normalize each word image, snap width to the ``8 + 4*i`` bucket
grid with per-bucket batch sizes halving every 10 buckets, emit a batch
when a bucket fills.  This bucketing is exactly what a TPU wants — each
bucket is one compiled shape.

Labels here use :class:`fots.codec.LabelCodec` (blank=0, chars 1..N) by
default, or a 4-offset :class:`fots.codec.Codec4` for multilingual codec
files; Arabic transcriptions are reversed (reference ocr_gen.py:187-188).
Output labels are padded matrices + lengths (XLA CTC layout).
"""

from __future__ import annotations

import os
import unicodedata as ud
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np

from fots.codec import LabelCodec
from fots.data import augment as aug
from fots.data.prefetch import PrefetchPool

BUCKETS = tuple(8 + 4 * i for i in range(1, 100))  # reference ocr_gen.py:19-21
MAX_LABEL_LEN = 64


def parse_crop_list(list_path: str) -> List[Tuple[str, str]]:
    """Parse ``file, "text"`` / ``file text`` lines (ocr_gen.py:92-113)."""
    base_dir = os.path.dirname(list_path)
    out = []
    with open(list_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            delim = " " if " " in line.split(",")[0] else ","
            spl = line.split(delim)
            name = spl[0].strip()
            if name.endswith(","):
                name = name[:-1]
            txt = delim.join(spl[1:]).strip()
            if len(txt) > 1 and txt[0] == '"' and txt[-1] == '"':
                txt = txt[1:-1]
            if not txt:
                continue
            if not name.startswith("/"):
                name = os.path.join(base_dir, name)
            out.append((name, txt))
    return out


def batch_sizes_per_bucket(batch_size: int) -> List[int]:
    """Per-bucket batch size halving every 10 buckets (ocr_gen.py:67-72)."""
    sizes = []
    cb = batch_size
    for i in range(len(BUCKETS)):
        sizes.append(max(1, int(cb)))
        if i % 10 == 0 and cb > 2:
            cb /= 2
    return sizes


def best_bucket(width: int) -> int:
    diffs = [abs(width - b) for b in BUCKETS]
    return int(np.argmin(diffs))


def ocr_crop_generator(
    train_list: str,
    codec: Optional[LabelCodec] = None,
    batch_size: int = 8,
    norm_height: int = 32,
    rgb: bool = True,
    in_train: bool = True,
    seed: int = 0,
) -> Iterator[dict]:
    """Yields dicts: images [N,h,wb,C] normalized, labels [N,L] padded,
    label_lengths [N], texts (host list)."""
    codec = codec or LabelCodec()
    samples = parse_crop_list(train_list)
    rng = np.random.default_rng(seed)
    index = np.arange(len(samples))
    sizes = batch_sizes_per_bucket(batch_size)
    bucket_items: List[List] = [[] for _ in BUCKETS]

    while True:
        if in_train:
            rng.shuffle(index)
        for i in index:
            name, txt = samples[i]
            if not os.path.exists(name):
                continue
            im = cv2.imread(name) if rgb else cv2.imread(name, cv2.IMREAD_GRAYSCALE)
            if im is None:
                continue
            if im.shape[0] > im.shape[1] and len(txt) > 4:
                continue  # vertical text skipped (ocr_gen.py:128-132)
            scale = norm_height / float(im.shape[0])
            width = int(im.shape[1] * scale)
            if in_train:
                width += int(rng.integers(-2 * norm_height, 2 * norm_height + 1))
            b = best_bucket(width)
            if in_train and rng.integers(0, 101) < 10:
                b = int(np.clip(b + rng.integers(-1, 2), 0, len(BUCKETS) - 1))
            im = cv2.resize(im, (BUCKETS[b], norm_height))
            if im.ndim == 2:
                im = im[:, :, None]
            if in_train:
                if rng.integers(0, 101) < 10:
                    im = np.invert(im)
                if rng.integers(0, 101) < 10:
                    im = cv2.blur(im, (3, 3))
                    if im.ndim == 2:
                        im = im[:, :, None]
                if rng.integers(0, 101) < 10:
                    warp = cv2.getRotationMatrix2D((im.shape[1] / 2, im.shape[0] / 2), 0, 1)
                    warp[0, 1] = rng.uniform(-0.1, 0.1)
                    im = cv2.warpAffine(im, warp, (im.shape[1], im.shape[0]))
                    if im.ndim == 2:
                        im = im[:, :, None]
                if im.shape[2] == 3:
                    im = aug.color_jitter(rng, im)

            label_txt = txt
            try:
                if txt and "ARABIC" in ud.name(txt[0]):
                    label_txt = txt[::-1]  # reference ocr_gen.py:187-188
            except ValueError:
                pass

            bucket_items[b].append((im.astype(np.float32), label_txt, txt))
            if len(bucket_items[b]) == sizes[b]:
                yield _collate_bucket(bucket_items[b], codec)
                bucket_items[b] = []
        if not in_train:
            for b, items in enumerate(bucket_items):
                if items:
                    yield _collate_bucket(items, codec)
            return


def _collate_bucket(items, codec: LabelCodec) -> dict:
    images = np.stack([it[0] for it in items]) / 128.0 - 1.0
    texts = [it[1] for it in items]
    labels, lengths = codec.encode_padded(texts, MAX_LABEL_LEN)
    return {
        "images": images.astype(np.float32),
        "labels": labels,
        "label_lengths": lengths,
        "texts": [it[2] for it in items],
    }


class _OcrCropFactory:
    """Picklable per-worker generator factory (spawn-safe)."""

    def __init__(self, train_list, seed, kwargs):
        self.train_list = train_list
        self.seed = seed
        self.kwargs = kwargs

    def __call__(self, worker_id: int):
        return ocr_crop_generator(self.train_list,
                                  seed=self.seed + 7919 * worker_id, **self.kwargs)


def ocr_crop_batches(train_list: str, num_workers: int = 2, seed: int = 0,
                     **kwargs) -> PrefetchPool:
    return PrefetchPool(_OcrCropFactory(train_list, seed, kwargs),
                        num_workers=num_workers)
