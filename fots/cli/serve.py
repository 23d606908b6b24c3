"""Batched throughput serving CLI: fixed-shape letterboxed batches.

Processes a folder in serving batches (one compiled program for any mix of
input sizes) — the high-throughput counterpart of detect.py.

Usage:
  python -m fots.cli.serve -test_folder imgs/ -output out/ -batch 16
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import cv2


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-model", default=None)
    parser.add_argument("-h5", default=None)
    parser.add_argument("-segm_thresh", type=float, default=0.5)
    parser.add_argument("-test_folder", default="/root/reference/data/example_image/")
    parser.add_argument("-output", default="./out")
    parser.add_argument("-batch", type=int, default=8)
    parser.add_argument("-height", type=int, default=704)
    parser.add_argument("-width", type=int, default=1280)
    parser.add_argument("-mixed_precision", action="store_true", default=True)
    parser.add_argument("-f32", dest="mixed_precision", action="store_false",
                        help="disable bf16 inference")
    parser.add_argument("-n_data", type=int, default=None,
                        help="data-parallel serving mesh size (chips)")
    parser.add_argument("-n_model", type=int, default=1)
    parser.add_argument("-split_words", action="store_true")
    args = parser.parse_args(argv)

    from fots.cli.detect import load_engine

    engine = load_engine(args.model, args.h5, segm_thresh=args.segm_thresh,
                         mixed_precision=args.mixed_precision,
                         n_data=args.n_data, n_model=args.n_model)
    os.makedirs(args.output, exist_ok=True)

    paths = sorted(glob.glob(os.path.join(os.path.realpath(args.test_folder), "*.jpg")))

    def batches():
        """Yield (paths, images) chunks; image loading overlaps device work
        because stream() pulls the next chunk while the chip runs."""
        for i in range(0, len(paths), args.batch):
            chunk = paths[i:i + args.batch]
            images = [cv2.imread(p) for p in chunk]
            keep = [(p, im) for p, im in zip(chunk, images) if im is not None]
            if keep:
                yield keep

    total = 0
    t0 = time.perf_counter()

    def image_batches():
        for keep in batches():
            yield keep, [im for _, im in keep]

    for keep, res_batch in engine.stream(image_batches(),
                                         serve_hw=(args.height, args.width),
                                         split_words=args.split_words,
                                         with_context=True):
        for (p, _im), res in zip(keep, res_batch):
            base = os.path.splitext(os.path.basename(p))[0]
            out = [{"box": r["box"].tolist(), "text": r["text"]} for r in res]
            with open(os.path.join(args.output, base + ".json"), "w") as f:
                json.dump(out, f)
            total += 1
    dt = time.perf_counter() - t0
    print(f"{total} images in {dt:.2f}s = {total / max(dt, 1e-9):.2f} images/sec")


if __name__ == "__main__":
    main()
