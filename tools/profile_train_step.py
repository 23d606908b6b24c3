"""Joint train-step wall time A/B over stem schedules (real chip).

The per-subposition split form of conv1a (fots/ops/s2d.py:s2d_conv_split)
is the *inference* win — the dense derived kernel is MXU-bound forward.
Training's backward has a different cost profile (input grads read the
upstream grad once per split conv; weight grads contract over 4 smaller
windows), so the best schedule is measured, not assumed.

Usage: python tools/profile_train_step.py [--batch 4] [--size 512]
Prints wall ms/step for stem_split_conv1a on and off.
"""

import argparse
import time

import numpy as np


def bench_one(split: bool, b: int, size: int, iters: int = 8):
    import jax

    from fots.codec import LabelCodec
    from fots.data.detection import DetectionBatch
    from fots.models import FOTSDetector
    from fots.train import Trainer

    hs = size // 4
    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes, stem_split_conv1a=split)
    trainer = Trainer(model=model, codec=codec, input_size=size, seed=0)
    rng = np.random.default_rng(0)
    quads = [[np.array([[60, 60], [60, 120], [400, 120], [400, 60]],
                       np.float64)] for _ in range(b)]
    labels = [["BENCH"] for _ in range(b)]
    score = np.zeros((b, hs, hs), np.float32)
    score[:, 18:28, 18:96] = 1.0
    gt_idx = np.full((b, hs, hs), -1, np.int64)
    gt_idx[:, 18:28, 18:96] = 0
    batch = DetectionBatch(
        images=rng.standard_normal((b, size, size, 3)).astype(np.float32) * 0.1,
        image_fns=["bench"] * b,
        score_maps=score,
        geo_maps=rng.uniform(0, 8, (b, hs, hs, 5)).astype(np.float32),
        training_masks=np.ones((b, hs, hs), np.uint8),
        gt_idxs=gt_idx,
        gt_quads=quads,
        labels=labels,
    )
    trainer.step(batch)  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        trainer.step(batch)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    for split in (True, False):
        best, med = bench_one(split, args.batch, args.size)
        print(f"stem_split_conv1a={split}: best {best*1e3:.1f} ms/step, "
              f"median {med*1e3:.1f} ms/step "
              f"({args.batch / best:.1f} img/s best)", flush=True)


if __name__ == "__main__":
    main()
