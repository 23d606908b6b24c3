"""Sustained joint-training throughput over the REAL data pipeline.

The committed `joint_train` bench number times `trainer.step` on one
synthetic batch repeated — a device floor.  The reference's training
loop cost includes the host pipeline: image load + augmentation + rbox
target generation streaming from the multiprocess generator
(/root/reference/train.py:79-141 pulling data_gen.get_batch).  This tool
measures that end to end: data/synth_big_train.txt streamed through
fots.data.detection.detection_batches (multiprocess prefetch +
augmentation, fots/data/prefetch.py) into Trainer.step for N steps, and
accounts the wall into

  wait_for_batch_ms — host blocked on the prefetch queue (pipeline
                      starvation; the prefetch workers also compete for
                      this 1-core host's CPU, which is the honest cost)
  step_wall_ms      — roi sampling + device step + metrics sync

Prints one JSON dict; CI-committed as artifacts/train_pipeline_profile.json.

Usage: python tools/profile_train_pipeline.py [--steps 100] [--batch 8]
       [--size 512] [--workers 3] [--list data/synth_big_train.txt]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--list", default="data/synth_big_train.txt")
    args = ap.parse_args()

    import os

    try:
        os.nice(-10)
    except OSError:
        pass
    import fots.cli  # noqa: F401  (compile cache policy)
    import numpy as np

    from fots.codec import LabelCodec
    from fots.data.detection import detection_batches
    from fots.models import FOTSDetector
    from fots.train import Trainer

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    trainer = Trainer(model=model, codec=codec, input_size=args.size, seed=0)

    batches = detection_batches(
        args.list, num_workers=args.workers, input_size=args.size,
        batch_size=args.batch, seed=0)
    it = iter(batches)
    out = {"config": {"steps": args.steps, "batch": args.batch,
                      "input_size": args.size, "workers": args.workers,
                      "train_list": args.list}}
    try:
        # compile + let the prefetch queue fill
        b0 = next(it)
        trainer.step(b0)
        trainer.step(b0)

        wait_ms, step_ms = [], []
        losses = []
        t_start = time.perf_counter()
        for _ in range(args.steps):
            t0 = time.perf_counter()
            batch = next(it)
            t1 = time.perf_counter()
            m = trainer.step(batch)
            t2 = time.perf_counter()
            wait_ms.append((t1 - t0) * 1e3)
            step_ms.append((t2 - t1) * 1e3)
            losses.append(float(m["loss"]))
        wall = time.perf_counter() - t_start
    finally:
        batches.stop()

    wait = np.asarray(wait_ms)
    step = np.asarray(step_ms)
    out["sustained_images_per_sec"] = round(args.batch * args.steps / wall, 2)
    out["wall_s"] = round(wall, 2)
    out["stages_ms_per_step"] = {
        "wait_for_batch": {"mean": round(float(wait.mean()), 1),
                           "p50": round(float(np.percentile(wait, 50)), 1),
                           "p90": round(float(np.percentile(wait, 90)), 1)},
        "step_wall": {"mean": round(float(step.mean()), 1),
                      "p50": round(float(np.percentile(step, 50)), 1),
                      "p90": round(float(np.percentile(step, 90)), 1)},
    }
    out["starved_step_fraction"] = round(float((wait > 1.0).mean()), 3)
    out["loss_first_last"] = [round(losses[0], 3), round(losses[-1], 3)]
    # the synthetic device floor for comparison (same shapes, no host
    # pipeline): repeated-batch steps
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        trainer.step(b0)
        ts.append(time.perf_counter() - t0)
    out["device_floor_images_per_sec"] = round(args.batch / min(ts), 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
