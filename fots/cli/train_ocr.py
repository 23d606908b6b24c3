"""Recognition-branch training CLI (mirrors reference tools/train_ocr.py).

Trains the FOTS recognition head on pre-cropped word images with width
bucketing.

Usage:
  python -m fots.cli.train_ocr -train_list sample_train_data/MLT_CROPS/gt.txt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-train_list", default="/root/reference/sample_train_data/MLT_CROPS/gt.txt")
    parser.add_argument("-batch_size", type=int, default=8)
    parser.add_argument("-norm_height", type=int, default=44)
    parser.add_argument("-base_lr", type=float, default=1e-4)
    parser.add_argument("-max_iters", type=int, default=10000)
    parser.add_argument("-disp_interval", type=int, default=10)
    parser.add_argument("-num_readers", type=int, default=2)
    parser.add_argument("-seed", type=int, default=0)
    args = parser.parse_args(argv)

    from fots.data.ocr_crops import ocr_crop_batches
    from fots.train_ocr import FOTSRecognizerTrainer

    trainer = FOTSRecognizerTrainer(lr=args.base_lr, norm_height=args.norm_height,
                                    seed=args.seed)
    batches = ocr_crop_batches(
        args.train_list, num_workers=args.num_readers,
        batch_size=args.batch_size, norm_height=args.norm_height, seed=args.seed,
    )
    try:
        running = 0.0
        for i, batch in enumerate(batches):
            if i >= args.max_iters:
                break
            running += trainer.step(batch)
            if i % args.disp_interval == 0:
                print(f"step {i} ctc_loss {running / max(1, i % args.disp_interval + 1):.4f}",
                      flush=True)
                running = 0.0
    finally:
        batches.stop()


if __name__ == "__main__":
    main()
