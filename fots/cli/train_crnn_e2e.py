"""CRNN-on-GT-crops training from full scenes (mirrors reference
tools/train_crnn.1.py / .2.py: E2Edataset + process_crnn).

Usage:
  python -m fots.cli.train_crnn_e2e -train_list data/ICDAR2015.txt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-train_list", required=True)
    parser.add_argument("-batch_size", type=int, default=2)
    parser.add_argument("-input_size", type=int, default=512)
    parser.add_argument("-base_lr", type=float, default=1e-4)
    parser.add_argument("-max_iters", type=int, default=10000)
    parser.add_argument("-disp_interval", type=int, default=10)
    parser.add_argument("-eval_interval", type=int, default=500)
    parser.add_argument("-num_readers", type=int, default=2)
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-save_path", default=None, help="checkpoint dir")
    parser.add_argument("-checkpoint_every", type=int, default=1000)
    parser.add_argument("-model", default=None, help="orbax checkpoint to resume")
    args = parser.parse_args(argv)

    from fots.checkpoint import save_checkpoint, restore_checkpoint
    from fots.data.detection import detection_batches
    from fots.train_ocr import CRNNE2ETrainer

    trainer = CRNNE2ETrainer(lr=args.base_lr, seed=args.seed)
    if args.model:
        trainer.state, step0 = restore_checkpoint(args.model, trainer.state)
        print(f"resumed from {args.model} at step {step0}")
    batches = detection_batches(
        args.train_list, num_workers=args.num_readers,
        input_size=args.input_size, batch_size=args.batch_size, seed=args.seed,
    )
    i = 0
    try:
        for i, batch in enumerate(batches):
            if i >= args.max_iters:
                break
            loss = trainer.step(batch)
            if i % args.disp_interval == 0:
                print(f"step {i} ctc_loss {loss:.4f}", flush=True)
            if i > 0 and i % args.eval_interval == 0:
                preds, gts = trainer.predict(batch)
                correct = sum(p == g for p, g in zip(preds, gts))
                print(f"  eval: {correct}/{len(gts)} exact", flush=True)
            if args.save_path and i > 0 and i % args.checkpoint_every == 0:
                save_checkpoint(args.save_path, trainer.state, i)
    finally:
        batches.stop()
    if args.save_path:
        path = save_checkpoint(args.save_path, trainer.state, min(i + 1, args.max_iters))
        print(f"saved {path}")


if __name__ == "__main__":
    main()
