"""Recognition evaluation CLI (mirrors reference tools/test_crnn.py +
tools/ocr_test_utils.py).

Evaluates a recognizer on pre-cropped word images: exact-match accuracy,
edit distance, per-script tables, worst cases; optional CSV.

Usage:
  python -m fots.cli.eval_ocr -train_list sample_train_data/MLT_CROPS/gt.txt
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-train_list",
                        default="/root/reference/sample_train_data/MLT_CROPS/gt.txt")
    parser.add_argument("-model", default=None, help="orbax checkpoint (joint model)")
    parser.add_argument("-arch", choices=("fots", "crnn"), default="fots")
    parser.add_argument("-norm_height", type=int, default=44)
    parser.add_argument("-out_csv", default=None)
    parser.add_argument("-out_html", default=None,
                        help="HTML report (reference ocr_test_utils vis_html)")
    parser.add_argument("-worst", type=int, default=10)
    parser.add_argument("-beam", type=int, default=0,
                        help="prefix beam search width (0 = greedy argmax)")
    args = parser.parse_args(argv)

    from fots.data.ocr_crops import ocr_crop_generator
    from fots.ocr_eval import OCRMetrics
    from fots.train_ocr import CRNNTrainer, FOTSRecognizerTrainer

    if args.arch == "fots":
        trainer = FOTSRecognizerTrainer(norm_height=args.norm_height)
        if args.model:
            from fots.checkpoint import restore_checkpoint

            trainer.state, _ = restore_checkpoint(args.model, trainer.state)
        norm_height = args.norm_height
    else:
        trainer = CRNNTrainer()
        if args.model:
            from fots.checkpoint import restore_checkpoint

            trainer.state, _ = restore_checkpoint(args.model, trainer.state)
        norm_height = 32

    metrics = OCRMetrics()
    gen = ocr_crop_generator(args.train_list, codec=trainer.codec, batch_size=4,
                             norm_height=norm_height, in_train=False)
    for batch in gen:
        preds = trainer.predict_texts(batch["images"], beam=args.beam)
        for p, gt in zip(preds, batch["texts"]):
            metrics.add(p, gt)

    print(json.dumps(metrics.summary(), indent=2, ensure_ascii=False))
    for d, gt, pred in metrics.worst_cases(args.worst):
        print(f"  ed={d}  gt={gt!r}  pred={pred!r}")
    if args.out_csv:
        metrics.to_csv(args.out_csv)
    if args.out_html:
        metrics.to_html(args.out_html, n_worst=max(args.worst, 50))


if __name__ == "__main__":
    main()
