"""ICDAR-style end-to-end evaluation CLI (mirrors reference tools/eval.py).

Runs the fused pipeline over an image list with GT, reports running
detection/e2e precision/recall/hmean.

Usage:
  python -m fots.cli.eval_e2e -model backup/ -images_list data/eval.txt
"""

from __future__ import annotations

import argparse
import json

import cv2
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-model", default=None)
    parser.add_argument("-h5", default=None)
    parser.add_argument("-images_list", required=True,
                        help="file listing image paths (gt_*.txt alongside)")
    parser.add_argument("-segm_thresh", type=float, default=0.5)
    parser.add_argument("-expand_w", type=float, default=0.0,
                        help="optional crop-width margin as a fraction of box "
                             "height (reference eval's w + h/4, eval.py:575)")
    parser.add_argument("-eval_text_length", type=int, default=3)
    parser.add_argument("-beam", type=int, default=0,
                        help="prefix beam search width for recognition "
                             "(0 = greedy argmax, reference parity)")
    parser.add_argument("-conf_gate", action="store_true",
                        help="reference low-confidence gate (eval.py:667-669): "
                             "skip detections with mean CTC confidence < 0.01 "
                             "whose transcription is exactly 3 chars")
    parser.add_argument("-ignore_dontcare", action="store_true",
                        help="ICDAR don't-care rule: detections overlapping "
                             "###/short GT leave the precision denominator "
                             "(the reference harness penalizes them)")
    parser.add_argument("-scale_up", action="store_true")
    parser.add_argument("-serve_hw", default=None, metavar="HxW",
                        help="evaluate through the fixed-shape batched "
                        "letterbox serving path (e.g. 704x1280) instead of "
                        "the per-image native-size path — the accuracy leg "
                        "of the serving resolution/throughput sweep")
    parser.add_argument("-split_words", action="store_true",
                        help="emit per-word split boxes as detections "
                             "(reference eval.py:579-601 process_splits path; "
                             "multi-word lines match word-level GT)")
    parser.add_argument("-out_json", default=None)
    parser.add_argument("-dump_json", default=None,
                        help="also write per-image detections + GT "
                             "(boxes, predicted and GT transcriptions)")
    args = parser.parse_args(argv)

    from fots.cli.detect import load_engine
    from fots.data.annotations import load_annotation, load_image_list
    from fots.evaluate import E2EMetrics

    engine = load_engine(args.model, args.h5, segm_thresh=args.segm_thresh,
                         expand_w_frac=args.expand_w, beam=args.beam)
    metrics = E2EMetrics(ignore_dontcare=args.ignore_dontcare)
    dump = []

    for i, path in enumerate(load_image_list(args.images_list)):
        im = cv2.imread(path)
        if im is None:
            continue
        polys, tags, labels = load_annotation(path, im.shape)
        if args.serve_hw:
            # batched letterbox path: results come back in ORIGINAL image
            # coordinates (batch_call maps through the letterbox scale)
            hw = tuple(int(v) for v in args.serve_hw.lower().split("x"))
            results = engine.batch_call([im], serve_hw=hw,
                                        split_words=args.split_words)[0]
            sy = sx = 1.0
        else:
            results, im_resized = engine(im, scale_up=args.scale_up,
                                         split_words=args.split_words)
            # map GT into resized coordinates
            sy = im_resized.shape[0] / im.shape[0]
            sx = im_resized.shape[1] / im.shape[1]
        gt_rect = (polys * np.array([sx, sy])).reshape(-1, 8) if len(polys) else np.zeros((0, 8))
        # the reference only emits detections whose transcription is at
        # least eval_text_length chars (eval.py:667-668,685): shorter reads
        # never enter the precision denominator
        results = [r for r in results
                   if len(r["text"].strip()) >= args.eval_text_length]
        if args.conf_gate:
            # reference eval.py:667-669: `if conf < 0.01 and len(det_text)==3`
            results = [r for r in results
                       if not (r.get("conf", 1.0) < 0.01
                               and len(r["text"].strip()) == 3)]
        if args.split_words:
            # note: the reference also computes a 2x-scale second OCR pass
            # here (eval.py:608-636 labels_pred2) but never consumes it —
            # dead code, intentionally not reproduced
            dets = []
            for r in results:
                if r.get("words"):
                    dets.extend((np.concatenate([w["quad"].reshape(8),
                                                 r["box"][8:9]]), w["text"],
                                 r.get("conf"))
                                for w in r["words"]
                                if len(w["text"].strip()) >= args.eval_text_length)
                else:
                    dets.append((r["box"], r["text"], r.get("conf")))
        else:
            dets = [(r["box"], r["text"], r.get("conf")) for r in results]
        confs = [c for *_x, c in dets]
        dets = [(b, t) for b, t, _c in dets]
        metrics.add_image(dets, gt_rect, labels,
                          eval_text_length=args.eval_text_length)
        if args.dump_json is not None:
            dump.append({
                "image": path,
                "detections": [{"box": np.asarray(b)[:8].tolist(),
                                "text": t,
                                "conf": None if c is None else float(c)}
                               for (b, t), c in zip(dets, confs)],
                "gt": [{"box": np.asarray(q).reshape(-1)[:8].tolist(),
                        "text": l} for q, l in zip(gt_rect, labels)],
            })
        if i % 10 == 0:
            s = metrics.summary()
            print(f"[{i}] det hmean {s['detection_hmean']:.3f} "
                  f"e2e hmean {s['e2e_hmean']:.3f}", flush=True)

    summary = metrics.summary()
    print(json.dumps(summary, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(summary, f, indent=2)
    if args.dump_json:
        with open(args.dump_json, "w") as f:
            json.dump(dump, f, indent=2)


if __name__ == "__main__":
    main()
