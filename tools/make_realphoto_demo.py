"""Real-photography demo artifacts: the reference's signature workflow.

The reference README's demo loop runs the model over
``data/example_image/*.jpg`` — 11 real ICDAR2015 photos
(/root/reference/test.py:75, README.md:29-49).  This runs the committed
serving snapshot (trained on SYNTHETIC scenes, docs/ACCURACY.md) over
those photos and commits what it actually finds: overlays plus a
per-image JSON of box counts / scores / transcriptions.

There is NO ground truth here — the point is to make the synth->real
domain gap a visible artifact instead of a caveat paragraph.  Expect
hallucinated detections on texture (clothing stripes, railings) and
garbled transcriptions: the synthetic training distribution (Hershey
fonts on rendered backgrounds) does not cover real photography, and the
numbers below say exactly how far.

Usage: python tools/make_realphoto_demo.py [--out artifacts/realphoto_demo]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

EXAMPLE_DIR = "/root/reference/data/example_image"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/realphoto_demo")
    ap.add_argument("--model", default="artifacts/serving_params.npz")
    args = ap.parse_args()

    import fots.cli  # noqa: F401  (compile cache)
    import cv2
    import numpy as np

    from fots.cli.detect import load_engine

    engine = load_engine(args.model)
    os.makedirs(args.out, exist_ok=True)

    report = {"model": args.model, "source": EXAMPLE_DIR,
              "note": "no ground truth exists for these photos; the "
                      "committed model is trained on synthetic scenes "
                      "only — this artifact documents the synth->real "
                      "domain gap (docs/ACCURACY.md)",
              "images": {}}
    total_boxes = 0
    confs_all = []
    for path in sorted(glob.glob(os.path.join(EXAMPLE_DIR, "*.jpg"))):
        im = cv2.imread(path)
        if im is None:
            continue
        results, im_resized = engine(im)
        draw = im_resized.copy()
        entries = []
        for r in results:
            b = r["box"]
            pts = b[:8].reshape(4, 2).astype(np.int32)
            cv2.polylines(draw, [pts], True, (0, 255, 0), 2)
            cv2.putText(draw, r["text"], (int(b[0]), int(b[1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            entries.append({"quad": [round(float(v), 1) for v in b[:8]],
                            "score": round(float(b[8]), 3),
                            "text": r["text"],
                            "conf": round(float(r["conf"]), 3)})
            confs_all.append(float(r["conf"]))
        base = os.path.basename(path)
        cv2.imwrite(os.path.join(args.out, base), draw,
                    [cv2.IMWRITE_JPEG_QUALITY, 85])
        report["images"][base] = {"n_boxes": len(entries), "boxes": entries}
        total_boxes += len(entries)
        print(f"{base}: {len(entries)} boxes", flush=True)

    n_img = len(report["images"])
    report["summary"] = {
        "images": n_img,
        "boxes_total": total_boxes,
        "boxes_per_image": round(total_boxes / max(n_img, 1), 1),
        "recognition_conf_mean": round(float(np.mean(confs_all)), 3)
        if confs_all else None,
        "recognition_conf_p50": round(float(np.median(confs_all)), 3)
        if confs_all else None,
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1))


if __name__ == "__main__":
    main()
