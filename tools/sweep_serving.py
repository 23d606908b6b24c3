"""Serving resolution x batch sweep: throughput AND held-out accuracy.

VERDICT r3 item 3: the 10x-vs-paper north star (>= 220 img/s) must be
priced in hmean.  For each serve resolution this measures

- staged-real throughput (bench.py's headline loop: device-staged image
  bytes, everything else live) at batch 16 and 32, trained weights;
- held-out detection/e2e hmean on data/synth_big_eval.txt through the
  SAME fixed-shape letterbox path (``fots.cli.eval_e2e -serve_hw``),
  run as a subprocess per resolution.

Writes artifacts/serving_sweep.json and prints it.

Usage: python tools/sweep_serving.py [--skip-accuracy] [--ckpt DIR]
"""

import json
import os
import subprocess
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")

CONFIGS = [(704, 1280), (576, 1024), (512, 896)]
BATCHES = [16, 32]
ITERS = 8
EXAMPLE_DIR = "/root/reference/data/example_image"


def staged_real(engine, imgs, hw, batch, iters=ITERS):
    import jax

    from fots.ops.nms import get_boxes_from_candidates_batch
    from fots.pipeline import _RawBatch

    h, w = hw
    hs, ws = h // 4, w // 4
    chunk = [imgs[j % len(imgs)] for j in range(batch)]
    batch_staged, scales = engine._letterbox(chunk, hw)
    if isinstance(batch_staged, _RawBatch):
        dev_imgs = jax.device_put(batch_staged.images)
        prog = engine._raw_letterbox_program(batch_staged.images.shape[1:3], hw)
    else:
        dev_imgs = jax.device_put(batch_staged)
        prog = engine._forward_sparse
    dev_imgs.block_until_ready()

    def run(iters):
        inflight = deque()
        rec_inflight = deque()

        def dispatch():
            c, quads = prog(engine.variables, dev_imgs)
            try:
                c.copy_to_host_async()
            except AttributeError:
                pass
            inflight.append((c, engine._wrap_focr(quads, dev_imgs.shape[0],
                                                  hw)))

        dispatch()
        dispatch()
        nb = 0
        for i in range(iters):
            engine._letterbox(chunk, hw)
            c, f = inflight.popleft()
            cands = np.asarray(c)
            boxes = engine._cap_boxes(get_boxes_from_candidates_batch(
                cands[:batch], hs, ws, engine.segm_thresh, engine.iou_th1,
                engine.iou_th2))
            keys, jobs = engine._recognize_dispatch(boxes, f)
            rec_inflight.append((boxes, keys, jobs))
            if i + 2 < iters:
                dispatch()
            # depth-2 recognition (as bench.py): materialize the PREVIOUS
            # batch's jobs while this batch's run behind the next forward
            if len(rec_inflight) > 1:
                b2, k2, j2 = rec_inflight.popleft()
                engine._recognize_finish(batch, b2, k2, j2, scales, False)
            nb = sum(len(b) for b in boxes)
        while rec_inflight:
            b2, k2, j2 = rec_inflight.popleft()
            engine._recognize_finish(batch, b2, k2, j2, scales, False)
        while inflight:
            c, _f = inflight.popleft()
            np.asarray(c)
        return nb

    nb = run(2)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    return {
        "images_per_sec": round(batch * iters / best, 2),
        "images_per_sec_median": round(
            batch * iters / sorted(ts)[len(ts) // 2], 2),
        "boxes_per_image": round(nb / batch, 1),
    }


def main():
    try:
        os.nice(-10)
    except OSError:
        pass
    import fots.cli  # noqa: F401
    import cv2
    import glob
    import jax

    from fots.checkpoint import load_serving_params
    from fots.codec import LabelCodec
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.pipeline import FOTSInference

    ckpt_dir = "ckpt/synthbig"
    if "--ckpt" in sys.argv:
        ckpt_dir = sys.argv[sys.argv.index("--ckpt") + 1]

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    variables = init_detector(model, jax.random.PRNGKey(0))
    npz = "artifacts/serving_params.npz"
    trained_step = None
    if os.path.exists(npz):
        variables, trained_step = load_serving_params(npz, variables)

    imgs = [cv2.imread(p) for p in sorted(glob.glob(EXAMPLE_DIR + "/*.jpg"))]
    imgs = [im for im in imgs if im is not None]

    out = {"weights": f"trained step {trained_step}" if trained_step
           else "random-init", "anchor_images_per_sec_10x": 220.0,
           "configs": {}}
    for hw in CONFIGS:
        key = f"{hw[0]}x{hw[1]}"
        row = {}
        for b in BATCHES:
            engine = FOTSInference(model, variables, codec=codec,
                                   mixed_precision=True, masked_norm=True,
                                   max_candidates=1024,
                                   max_boxes=None if trained_step else 16,
                                   device_letterbox=True)
            row[f"batch{b}"] = staged_real(engine, imgs, hw, b)
            print(f"[{key} b{b}] {row[f'batch{b}']}", flush=True)
        out["configs"][key] = row

    if "--skip-accuracy" not in sys.argv and os.path.exists(ckpt_dir):
        for hw in CONFIGS:
            key = f"{hw[0]}x{hw[1]}"
            oj = f"/tmp/sweep_eval_{key}.json"
            r = subprocess.run(
                [sys.executable, "-m", "fots.cli.eval_e2e",
                 "-model", ckpt_dir, "-serve_hw", key,
                 "-images_list", "data/synth_big_eval.txt",
                 "-out_json", oj],
                capture_output=True, text=True, timeout=3600)
            if r.returncode == 0 and os.path.exists(oj):
                with open(oj) as f:
                    s = json.load(f)
                out["configs"][key]["heldout"] = {
                    "detection_hmean": s["detection_hmean"],
                    "e2e_hmean": s["e2e_hmean"],
                }
            else:
                out["configs"][key]["heldout_error"] = r.stderr[-500:]
            print(f"[{key} accuracy] {out['configs'][key].get('heldout')}",
                  flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/serving_sweep.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
