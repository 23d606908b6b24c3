"""Stage-by-stage wall profile of the REAL-image serving path.

Reproduces bench.py's real-image config (random weights, score bias
bisected to a realistic candidate density) and times each host/device
stage of one FOTSInference pass over the 11 ICDAR2015 example images:

  letterbox | detect dispatch+sync | candidate d2h | host NMS |
  recognize dispatch (per bucket) | recognize sync+decode

plus the pipelined stream() wall time for the same batches, so the
overlap win (or loss) is visible.  Prints one JSON dict.

Usage:  python tools/profile_serving.py [--batches N]
"""

import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 704, 1280
BATCH = 16
MAX_CANDIDATES = 2048
EXAMPLE_DIR = "/root/reference/data/example_image"


def t():
    return time.perf_counter()


def main():
    import os

    try:
        os.nice(-10)
    except OSError:
        pass
    import fots.cli  # noqa: F401  (compile cache)
    import cv2
    import jax
    import jax.numpy as jnp

    from fots.codec import LabelCodec
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.ops.nms import (get_boxes_from_candidates_batch,
                              unpack_candidates)
    from fots.pipeline import FOTSInference

    n_batches = 3
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    variables = init_detector(model, jax.random.PRNGKey(0))

    # trained serving snapshot, when committed (same policy as bench.py):
    # real score maps, real box load, no bias games
    trained_step = None
    ckpt_npz = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "artifacts", "serving_params.npz")
    if os.path.exists(ckpt_npz):
        from fots.checkpoint import load_serving_params

        variables, trained_step = load_serving_params(ckpt_npz, variables)

    engine = FOTSInference(model, variables, codec=codec,
                           mixed_precision=True, masked_norm=True,
                           max_candidates=MAX_CANDIDATES)

    paths = sorted(glob.glob(EXAMPLE_DIR + "/*.jpg"))
    imgs = [cv2.imread(p) for p in paths]
    imgs = [im for im in imgs if im is not None]

    probe = [imgs[j % len(imgs)] for j in range(BATCH)]
    if trained_step is not None:
        batch, _ = engine._letterbox(probe, (H, W))
        cands, _f = engine._dispatch_detect(batch)
        dens = float((unpack_candidates(np.asarray(cands))[:, 0, :] > 0)
             .sum(axis=1).mean())
        out = {"candidate_pixels_per_image": round(dens, 1),
               "weights": f"trained step {trained_step}"}
    else:
        # --- bias bisect to a realistic candidate density (as bench.py) ---
        target = (100, 800)
        bias, lo_b, hi_b = -2.0, -8.0, 2.0
        dens = None
        for _ in range(8):
            eb = engine.variables["params"]["act"]["bias"]
            engine.variables["params"]["act"]["bias"] = jnp.full_like(eb, bias)
            batch, _ = engine._letterbox(probe, (H, W))
            cands, _f = engine._dispatch_detect(batch)
            c = np.asarray(cands)
            dens = float((unpack_candidates(c)[:, 0, :] > 0).sum(axis=1).mean())
            if dens < target[0]:
                lo_b = bias
            elif dens > target[1]:
                hi_b = bias
            else:
                break
            bias = (lo_b + hi_b) / 2
        out = {"candidate_pixels_per_image": round(dens, 1),
               "score_bias": round(bias, 3)}

    def batches(n):
        k = 0
        for _ in range(n):
            chunk = [imgs[(k + j) % len(imgs)] for j in range(BATCH)]
            k = (k + BATCH) % len(imgs)
            yield chunk

    # warm every program the measured batches will hit
    for _ in engine.stream(batches(max(2, n_batches)), serve_hw=(H, W)):
        pass

    # --- serialized stage timings (averaged over n_batches) ---
    stages = {k: 0.0 for k in
              ("letterbox_ms", "detect_wall_ms", "cands_d2h_ms",
               "host_nms_ms", "rec_dispatch_ms", "rec_finish_ms")}
    hs, ws = H // 4, W // 4
    total_boxes = 0
    bucket_hits = {}
    for chunk in batches(n_batches):
        t0 = t()
        batch, scales = engine._letterbox(chunk, (H, W))
        t1 = t()
        cands_dev, focr = engine._dispatch_detect(batch)
        # sync: wait for the device result (includes upload + forward)
        cands_dev.block_until_ready()
        _ = float(jax.device_get(jnp.sum(cands_dev[:, 0, :1])))
        t2 = t()
        cands = np.asarray(cands_dev)
        t3 = t()
        boxes = get_boxes_from_candidates_batch(
            cands[:BATCH], hs, ws, engine.segm_thresh, engine.iou_th1,
            engine.iou_th2)
        t4 = t()
        keys, jobs = engine._recognize_dispatch(boxes, focr)
        t5 = t()
        res = engine._recognize_finish(len(chunk), boxes, keys, jobs,
                                       scales, False)
        t6 = t()
        stages["letterbox_ms"] += (t1 - t0) * 1e3
        stages["detect_wall_ms"] += (t2 - t1) * 1e3
        stages["cands_d2h_ms"] += (t3 - t2) * 1e3
        stages["host_nms_ms"] += (t4 - t3) * 1e3
        stages["rec_dispatch_ms"] += (t5 - t4) * 1e3
        stages["rec_finish_ms"] += (t6 - t5) * 1e3
        total_boxes += sum(len(b) for b in boxes)
        for _idxs, ids_dev, _c in jobs:
            bucket_hits[tuple(ids_dev.shape)] = \
                bucket_hits.get(tuple(ids_dev.shape), 0) + 1
    for k in stages:
        stages[k] = round(stages[k] / n_batches, 2)
    out["serialized_stages_ms_per_batch16"] = stages
    out["serialized_total_ms"] = round(sum(stages.values()), 1)
    out["boxes_per_image"] = round(total_boxes / (n_batches * BATCH), 1)
    out["recognize_program_shapes"] = {str(k): v for k, v in bucket_hits.items()}

    # --- NMS sub-profile: decode vs native merge ---
    from fots.geometry import decode_candidates_np
    chunk = next(batches(1))
    batch, scales = engine._letterbox(chunk, (H, W))
    cands_dev, focr = engine._dispatch_detect(batch)
    cands = np.asarray(cands_dev)
    t0 = t()
    for _ in range(3):
        get_boxes_from_candidates_batch(cands[:BATCH], hs, ws, 0.5)
    nms_all = (t() - t0) / 3
    # decode-only portion
    c0 = unpack_candidates(cands[:BATCH])
    scores = c0[:, 0, :]
    valid = scores > 0.5
    t0 = t()
    for _ in range(3):
        rows = np.transpose(c0, (0, 2, 1)).reshape(-1, 8)
        decode_candidates_np(rows[:, 1:5], rows[:, 5], rows[:, 6],
                             rows[:, 7].astype(np.int64) % ws,
                             rows[:, 7].astype(np.int64) // ws)
    dec_only = (t() - t0) / 3
    out["nms_profile"] = {
        "total_ms": round(nms_all * 1e3, 2),
        "decode_est_ms": round(dec_only * 1e3, 2),
        "native_merge_est_ms": round((nms_all - dec_only) * 1e3, 2),
        "candidates_in": int(valid.sum()),
    }

    # --- staged-real loop (bench.py's headline) with EVERY ms accounted:
    # same device-letterbox engine, same 2-deep dispatch pipeline; each
    # host stage timed inside the loop, the remainder (= time the host
    # spent WAITING on the in-flight candidate pack) reported as
    # wait_for_device_ms.  VERDICT r3 item 3. ---
    from collections import deque

    from fots.pipeline import _RawBatch

    eng_dl = FOTSInference(model, variables, codec=codec,
                           mixed_precision=True, masked_norm=True,
                           max_candidates=MAX_CANDIDATES,
                           max_boxes=None if trained_step is not None else 16,
                           device_letterbox=True)
    chunk = [imgs[j % len(imgs)] for j in range(BATCH)]
    batch_staged, st_scales = eng_dl._letterbox(chunk, (H, W))
    if isinstance(batch_staged, _RawBatch):
        dev_imgs = jax.device_put(batch_staged.images)
        prog = eng_dl._raw_letterbox_program(
            batch_staged.images.shape[1:3], (H, W))
    else:
        dev_imgs = jax.device_put(batch_staged)
        prog = eng_dl._forward_sparse
    dev_imgs.block_until_ready()

    def staged_run(iters, acc=None):
        inflight = deque()
        rec_inflight = deque()

        def dispatch():
            c, quads = prog(eng_dl.variables, dev_imgs)
            try:
                c.copy_to_host_async()
            except AttributeError:
                pass
            inflight.append((c, eng_dl._wrap_focr(quads, BATCH, (H, W))))

        dispatch()
        dispatch()
        nb = 0
        for i in range(iters):
            t0 = t()
            eng_dl._letterbox(chunk, (H, W))
            t1 = t()
            c, f = inflight.popleft()
            cands = np.asarray(c)
            t2 = t()
            boxes = eng_dl._cap_boxes(get_boxes_from_candidates_batch(
                cands[:BATCH], hs, ws, eng_dl.segm_thresh, eng_dl.iou_th1,
                eng_dl.iou_th2))
            t3 = t()
            keys, jobs = eng_dl._recognize_dispatch(boxes, f)
            rec_inflight.append((boxes, keys, jobs))
            t4 = t()
            if i + 2 < iters:
                dispatch()
            t5 = t()
            # depth-2 recognition (bench.py posture): materialize the
            # PREVIOUS batch's recognition while this batch's runs behind
            # the next forward — its device time + id transfers hide there
            if len(rec_inflight) > 1:
                b2, k2, j2 = rec_inflight.popleft()
                eng_dl._recognize_finish(BATCH, b2, k2, j2,
                                         st_scales, False)
            t6 = t()
            nb += sum(len(b) for b in boxes)
            if acc is not None:
                acc["host_prep_ms"] += (t1 - t0) * 1e3
                acc["wait_for_device_ms"] += (t2 - t1) * 1e3
                acc["host_nms_ms"] += (t3 - t2) * 1e3
                acc["rec_dispatch_ms"] += (t4 - t3) * 1e3
                acc["next_dispatch_ms"] += (t5 - t4) * 1e3
                acc["rec_finish_prev_ms"] += (t6 - t5) * 1e3
        while rec_inflight:
            b2, k2, j2 = rec_inflight.popleft()
            eng_dl._recognize_finish(BATCH, b2, k2, j2, st_scales, False)
        while inflight:
            c, _f = inflight.popleft()
            np.asarray(c)
        return nb

    staged_iters = 8
    staged_run(2)  # warm
    best_wall, accs = None, None
    for _ in range(3):
        acc = {k: 0.0 for k in
               ("host_prep_ms", "wait_for_device_ms", "host_nms_ms",
                "rec_dispatch_ms", "next_dispatch_ms",
                "rec_finish_prev_ms")}
        t0 = t()
        nb = staged_run(staged_iters, acc)
        wall = t() - t0
        if best_wall is None or wall < best_wall:
            best_wall, accs = wall, acc
    for k in accs:
        accs[k] = round(accs[k] / staged_iters, 2)
    out["staged_loop"] = {
        "images_per_sec": round(BATCH * staged_iters / best_wall, 2),
        "wall_ms_per_batch16": round(best_wall / staged_iters * 1e3, 2),
        "stages_ms_per_batch16": accs,
        "accounted_ms": round(sum(accs.values()), 2),
        "boxes_per_image": round(nb / (staged_iters * BATCH), 1),
    }

    # --- recognition roofline at the REAL load (VERDICT r4 item 1):
    # per compiled recognition program, live vs padded rois, XLA FLOPs /
    # bytes, measured device time, MFU and %HBM-peak; plus the load's
    # aggregate padding efficiency (live roi-columns / padded ones). ---
    from fots.geometry import TARGET_H, rroi_from_box

    chunk = next(batches(1))
    batch, _sc = engine._letterbox(chunk, (H, W))
    per_image_boxes, focr = engine.detect_boxes_batch(batch)
    feat, fshape = engine._feat_args(focr)
    buckets = {}
    live_cols = 0.0
    for i, bxs in enumerate(per_image_boxes):
        for j in range(bxs.shape[0]):
            roi, bw, bh = rroi_from_box(bxs[j], i)
            from fots.pipeline import strip_width_for_box as _swb
            wbkt = _swb(bw, bh, buckets=engine.strip_buckets)
            buckets.setdefault(wbkt, []).append(roi)
            live_cols += min(wbkt, int(np.ceil(TARGET_H * bw / max(bh, 1e-6))))
    PEAK_BF16 = 197e12   # v5e MXU peak, bf16
    PEAK_HBM = 819e9     # v5e HBM bytes/s
    roof = {"per_program": {}, "load": {}}
    padded_cols = 0
    total_dev_ms = 0.0
    for width in sorted(buckets):
        rois_b = np.asarray(buckets[width], np.float32)
        csize = engine._roi_chunk(width)
        n_inv = -(-len(rois_b) // csize)
        padded_cols += n_inv * csize * width
        # compile-level cost of ONE chunk program
        sel = np.tile(np.asarray(engine._DUMMY_ROI, np.float32), (csize, 1))
        sel[: min(csize, len(rois_b))] = rois_b[:csize]
        sel_dev = jax.device_put(sel)
        lowered = engine._recognize.lower(engine.variables, feat, sel_dev,
                                          width=width, fshape=fshape)
        ca = lowered.compile().cost_analysis()
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        # device time: K back-to-back invocations, one sync (tunnel RTT
        # amortized; still RTT-contaminated by ~1-2 ms/invocation at
        # K=20 — treat as an upper bound).  Warm WITH a sync first so no
        # compile or in-flight work leaks into the timed loop.
        _ = float(jax.device_get(jnp.sum(
            engine._recognize(engine.variables, feat, sel_dev, width,
                              fshape)[1])))
        K, dt = 20, 1e9
        for _rep in range(2):
            t0 = t()
            outs = [engine._recognize(engine.variables, feat, sel_dev,
                                      width, fshape) for _ in range(K)]
            _ = float(jax.device_get(jnp.sum(outs[-1][1])))
            dt = min(dt, (t() - t0) / K)
        total_dev_ms += dt * 1e3 * n_inv
        roof["per_program"][f"w{width}"] = {
            "chunk_rois": int(csize),
            "invocations_at_this_load": int(n_inv),
            "live_rois": int(len(rois_b)),
            "padded_roi_slots": int(n_inv * csize),
            "roi_padding_efficiency": round(len(rois_b) / (n_inv * csize), 3),
            "gflops_per_invocation": round(flops / 1e9, 2),
            "bytes_mb_per_invocation": round(byts / 1e6, 1),
            "device_ms_per_invocation": round(dt * 1e3, 3),
            "mfu": round(flops / dt / PEAK_BF16, 4),
            "pct_hbm_peak": round(byts / dt / PEAK_HBM * 100, 1),
        }
    roof["load"] = {
        "boxes_per_batch16": int(sum(len(b) for b in per_image_boxes)),
        "live_strip_columns": int(live_cols),
        "padded_strip_columns": int(padded_cols),
        "column_padding_efficiency": round(live_cols / max(padded_cols, 1), 3),
        "recognition_device_ms_per_batch16": round(total_dev_ms, 2),
    }
    out["recognition_roofline"] = roof

    # --- pipelined stream wall for the same batches ---
    for rep in range(3):
        t0 = t()
        n_res = 0
        for res in engine.stream(batches(n_batches), serve_hw=(H, W)):
            n_res += len(res)
        wall = t() - t0
        key = "stream_wall_ms_per_batch16"
        out.setdefault(key, []).append(round(wall / n_batches * 1e3, 1))
    out["stream_images_per_sec_best"] = round(
        n_batches * BATCH / (min(out[key]) * n_batches / 1e3), 1)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
