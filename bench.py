"""E2E inference throughput benchmark (one real chip).

Measures the full fused FOTS pipeline per image at a fixed serving shape
(1280x704, the resized shape of the ICDAR2015 example images):

  device: detector forward -> on-device top-k NMS candidate extraction
          (fots/ops/nms.py:extract_candidates; only ~k*32B per image
          crosses the host link instead of the full head maps) + focr
  host:   candidate transfer, vectorized quad decode + locality-aware NMS
  device: RoIRotate (bucketed) + recognition head + argmax
  host:   CTC-collapse decode to text

Batches are software-pipelined exactly as the serving path allows: batch
i's host NMS + text decode overlap batch i+1's device forward; each
batch's recognition is dispatched only after its own NMS completes.

No pretrained weights are published by the reference, so the benchmark
runs with deterministically-initialized weights; the synthetic config
biases the score head to -4 (empty live maps) and charges a fixed 20
boxes/image at the 128-wide strip bucket plus a realistic ~8-word
synthetic NMS field, so every stage's cost is represented at a controlled
load.  The real-image config runs the actual serving engine
(fots.pipeline.FOTSInference.stream) over the 11 ICDAR2015 images in
/root/reference/data/example_image with the score bias calibrated to a
realistic candidate density — live NMS, variable box counts, real strip
bucket mix.

Prints ONE JSON line:
  {"metric": "icdar2015_e2e_images_per_sec", "value": N,
   "unit": "images/sec", "vs_baseline": N / 22.0, "median": N,
   "extra": {...}}
- value is best-of-5 (the tunnel to the chip varies ~1.5x between
  identical runs; noise only ever slows a pass), median is the median
  pass so the number is interpretable (see README "Performance").
  The process renices itself to -10 and reports a `host_contention`
  probe: round 1's driver capture was halved by orphaned data-loader
  workers owning the single host core.
- vs_baseline anchors on the FOTS paper's 22.0 fps real-time figure on a
  TitanX (arXiv:1801.01671): the reference repo itself publishes no
  numbers (BASELINE.md), so this is a literature anchor, not a measured
  reference-GPU baseline.
- extra carries: real-image e2e img/s, RoIRotate crops/sec, recognition
  crops/sec, detector-forward MFU, and a device-vs-wall stage profile.

`python bench.py --train` additionally times the joint train step
(BASELINE config 5) — excluded from the default run because its remote
compile is the slowest single program.
"""

import json
import sys
import time

import numpy as np


H, W = 704, 1280          # ICDAR2015 eval shape, /32 multiples
BATCH = 16                # images per compiled program (serving batch);
                          # also amortizes the remote-dispatch floor
N_BOXES = 20              # recognition workload per image
STRIP_W = 128
MAX_CANDIDATES = 2048     # on-device top-k NMS candidate cap per image
WARMUP = 2
ITERS = 8
DEPTH = 3                 # in-flight detector forwards (rides out the
                          # tunnel's RTT spikes; 2 suffices on a quiet link)
MIXED_PRECISION = True    # bf16 backbone/recognizer, f32 geometry heads
EXAMPLE_DIR = "/root/reference/data/example_image"
V5E_PEAK_BF16_FLOPS = 197e12   # v5e chip peak (jax-ml.github.io/scaling-book)


def _synthetic_nms_maps():
    """A realistic candidate field: 8 words -> ~700 candidates."""
    hs, ws = H // 4, W // 4
    segm = np.zeros((hs, ws), np.float32)
    geo = np.zeros((hs, ws, 4), np.float32)
    angle = np.zeros((hs, ws, 2), np.float32)
    angle[..., 1] = 1.0
    rng = np.random.default_rng(0)
    for _ in range(8):
        y0 = int(rng.integers(5, hs - 15))
        x0 = int(rng.integers(5, ws - 40))
        h_box, w_box = int(rng.integers(4, 8)), int(rng.integers(15, 35))
        for y in range(y0, y0 + h_box):
            for x in range(x0, x0 + w_box):
                segm[y, x] = 0.9
                geo[y, x] = [y - y0 + 0.5, y0 + h_box - y - 0.5,
                             x - x0 + 0.5, x0 + w_box - x - 0.5]
    return segm, geo, angle


def _pack_synthetic_candidates(segm, geo, angle, k, thresh=0.5):
    """Host-side packing of the synthetic field into extract_candidates'
    [8, k] format, so the charged NMS cost matches the serving path."""
    ys, xs = np.nonzero(segm > thresh)
    idx = (ys * segm.shape[1] + xs).astype(np.float32)
    rows = np.concatenate(
        [segm[ys, xs, None], geo[ys, xs], angle[ys, xs], idx[:, None]], -1)
    out = np.full((k, 8), -1.0, np.float32)
    out[: min(len(rows), k)] = rows[:k]
    return np.ascontiguousarray(out.T)


def _sync(x):
    """True device sync: device_get a reduction of x.

    jax.block_until_ready does not reliably block over the axon tunnel
    (timing with it reports absurd sub-ms numbers); only materializing a
    value on the host proves the program ran.
    """
    import jax
    import jax.numpy as jnp

    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def _best_median(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def _host_contention_probe(ms=80.0):
    """Ratio of wall time to busy-spin CPU time over a short burn.

    The host has ONE core; any stray process (e.g. an orphaned data-loader
    worker) starves the pipelined serving loop's host stages and halves
    the measured throughput.  1.0 = quiet core; >1.3 = contended capture."""
    import math

    t0w, t0c = time.perf_counter(), time.process_time()
    x = 0.0
    while (time.process_time() - t0c) * 1e3 < ms:
        x += math.sin(x) + 1.0
    wall = time.perf_counter() - t0w
    cpu = time.process_time() - t0c
    return round(wall / max(cpu, 1e-9), 3)


def main():
    import os

    try:
        os.nice(-10)  # serving loop is latency-sensitive on the 1-core host
    except OSError:
        pass
    import fots.cli  # noqa: F401  (enables the persistent XLA compile cache)
    import jax
    import jax.numpy as jnp

    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.ops.nms import (extract_candidates,
                              get_boxes_from_candidates_batch)
    from fots.ops.rroi_align import rroi_align
    from fots.roirotate import POOLED_HEIGHT
    from fots.codec import LabelCodec

    from fots.pipeline import cast_params_bf16

    extra = {}
    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    # tiny init shape: the model is fully convolutional, so param shapes
    # (and values — fan-in initializers never see activations) are
    # independent of the serving resolution; a big init shape only buys
    # minutes of pointless remote compile
    variables_f32 = init_detector(model, jax.random.PRNGKey(0))
    # synthetic config: empty live score map (NMS cost charged separately
    # on the synthetic candidate field below)
    variables_f32["params"]["act"]["bias"] = jnp.full_like(
        variables_f32["params"]["act"]["bias"], -4.0)
    variables = (cast_params_bf16(dict(variables_f32))
                 if MIXED_PRECISION else variables_f32)

    @jax.jit
    def forward(variables, images):
        if MIXED_PRECISION:
            images = images.astype(jnp.bfloat16)
        out = model.apply(variables, images, train=False)
        cands = extract_candidates(
            out["segm"][0][..., 0].astype(jnp.float32),
            out["rbox"][0].astype(jnp.float32),
            out["angle"][0].astype(jnp.float32),
            MAX_CANDIDATES, 0.5)
        return cands, out["focr"]

    @jax.jit
    def recognize(variables, focr, rois):
        strips = rroi_align(focr, rois, POOLED_HEIGHT, STRIP_W, 0.25)
        logp = model.apply(variables, strips, train=False,
                           method=FOTSDetector.recognize)
        return jnp.argmax(logp, axis=-1)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (BATCH, H, W, 3)).astype(np.float32))
    n_total = BATCH * N_BOXES
    rois_np = np.zeros((n_total, 6), np.float32)
    rois_np[:, 0] = np.repeat(np.arange(BATCH), N_BOXES)
    rois_np[:, 1] = rng.uniform(100, W - 100, n_total)
    rois_np[:, 2] = rng.uniform(100, H - 100, n_total)
    rois_np[:, 3] = rng.uniform(12, 30, n_total)
    rois_np[:, 4] = rng.uniform(60, 250, n_total)
    rois_np[:, 5] = rng.uniform(-20, 20, n_total)
    rois = jnp.asarray(rois_np)

    hs, ws = H // 4, W // 4
    nms_segm, nms_geo, nms_angle = _synthetic_nms_maps()
    synth_cands = _pack_synthetic_candidates(
        nms_segm, nms_geo, nms_angle, MAX_CANDIDATES)

    def run(iters):
        """Software-pipelined serving loop; returns last batch's results.

        Depth-DEPTH prefetch: several detector forwards stay in flight so the
        ~30 ms tunnel RTT and the host NMS/decode hide behind device work;
        candidate packs are copied host-side asynchronously as soon as the
        device produces them.  recognize(i) is dispatched before
        forward(i+2) so it is not queued behind the next detection batch.
        """
        from collections import deque

        inflight = deque()
        for _ in range(min(DEPTH, iters)):
            c, f = forward(variables, images)
            c.copy_to_host_async()
            inflight.append((c, f))
        pending_ids = None  # batch i-1's recognition, decoded during i
        boxes = texts = None
        for i in range(iters):
            cands_dev, focr = inflight.popleft()
            cands = np.asarray(cands_dev)              # usually already home
            # per-image NMS: live candidates (empty here) + the synthetic
            # field standing in for a real ~8-word image
            merged = np.where(cands[:, 0:1, :] > 0, cands,
                              synth_cands[None])
            boxes = get_boxes_from_candidates_batch(merged, hs, ws, 0.5)
            ids = recognize(variables, focr, rois)
            ids.copy_to_host_async()
            if i + DEPTH < iters:
                c, f = forward(variables, images)
                c.copy_to_host_async()
                inflight.append((c, f))
            if pending_ids is not None:
                texts = codec.decode_batch(np.asarray(pending_ids))
            pending_ids = ids
        texts = codec.decode_batch(np.asarray(pending_ids))
        return boxes, texts

    run(WARMUP)

    extra["host_contention"] = _host_contention_probe()

    # the axon tunnel to the chip shares a congested link: identical runs
    # vary ~1.5x.  Take the best of 5 passes — noise on the link or the
    # host only ever slows a pass — and report the median alongside.
    best, med = _best_median(lambda: run(ITERS), n=5)
    ips = BATCH * ITERS / best
    ips_med = BATCH * ITERS / med

    # ---- stage profile: wall time per dispatch vs link RTT ----
    try:
        tiny = jnp.zeros((), jnp.float32)
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jax.device_get(tiny + 1.0))
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[2]

        def fwd_once():
            c, f = forward(variables, images)
            _sync(c)

        def rec_once():
            _sync(recognize(variables, focr_hold, rois))

        _, focr_hold = forward(variables, images)
        fwd_best, _ = _best_median(fwd_once)
        rec_best, _ = _best_median(rec_once)
        extra["profile"] = {
            "link_rtt_ms": round(rtt * 1e3, 2),
            "forward_batch16_wall_ms": round(fwd_best * 1e3, 2),
            "recognize_320rois_wall_ms": round(rec_best * 1e3, 2),
            "e2e_batch_wall_ms": round(best / ITERS * 1e3, 2),
            # chip idle fraction within the e2e loop: device work per batch
            # (forward+recognize, RTT removed) vs e2e wall per batch
            "device_est_ms_per_batch": round(
                max(fwd_best - rtt, 0) * 1e3 + max(rec_best - rtt, 0) * 1e3, 2),
        }
    except Exception as e:  # profile is advisory; never sink the bench
        extra["profile_error"] = repr(e)

    # ---- detector MFU (analytic: XLA-reported flops / wall) ----
    try:
        lowered = forward.lower(variables, images)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0 and "profile" in extra:
            dev_s = max(extra["profile"]["forward_batch16_wall_ms"] / 1e3
                        - rtt, 1e-6)
            extra["detector_mfu_pct"] = round(
                100.0 * flops / dev_s / V5E_PEAK_BF16_FLOPS, 2)
            extra["detector_gflops_batch16"] = round(flops / 1e9, 1)
    except Exception as e:
        extra["mfu_error"] = repr(e)

    # ---- RoIRotate crops/sec (BASELINE config 1) ----
    try:
        @jax.jit
        def rroi_only(focr, rois):
            return rroi_align(focr, rois, POOLED_HEIGHT, STRIP_W, 0.25)

        _, focr_hold = forward(variables, images)
        _sync(rroi_only(focr_hold, rois))
        rr_best, _ = _best_median(lambda: _sync(rroi_only(focr_hold, rois)))
        extra["rroi_crops_per_sec"] = round(n_total / max(rr_best - rtt, 1e-6))
        extra["recognition_crops_per_sec"] = round(
            n_total / max(extra["profile"]["recognize_320rois_wall_ms"] / 1e3
                          - rtt, 1e-6))
    except Exception as e:
        extra["rroi_error"] = repr(e)

    # ---- real-image e2e: the actual serving engine over ICDAR2015 ----
    try:
        extra["real_images"] = _bench_real_images(model, variables_f32, codec)
    except Exception as e:
        extra["real_images_error"] = repr(e)

    if "--train" in sys.argv:
        try:
            extra["joint_train"] = _bench_joint_train()
        except Exception as e:
            extra["train_error"] = repr(e)

    print(json.dumps({
        "metric": "icdar2015_e2e_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / 22.0, 3),
        "median": round(ips_med, 3),
        "extra": extra,
    }))


def _bench_real_images(model, variables_f32, codec):
    """Run FOTSInference.stream over the 11 real example images with the
    score bias calibrated to a realistic candidate density (the weights
    are random — no pretrained checkpoint exists — so the *load* is made
    realistic instead: live NMS on ~1e3 candidate pixels/image, real
    bucket mix from whatever boxes the NMS produces)."""
    import glob

    import cv2
    import jax.numpy as jnp

    from fots.pipeline import FOTSInference

    paths = sorted(glob.glob(EXAMPLE_DIR + "/*.jpg"))
    if not paths:
        return {"skipped": "no example images"}
    imgs = [cv2.imread(p) for p in paths]
    imgs = [im for im in imgs if im is not None]

    engine = FOTSInference(model, variables_f32, codec=codec,
                           mixed_precision=MIXED_PRECISION,
                           max_candidates=MAX_CANDIDATES)
    # candidate pixels per image: real text maps produce ~1-3k candidates
    # that COLLAPSE in the locality-aware first pass (adjacent pixels decode
    # overlapping quads).  Random-weight candidates are spatially incoherent
    # and skip straight to the O(K^2) standard-NMS, so an equal pixel count
    # overstates NMS cost ~100x; target a few hundred so the merged-box and
    # NMS load lands near a real image's (~10 boxes)
    target = (100, 800)
    bias, lo_b, hi_b = -2.0, -8.0, 2.0
    dens = None
    probe = [imgs[j % len(imgs)] for j in range(BATCH)]
    for _ in range(8):   # bisect the bias to the target density band
        # mutate the device-resident bias in place: same engine, same
        # compiled program (shapes unchanged), just new head bias
        eb = engine.variables["params"]["act"]["bias"]
        engine.variables["params"]["act"]["bias"] = jnp.full_like(eb, bias)
        batch, _ = engine._letterbox(probe, (H, W))
        cands, _f = engine._dispatch_detect(batch)
        c = np.asarray(cands)
        dens = float((c[:, 0, :] > 0).sum(axis=1).mean())
        if dens < target[0]:
            lo_b = bias
        elif dens > target[1]:
            hi_b = bias
        else:
            break
        bias = (lo_b + hi_b) / 2
    n_pass_imgs = len(imgs)

    def batches(n_batches):
        k = 0
        for _ in range(n_batches):
            chunk = [imgs[(k + j) % n_pass_imgs] for j in range(BATCH)]
            k = (k + BATCH) % n_pass_imgs
            yield chunk

    def run(n_batches):
        total = 0
        for res in engine.stream(batches(n_batches), serve_hw=(H, W)):
            total += len(res)
        return total

    run(2)  # warm all strip buckets the live boxes hit
    t0 = time.perf_counter()
    run(1)
    t_batch = time.perf_counter() - t0
    # bound the measured section to ~15s/pass however slow a batch is
    n_batches = int(min(6, max(2, 15.0 / max(t_batch, 1e-3))))
    best, med = _best_median(lambda: run(n_batches))
    n_img = n_batches * BATCH
    n_boxes = sum(len(engine(im)) for im in imgs[:3]) / 3.0
    return {
        "images_per_sec": round(n_img / best, 2),
        "images_per_sec_median": round(n_img / med, 2),
        "score_bias": round(bias, 3),
        "candidate_pixels_per_image": round(dens),
        "boxes_per_image_sample": round(n_boxes, 1),
    }


def _bench_joint_train():
    """Joint train-step img/s at the documented 8x512x512 config
    (BASELINE config 5).  Separate flag: slowest remote compile."""
    from fots.codec import LabelCodec
    from fots.data.detection import DetectionBatch
    from fots.models import FOTSDetector
    from fots.train import Trainer

    b, size = 8, 512
    hs = size // 4
    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    trainer = Trainer(model=model, codec=codec, input_size=size, seed=0)
    rng = np.random.default_rng(0)
    quads = [[np.array([[60, 60], [60, 120], [400, 120], [400, 60]], np.float64)]
             for _ in range(b)]
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
    t = []
    for _ in range(6):
        t0 = time.perf_counter()
        trainer.step(batch)
        t.append(time.perf_counter() - t0)
    dt = min(t)
    return {"images_per_sec": round(b / dt, 2),
            "step_wall_ms": round(dt * 1e3, 1)}


if __name__ == "__main__":
    main()
