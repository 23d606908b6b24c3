"""E2E inference throughput benchmark (one real chip).

Measures the full fused FOTS pipeline per image at a fixed serving shape
(1280x704, the resized shape of the ICDAR2015 example images):

  device: detector forward -> score/geo/angle maps + focr
  host:   map transfer, vectorized quad decode + locality-aware NMS
  device: RoIRotate (bucketed) + recognition head + argmax
  host:   CTC-collapse decode to text

No pretrained weights are published by the reference, so the benchmark
runs with deterministically-initialized weights and a calibrated score
bias; the recognition stage processes a fixed 20 boxes/image at the
128-wide strip bucket, and the NMS stage runs on a realistic synthetic
candidate field (~8 words) so every stage's cost is represented.

Prints ONE JSON line:
  {"metric": "icdar2015_e2e_images_per_sec", "value": N,
   "unit": "images/sec", "vs_baseline": N / 22.0}
vs_baseline anchors on the FOTS paper's 22.0 fps real-time figure on a
TitanX (arXiv:1801.01671; the reference repo publishes no numbers —
BASELINE.md).
"""

import json
import time

import numpy as np


H, W = 704, 1280          # ICDAR2015 eval shape, /32 multiples
BATCH = 16                # images per compiled program (serving batch);
                          # also amortizes the remote-dispatch floor
N_BOXES = 20              # recognition workload per image
STRIP_W = 128
WARMUP = 2
ITERS = 5
MIXED_PRECISION = True    # bf16 backbone/recognizer, f32 geometry heads


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


def main():
    import jax
    import jax.numpy as jnp

    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.ops.nms import get_boxes
    from fots.ops.rroi_align import rroi_align
    from fots.roirotate import POOLED_HEIGHT
    from fots.codec import LabelCodec

    from fots.pipeline import cast_params_bf16

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    variables = init_detector(model, jax.random.PRNGKey(0),
                              image_shape=(1, H, W, 3))
    # calibrate: empty score map from the live forward (NMS cost is charged
    # separately on the synthetic candidate field below)
    variables["params"]["act"]["bias"] = jnp.full_like(
        variables["params"]["act"]["bias"], -4.0)
    if MIXED_PRECISION:
        variables = cast_params_bf16(dict(variables))

    @jax.jit
    def forward(variables, images):
        if MIXED_PRECISION:
            images = images.astype(jnp.bfloat16)
        out = model.apply(variables, images, train=False)
        # packed channel-first maps: lane-aligned device->host transfer
        maps = jnp.concatenate(
            [out["segm"][0], out["rbox"][0], out["angle"][0]], axis=-1)
        return jnp.transpose(maps, (0, 3, 1, 2)).astype(jnp.float32), out["focr"]

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

    nms_segm, nms_geo, nms_angle = _synthetic_nms_maps()

    def one_batch():
        maps, focr = forward(variables, images)
        # host side: pull ALL head maps (packed, one transfer), decode +
        # NMS per image (on the calibrated live maps no candidates fire;
        # the synthetic field charges realistic per-image NMS cost)
        _ = np.asarray(maps)
        boxes = [get_boxes(nms_segm, nms_geo, nms_angle, 0.5)
                 for _ in range(BATCH)]
        ids = recognize(variables, focr, rois)
        texts = codec.decode_batch(np.asarray(ids))
        return boxes, texts

    for _ in range(WARMUP):
        one_batch()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_batch()
    dt = (time.perf_counter() - t0) / ITERS

    ips = BATCH / dt
    print(json.dumps({
        "metric": "icdar2015_e2e_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / 22.0, 3),
    }))


if __name__ == "__main__":
    main()
