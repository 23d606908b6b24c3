"""Fused end-to-end inference: detect -> decode+NMS -> bucketed recognize.

TPU re-design of the reference inference path (test.py:74-127 +
tools/ocr_utils.py:131-199).  The reference launches one RRoIAlign + one
forward_ocr per detected box from a Python loop; here all boxes are
bucketed by strip width and processed in a handful of compiled programs:

  image -> [jit] detector forward (NHWC, static shape)
        -> tiny score/geo/angle maps to host -> vectorized decode +
           native locality-aware NMS (fots/ops/nms.py)
        -> rrois bucketed by /32-rounded strip width
        -> [jit per bucket] rroi_align(focr) + recognition head + argmax
        -> host CTC-collapse decode to text.

The shared OCR feature (focr) never leaves the device.  Compiled program
count is bounded by len(width buckets) + number of distinct input image
shapes (use fixed input sizing for throughput serving).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fots.codec import LabelCodec
from fots.geometry import resize_to_multiple_of_32, rroi_from_box
from fots.models import FOTSDetector
from fots.ops.nms import get_boxes
from fots.ops.rroi_align import rroi_align

# /32-multiple strip-width buckets (reference computes an exact /32 width
# per box, ocr_utils.py:147-150; bucketing bounds compile count)
STRIP_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)
TARGET_H = 11  # recognition strip height at 1/4 scale (ocr_utils.py:147)


def strip_width_for_box(w: float, h: float, target_h: int = TARGET_H) -> int:
    """Reference width rule (ocr_utils.py:148-150): scale to target height,
    add target_h, round down to /32 (min 64), then snap up to a bucket."""
    scale = target_h / max(1.0, h)
    target_gw = int(w * scale) + target_h
    target_gw = max(2, target_gw // 32) * 32
    for b in STRIP_BUCKETS:
        if target_gw <= b:
            return b
    return STRIP_BUCKETS[-1]


class FOTSInference:
    """Stateful wrapper owning compiled programs + device-resident params."""

    def __init__(self, model: FOTSDetector, variables, codec: Optional[LabelCodec] = None,
                 segm_thresh: float = 0.5, iou_th1: float = 0.4, iou_th2: float = 0.2):
        self.model = model
        self.variables = variables
        self.codec = codec or LabelCodec()
        self.segm_thresh = segm_thresh
        self.iou_th1 = iou_th1
        self.iou_th2 = iou_th2

        @jax.jit
        def _forward(variables, images):
            out = model.apply(variables, images, train=False)
            return (out["segm"][0][..., 0], out["rbox"][0], out["angle"][0], out["focr"])

        @functools.partial(jax.jit, static_argnames=("width",))
        def _recognize(variables, focr, rois, width: int):
            strips = rroi_align(focr, rois, TARGET_H, width, 0.25)
            logp = model.apply(variables, strips, train=False,
                               method=FOTSDetector.recognize)
            ids = jnp.argmax(logp, axis=-1)
            conf = jnp.max(logp, axis=-1)
            return ids, conf

        self._forward = _forward
        self._recognize = _recognize

    # -------- detection --------

    def detect_maps(self, images_norm: np.ndarray):
        """Run the detector; images_norm: [B,H,W,3] already (x/128-1)."""
        segm, rbox, angle, focr = self._forward(self.variables, jnp.asarray(images_norm))
        return segm, rbox, angle, focr

    def detect(self, image_bgr: np.ndarray, scale_up: bool = False):
        """Detect text boxes in one raw BGR image.  Returns (boxes [N,9] in
        resized-image pixels, focr device array, resized shape)."""
        im_resized, _ = resize_to_multiple_of_32(image_bgr, scale_up=scale_up)
        images = im_resized[None].astype(np.float32) / 128.0 - 1.0
        segm, rbox, angle, focr = self.detect_maps(images)
        boxes = get_boxes(
            np.asarray(segm[0]), np.asarray(rbox[0]), np.asarray(angle[0]),
            self.segm_thresh, self.iou_th1, self.iou_th2,
        )
        return boxes, focr, im_resized

    # -------- recognition over detected boxes --------

    def recognize_boxes(self, boxes: np.ndarray, focr, batch_index: int = 0) -> List[str]:
        """Batched RoIRotate + CTC head over all boxes, bucketed by width."""
        n = boxes.shape[0]
        if n == 0:
            return []
        buckets: Dict[int, List[int]] = {}
        rois = np.zeros((n, 6), np.float32)
        for i in range(n):
            roi, w, h = rroi_from_box(boxes[i], batch_index)
            rois[i] = roi
            buckets.setdefault(strip_width_for_box(w, h), []).append(i)

        texts = [""] * n
        for width, idxs in sorted(buckets.items()):
            sel = jnp.asarray(rois[np.asarray(idxs)])
            ids, _conf = self._recognize(self.variables, focr, sel, width)
            decoded = self.codec.decode_batch(np.asarray(ids))
            for j, i in enumerate(idxs):
                texts[i] = decoded[j]
        return texts

    # -------- fused end-to-end --------

    def __call__(self, image_bgr: np.ndarray, scale_up: bool = False):
        """Full pipeline on one image.  Returns list of dicts:
        {'box': [8 coords + score], 'text': str}."""
        boxes, focr, im_resized = self.detect(image_bgr, scale_up=scale_up)
        texts = self.recognize_boxes(boxes, focr)
        out = []
        for b, t in zip(boxes, texts):
            if len(t) == 0:
                continue
            out.append({"box": b, "text": t})
        return out, im_resized
