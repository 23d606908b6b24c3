"""Visual-debug dumps of sampled training rois.

TPU-native analog of the reference's ``data/tshow`` debug hook
(src/ocr_process.py:224-249, gated by ``opts.debug``): every sampled
roi is cropped from the *input image* and written as a JPEG whose
filename carries the step, slot, and GT transcription, so a human can
eyeball whether the RoIRotate sampling produced legible, correctly
oriented word strips.

Runs entirely on the host with OpenCV — it must not enqueue device work
(the training device program is pipelined; a debug hook that dispatched
a second program would serialize the pipeline).
"""

from __future__ import annotations

import os
import re

import numpy as np


def _safe(text: str, max_len: int = 24) -> str:
    """Filesystem-safe slug of a transcription."""
    return re.sub(r"[^0-9A-Za-z_-]", "_", text)[:max_len] or "_"


def crop_rroi_image(image_u8: np.ndarray, roi, norm_height: int = 44):
    """Axis-align one rotated roi ``[_, cx, cy, h, w, angle_deg]`` from an
    HWC uint8 image via a single inverse-affine warp (host, OpenCV)."""
    import cv2

    _, cx, cy, h, w, angle = [float(v) for v in roi[:6]]
    h = max(h, 1.0)
    w = max(w, 1.0)
    scale = norm_height / h
    out_w = max(int(round(w * scale)), 1)
    # rotate by -angle about the roi center, then scale+translate the roi
    # box to the origin: one warpAffine, no intermediate full-image rotate
    m = cv2.getRotationMatrix2D((cx, cy), angle, scale)
    m[0, 2] += out_w / 2.0 - cx
    m[1, 2] += norm_height / 2.0 - cy
    return cv2.warpAffine(image_u8, m, (out_w, norm_height),
                          flags=cv2.INTER_LINEAR)


def dump_roi_crops(images, roi_batch, codec, out_dir: str, step: int,
                   norm_height: int = 44, max_crops: int = 32) -> int:
    """Write each valid roi's image crop to ``out_dir``.

    images: [B,H,W,3] float normalized (im/128-1) or uint8 batch.
    roi_batch: a :class:`fots.roirotate.RoiBatch` (padded rois + labels).
    Returns the number of crops written.
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip((images + 1.0) * 128.0, 0, 255).astype(np.uint8)
    n = 0
    for j in range(roi_batch.rois.shape[0]):
        if roi_batch.roi_mask[j] <= 0:
            continue
        roi = roi_batch.rois[j]
        b = int(roi[0])
        if not 0 <= b < images.shape[0]:
            continue
        crop = crop_rroi_image(images[b], roi, norm_height)
        ln = int(roi_batch.label_lengths[j])
        # raw=True: GT label ids are not CTC frames — keep doubled letters
        text = codec.decode_ids(roi_batch.labels[j][:ln], raw=True) if ln else ""
        kind = "pred" if j < roi_batch.n_predicted else "gt"
        cv2.imwrite(os.path.join(
            out_dir, f"crop_{step:06d}_{j:02d}_{kind}_{_safe(text)}.jpg"), crop)
        n += 1
        if n >= max_crops:
            break
    return n
