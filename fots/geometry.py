"""Host-side geometry: rotated-box math and EAST target generation (NumPy).

Re-implements the observable behavior of the reference's geometry code:
- ``generate_rbox`` (reference tools/data_gen.py:415-560): per-pixel
  score/geometry/angle/training-mask targets at 1/4 resolution.
- quad -> rotated-roi conversion used by the RoIRotate paths
  (reference src/ocr_process.py:196-221, src/utils.py:394-421,
  tools/ocr_utils.py:131-150).
- the per-pixel quad decode of the NMS adaptor
  (reference nms/adaptor.cpp:70-113) as a NumPy oracle; the production
  decode runs on device (fots/ops/nms.py).

Known reference quirks are reproduced deliberately for parity and noted
inline ("parity:" comments).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import cv2
import numpy as np

SCALE_FACTOR = 4  # detection targets live at 1/4 input resolution
TARGET_H = 11     # recognition strip height at 1/4 scale (ocr_utils.py:147)


def strip_width_for_box(w: float, h: float, target_h: int = TARGET_H,
                        buckets: Sequence[int] = (256, 512)) -> int:
    """Reference width rule (ocr_utils.py:148-150): scale to target height,
    add target_h, round down to /32 (min 64), then snap up to a bucket.

    Lives here (host-only module) so the exported-bundle runtime
    (fots/export.py) can bucket rois without importing model code."""
    scale = target_h / max(1.0, h)
    target_gw = int(w * scale) + target_h
    target_gw = max(2, target_gw // 32) * 32
    for b in buckets:
        if target_gw <= b:
            return b
    return buckets[-1]


def poly_angle(pts: np.ndarray) -> float:
    """Mean angle of the two long edges (reference data_gen.py:439)."""
    a1 = math.atan2(pts[2][1] - pts[1][1], pts[2][0] - pts[1][0])
    a2 = math.atan2(pts[3][1] - pts[0][1], pts[3][0] - pts[0][0])
    return (a1 + a2) / 2.0


def point_dist_to_line(p1: np.ndarray, p2: np.ndarray, p3: np.ndarray):
    """Distance from p3 (or an array of points) to the line p1-p2.

    Vectorized form of reference data_gen.py:247-253 (including its
    fall-through when the segment is degenerate).
    """
    d = p2 - p1
    norm = np.linalg.norm(d)
    cross = np.abs(d[0] * (p1[1] - p3[..., 1]) - d[1] * (p1[0] - p3[..., 0]))
    if norm > 0.5:
        return cross / norm
    return cross


def quads_to_rrois(
    quads: np.ndarray, batch_idx: int = 0, height_jitter: int = 0
) -> np.ndarray:
    """Convert ``[N,4,2]`` quads to ``[N,6]`` rrois [bid, cx, cy, h, w, angle_deg].

    Matches the GT-roi construction of the reference
    (src/ocr_process.py:196-206 / src/utils.py:398-407): center is the
    corner mean, w = |p2-p1|, h = |p1-p0| (+ optional jitter), angle is the
    mean edge angle negated and converted to degrees.
    """
    q = np.asarray(quads, dtype=np.float64).reshape(-1, 4, 2)
    center = q.mean(axis=1)
    dw = q[:, 2, :] - q[:, 1, :]
    dh = q[:, 1, :] - q[:, 0, :]
    w = np.sqrt((dw ** 2).sum(axis=1))
    h = np.sqrt((dh ** 2).sum(axis=1)) + height_jitter
    ang = (
        np.arctan2(q[:, 2, 1] - q[:, 1, 1], q[:, 2, 0] - q[:, 1, 0])
        + np.arctan2(q[:, 3, 1] - q[:, 0, 1], q[:, 3, 0] - q[:, 0, 0])
    ) / 2.0
    ang_deg = -ang / math.pi * 180.0
    bid = np.full((q.shape[0],), batch_idx, dtype=np.float64)
    return np.stack([bid, center[:, 0], center[:, 1], h, w, ang_deg], axis=1)


def rroi_from_box(
    box8: np.ndarray, batch_idx: int = 0, expand_w_frac: float = 0.0
) -> Tuple[np.ndarray, float, float]:
    """Single detected box (8 coords) -> (rroi[6], w, h).

    Matches align_ocr's roi construction (tools/ocr_utils.py:136-145),
    including the int() truncation of the center coordinates.

    ``expand_w_frac``: widen the crop by that fraction of the box height
    (centered), the way the reference *accuracy* harness does — its eval
    crop spans ``w + h/4`` (tools/eval.py:575,587: ``target_gw = w*scale +
    target_h/4``, ``scalex = (w2 + h2/4)/input_W``).  EAST boxes regress
    tight to the glyphs, so without the margin edge characters get clipped
    ("CALVIN" -> "ALVIN").  0.25 reproduces the reference eval margin.
    """
    b = np.asarray(box8, dtype=np.float64)[:8].reshape(4, 2)
    center = b.mean(axis=0)
    dw = b[2] - b[1]
    dh = b[1] - b[0]
    w = math.sqrt(dw[0] ** 2 + dw[1] ** 2)
    h = math.sqrt(dh[0] ** 2 + dh[1] ** 2)
    w = w + expand_w_frac * h
    angle = math.atan2(b[2][1] - b[1][1], b[2][0] - b[1][0])
    angle = -angle / math.pi * 180.0
    return (
        np.array([batch_idx, int(center[0]), int(center[1]), h, w, angle], dtype=np.float64),
        w,
        h,
    )


def generate_rbox(
    im_shape: Tuple[int, int],
    polys: np.ndarray,
    tags: Sequence[bool],
    labels: Sequence[str],
):
    """EAST targets at 1/4 scale. Returns (score, geo[...,5], mask, gt_idx, gt_out, labels_out).

    Behavioral re-implementation of reference data_gen.py:415-560 with the
    per-pixel Python loop replaced by vectorized NumPy over each polygon's
    raster mask (order over polygons preserved — overlap handling depends
    on it).
    """
    h, w = im_shape
    hs, ws = int(h / SCALE_FACTOR), int(w / SCALE_FACTOR)

    poly_mask = np.zeros((hs, ws), dtype=np.uint8)
    score_map = np.zeros((hs, ws), dtype=np.float32)
    geo_map = np.zeros((hs, ws, 5), dtype=np.float32)
    training_mask = np.ones((hs, ws), dtype=np.uint8)
    gt_idx = np.full((hs, ws), -1, dtype=np.int64)

    labels_out: List[str] = []
    gt_out: List[np.ndarray] = []

    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 4, 2)
    for poly_idx in range(polys.shape[0]):
        pts_orig = polys[poly_idx]
        txt = labels[poly_idx]
        tag = bool(tags[poly_idx])
        angle = poly_angle(pts_orig)

        dh1 = np.linalg.norm(pts_orig[1] - pts_orig[0])
        # parity: reference averages dh1 with itself (data_gen.py:448)
        poly_h = int((dh1 + dh1) / 2)
        poly_w = np.linalg.norm(pts_orig[1] - pts_orig[2])

        pts = pts_orig / SCALE_FACTOR
        pts2 = pts.copy()

        # shrink along the two short edges by 1/1.5 (data_gen.py:456-466)
        c1 = (pts[0] + pts[1]) / 2
        pts[0] = c1 + (pts[0] - c1) / 1.5
        pts[1] = c1 + (pts[1] - c1) / 1.5
        c1 = (pts[2] + pts[3]) / 2
        pts[2] = c1 + (pts[2] - c1) / 1.5
        pts[3] = c1 + (pts[3] - c1) / 1.5

        # parity: the y-range check also compares against im width
        # (reference data_gen.py:477 uses im.shape[1] for both axes)
        if (
            tag
            or poly_h < 6
            or poly_w < 6
            or np.sum(pts < 0) != 0
            or pts_orig[:, 0].max() > w
            or pts_orig[:, 1].max() > w
            or (poly_w < poly_h and len(txt) > 3)
        ):
            cv2.fillPoly(training_mask, np.asarray([pts2.round()], np.int32), 0)
            continue

        is_line = txt.find(" ") != -1
        if is_line:
            # mask out the interior of multi-word lines (data_gen.py:483-501)
            pts_line = pts2.copy()
            c1 = (pts[1] + pts[2]) / 2
            pts_line[2] = c1 + (pts[2] - c1) / 1.2
            pts_line[1] = c1 + (pts[1] - c1) / 1.2
            c1 = (pts[0] + pts[3]) / 2
            pts_line[3] = c1 + (pts[3] - c1) / 1.2
            pts_line[0] = c1 + (pts[0] - c1) / 1.2
            cv2.fillPoly(training_mask, np.asarray([pts_line.round()], np.int32), 0)

        cv2.fillPoly(poly_mask, np.asarray([pts.round()], np.int32), poly_idx + 1)
        ys, xs = np.nonzero(poly_mask == poly_idx + 1)
        if ys.size:
            overlap = score_map[ys, xs] != 0
            training_mask[ys[overlap], xs[overlap]] = 0
            keep = ~overlap
            ky, kx = ys[keep], xs[keep]
            if ky.size:
                pt = np.stack([kx, ky], axis=-1).astype(np.float32)
                d1 = point_dist_to_line(pts2[1], pts2[2], pt)
                d2 = point_dist_to_line(pts2[0], pts2[3], pt)
                dw1 = point_dist_to_line(pts2[0], pts2[1], pt)
                dw2 = point_dist_to_line(pts2[2], pts2[3], pt)

                geo_map[ky, kx, 0] = d1
                geo_map[ky, kx, 1] = d2
                # parity: side distances poisoned to -1 when the quad pokes
                # outside the image in x (data_gen.py:533-537)
                left_bad = (
                    pts_orig[0, 0] > w or pts_orig[1, 0] > w
                    or pts_orig[0, 0] < 0 or pts_orig[1, 0] < 0
                )
                right_bad = (
                    pts_orig[2, 0] > w or pts_orig[3, 0] > w
                    or pts_orig[2, 0] < 0 or pts_orig[3, 0] < 0
                )
                geo_map[ky, kx, 2] = -1.0 if left_bad else dw1
                geo_map[ky, kx, 3] = -1.0 if right_bad else dw2
                gt_idx[ky, kx] = len(gt_out)

                near_edge = (dw1 < 1) | (dw2 < 1)
                score_map[ky[near_edge], kx[near_edge]] = 0

                if is_line:
                    wider_left = dw1 > dw2
                    geo_map[ky[wider_left], kx[wider_left], 2] = -1
                    geo_map[ky[~wider_left], kx[~wider_left], 3] = -1

                geo_map[ky, kx, 4] = angle

        cv2.fillPoly(score_map, np.asarray([pts.round()], np.int32), 1)
        gt_out.append(pts_orig)
        labels_out.append(txt)

    score_map[training_mask == 0] = 0
    return score_map, geo_map, training_mask, gt_idx, gt_out, labels_out


def generate_rbox2(
    im_shape: Tuple[int, int],
    polys: np.ndarray,
    tags: Sequence[bool],
    labels: Sequence[str],
):
    """geo_type=1 target variant (reference data_gen.py:255-412).

    Differs from :func:`generate_rbox`: height shrink /2 instead of /1.5,
    line masking /1.5 instead of /1.2, per-pixel distances from the row /
    column extents of the FULL polygon raster (not edge distances), edge
    pixels (dw<0.5) masked in training_mask instead of score-zeroed, and a
    3x3 box blur of the final score map.
    """
    h, w = im_shape
    hs, ws = int(h / SCALE_FACTOR), int(w / SCALE_FACTOR)

    poly_mask = np.zeros((hs, ws), dtype=np.uint8)
    poly_full = np.zeros((hs, ws), dtype=np.uint8)
    score_map = np.zeros((hs, ws), dtype=np.float32)
    geo_map = np.zeros((hs, ws, 5), dtype=np.float32)
    training_mask = np.ones((hs, ws), dtype=np.uint8)
    gt_idx = np.full((hs, ws), -1, dtype=np.int64)

    labels_out: List[str] = []
    gt_out: List[np.ndarray] = []

    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 4, 2)
    for poly_idx in range(polys.shape[0]):
        pts_orig = polys[poly_idx]
        txt = labels[poly_idx]
        tag = bool(tags[poly_idx])
        angle = poly_angle(pts_orig)

        dh1 = np.linalg.norm(pts_orig[1] - pts_orig[0])
        poly_h = int((dh1 + dh1) / 2)
        poly_w = np.linalg.norm(pts_orig[1] - pts_orig[2])

        pts = pts_orig / SCALE_FACTOR
        pts2 = pts.copy()
        c1 = (pts[0] + pts[1]) / 2
        pts[0] = c1 + (pts[0] - c1) / 2
        pts[1] = c1 + (pts[1] - c1) / 2
        c1 = (pts[2] + pts[3]) / 2
        pts[2] = c1 + (pts[2] - c1) / 2
        pts[3] = c1 + (pts[3] - c1) / 2

        if (
            tag
            or poly_h < 6
            or poly_w < 6
            or np.sum(pts < 0) != 0
            or pts_orig[:, 0].max() > w
            or pts_orig[:, 1].max() > w
            or (poly_w < poly_h and len(txt) > 3)
        ):
            cv2.fillPoly(training_mask, np.asarray([pts2.round()], np.int32), 0)
            continue

        is_line = txt.find(" ") != -1
        if is_line:
            pts_line = pts2.copy()
            c1 = (pts[1] + pts[2]) / 2
            pts_line[2] = c1 + (pts[2] - c1) / 1.5
            pts_line[1] = c1 + (pts[1] - c1) / 1.5
            c1 = (pts[0] + pts[3]) / 2
            pts_line[3] = c1 + (pts[3] - c1) / 1.5
            pts_line[0] = c1 + (pts[0] - c1) / 1.5
            cv2.fillPoly(training_mask, np.asarray([pts_line.round()], np.int32), 0)

        cv2.fillPoly(poly_mask, np.asarray([pts.round()], np.int32), poly_idx + 1)
        cv2.fillPoly(poly_full, np.asarray([pts2.round()], np.int32), poly_idx + 1)
        ys, xs = np.nonzero(poly_mask == poly_idx + 1)
        ysf, xsf = np.nonzero(poly_full == poly_idx + 1)
        if ys.size:
            overlap = score_map[ys, xs] != 0
            training_mask[ys[overlap], xs[overlap]] = 0
            keep = ~overlap
            ky, kx = ys[keep], xs[keep]
            if ky.size and ysf.size:
                # row/col extents of the full polygon per scanline
                min_x_of_row = np.full(hs, 1 << 30)
                max_x_of_row = np.full(hs, -(1 << 30))
                np.minimum.at(min_x_of_row, ysf, xsf)
                np.maximum.at(max_x_of_row, ysf, xsf)
                min_y_of_col = np.full(ws, 1 << 30)
                max_y_of_col = np.full(ws, -(1 << 30))
                np.minimum.at(min_y_of_col, xsf, ysf)
                np.maximum.at(max_y_of_col, xsf, ysf)

                d1 = ky - min_y_of_col[kx]
                d2 = max_y_of_col[kx] - ky
                dw1 = kx - min_x_of_row[ky]
                dw2 = max_x_of_row[ky] - kx

                left_bad = (
                    pts_orig[0, 0] > w or pts_orig[1, 0] > w
                    or pts_orig[0, 0] < 0 or pts_orig[1, 0] < 0
                )
                right_bad = (
                    pts_orig[2, 0] > w or pts_orig[3, 0] > w
                    or pts_orig[2, 0] < 0 or pts_orig[3, 0] < 0
                )
                geo_map[ky, kx, 0] = d1
                geo_map[ky, kx, 1] = d2
                geo_map[ky, kx, 2] = -1.0 if left_bad else dw1
                geo_map[ky, kx, 3] = -1.0 if right_bad else dw2
                gt_idx[ky, kx] = len(gt_out)

                near_edge = (dw1 < 0.5) | (dw2 < 0.5)
                training_mask[ky[near_edge], kx[near_edge]] = 0

                if is_line:
                    wider_left = dw1 > dw2
                    geo_map[ky[wider_left], kx[wider_left], 2] = -1
                    geo_map[ky[~wider_left], kx[~wider_left], 3] = -1

                geo_map[ky, kx, 4] = angle

        # parity: rbox2 fills with un-rounded pts (data_gen.py:405)
        cv2.fillPoly(score_map, np.asarray([pts], np.int32), 1)
        gt_out.append(pts_orig)
        labels_out.append(txt)

    score_map[training_mask == 0] = 0
    score_map = cv2.blur(score_map, (3, 3))
    return score_map, geo_map, training_mask, gt_idx, gt_out, labels_out


def decode_quads_np(
    segm: np.ndarray,
    geo: np.ndarray,
    angle: np.ndarray,
    segm_thresh: float = 0.5,
    scale_factor: float = 4.0,
    precision: float = 10000.0,
):
    """NumPy oracle of the NMS adaptor's per-pixel quad decode
    (reference nms/adaptor.cpp:70-113).

    segm: [H,W] scores; geo: [H,W,4] distances (top,bottom,left,right);
    angle: [H,W,2] (sin,cos).  Returns (quads [N,4,2], scores [N],
    corner_probs [N,4], xs [N], ys [N]) in the reference's row-major scan
    order, with coordinates rounded to 1e-4 fixed point.
    """
    ys, xs = np.nonzero(segm > segm_thresh)
    quads, probs = decode_candidates_np(
        geo[ys, xs], angle[ys, xs, 0], angle[ys, xs, 1], xs, ys,
        scale_factor, precision)
    scores = segm[ys, xs]
    return quads, scores, probs, xs, ys


def decode_candidates_np(
    r: np.ndarray,       # [N,4] distances (top,bottom,left,right)
    a_sin: np.ndarray,   # [N]
    a_cos: np.ndarray,   # [N]
    xs: np.ndarray,
    ys: np.ndarray,
    scale_factor: float = 4.0,
    precision: float = 10000.0,
):
    """Quad decode for already-gathered candidate pixels (the core of
    :func:`decode_quads_np`; same math as reference nms/adaptor.cpp:70-113).
    Returns (quads [N,4,2], corner_probs [N,4]).

    Byte-parity note: the reference decodes in C *float32* (`expf`,
    `roundf`, f32 products), so every step here is forced to f32 with the
    same association order — f64 NumPy math lands one 1e-4 fixed-point
    unit off after rounding.  `roundf` rounds half away from zero, not
    half-to-even like ``np.round``.
    """
    f32 = np.float32
    r = np.asarray(r, f32)
    a_sin = np.asarray(a_sin, f32)
    a_cos = np.asarray(a_cos, f32)
    xp = xs.astype(f32) + f32(0.25)
    yp = ys.astype(f32) + f32(0.25)
    sf = f32(scale_factor)
    prec = f32(precision)

    pos_r_x = (xp - r[:, 2] * a_cos) * sf
    pos_r_y = (yp - r[:, 2] * a_sin) * sf
    pos_r2_x = (xp + r[:, 3] * a_cos) * sf
    pos_r2_y = (yp + r[:, 3] * a_sin) * sf

    quads = np.stack(
        [
            np.stack([pos_r_x - r[:, 1] * a_sin * sf, pos_r_y + r[:, 1] * a_cos * sf], -1),
            np.stack([pos_r_x + r[:, 0] * a_sin * sf, pos_r_y - r[:, 0] * a_cos * sf], -1),
            np.stack([pos_r2_x + r[:, 0] * a_sin * sf, pos_r2_y - r[:, 0] * a_cos * sf], -1),
            np.stack([pos_r2_x - r[:, 1] * a_sin * sf, pos_r2_y + r[:, 1] * a_cos * sf], -1),
        ],
        axis=1,
    )
    fp = prec * quads                                    # f32, like adaptor.cpp:101-106
    fp = np.copysign(np.floor(np.abs(fp) + f32(0.5)), fp)  # roundf: half away from zero
    quads = fp.astype(np.float64) / float(precision)

    # expf args are f32 divisions (adaptor.cpp:93-99); the exp itself is
    # evaluated in f64 and rounded, matching glibc's correctly-rounded expf
    ph = f32(9.0)
    p_left = np.exp((-(r[:, 2]) / ph).astype(np.float64)).astype(f32)
    p_top = np.exp((-(r[:, 0]) / ph).astype(np.float64)).astype(f32)
    p_right = np.exp((-(r[:, 3]) / ph).astype(np.float64)).astype(f32)
    p_bt = np.exp((-(r[:, 1]) / ph).astype(np.float64)).astype(f32)
    probs = np.stack([p_left * p_bt, p_left * p_top, p_right * p_top, p_right * p_bt], -1)
    return quads, probs


def resize_to_multiple_of_32(
    im: np.ndarray, max_size: int = 1585152, scale_up: bool = True
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Resize an image so both sides are /32 multiples under an area cap
    (reference test.py:25-41)."""
    if scale_up:
        image_size = [im.shape[1] * 3 // 32 * 32, im.shape[0] * 3 // 32 * 32]
    else:
        image_size = [im.shape[1] // 32 * 32, im.shape[0] // 32 * 32]
    while image_size[0] * image_size[1] > max_size:
        image_size[0] /= 1.2
        image_size[1] /= 1.2
        image_size[0] = int(image_size[0] // 32) * 32
        image_size[1] = int(image_size[1] // 32) * 32
    resize_h, resize_w = int(image_size[1]), int(image_size[0])
    scaled = cv2.resize(im, dsize=(resize_w, resize_h))
    return scaled, (resize_h, resize_w)
