"""Scalar NumPy oracles: direct transliterations of the reference math.

These are intentionally slow, element-at-a-time re-statements of the
reference kernels (cited per function) used only to verify the vectorized
production implementations in fots/.
"""

import math

import numpy as np


def rroi_align_oracle(features_nchw, rois, pooled_height, pooled_width, spatial_scale):
    """Scalar transliteration of RROIAlignForward
    (reference rroi_align/src/rroi_align_kernel.cu:28-161; same math as the
    CPU replica in rroi_align/test.py:50-144).

    features_nchw: [B,C,H,W]; rois: [N,6]; returns [N,C,ph,pw].
    """
    B, C, H, W = features_nchw.shape
    N = rois.shape[0]
    out = np.zeros((N, C, pooled_height, pooled_width), dtype=np.float64)

    def c_round(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    for n in range(N):
        bid = int(rois[n, 0])
        cx, cy, h, w = rois[n, 1], rois[n, 2], rois[n, 3], rois[n, 4]
        angle = rois[n, 5] / 180.0 * 3.1415926535
        roi_pw = pooled_height * w / h
        dx = -roi_pw / 2.0
        dy = -pooled_height / 2.0
        Sx = w * spatial_scale / roi_pw
        Sy = h * spatial_scale / pooled_height
        Al, Be = math.cos(angle), math.sin(angle)
        Dx, Dy = cx * spatial_scale, cy * spatial_scale
        M = [
            [Al * Sx, Be * Sy, Al * Sx * dx + Be * Sy * dy + Dx],
            [-Be * Sx, Al * Sy, -Be * Sx * dx + Al * Sy * dy + Dy],
        ]
        for c in range(C):
            for ph in range(pooled_height):
                for pw in range(pooled_width):
                    if pw > roi_pw:
                        continue
                    P = []
                    for dpw, dph in ((0, 0), (0, 1), (1, 0), (1, 1)):
                        P.append(M[0][0] * (pw + dpw) + M[0][1] * (ph + dph) + M[0][2])
                        P.append(M[1][0] * (pw + dpw) + M[1][1] * (ph + dph) + M[1][2])
                    left = max(c_round(min(P[0], P[2], P[4], P[6])), 0.0)
                    right = min(c_round(max(P[0], P[2], P[4], P[6])), W - 1.0)
                    top = max(c_round(min(P[1], P[3], P[5], P[7])), 0.0)
                    bottom = min(c_round(max(P[1], P[3], P[5], P[7])), H - 1.0)
                    bin_cx = (left + right) / 2.0
                    bin_cy = (top + bottom) / 2.0
                    bl, br = int(math.floor(bin_cx)), int(math.ceil(bin_cx))
                    bt, bb = int(math.floor(bin_cy)), int(math.ceil(bin_cy))
                    f = features_nchw[bid, c]

                    def val(t, l):
                        if t > 0 and l > 0 and t < H and l < W:
                            return f[t, l]
                        return 0.0

                    rx = bin_cx - math.floor(bin_cx)
                    ry = bin_cy - math.floor(bin_cy)
                    out[n, c, ph, pw] = (
                        val(bt, bl) * (1 - rx) * (1 - ry)
                        + val(bt, br) * rx * (1 - ry)
                        + val(bb, br) * rx * ry
                        + val(bb, bl) * (1 - rx) * ry
                    )
    return out


def generate_rbox_oracle(im_shape, polys, tags, labels):
    """Scalar transliteration of generate_rbox (reference
    tools/data_gen.py:415-560) including its per-pixel Python loop."""
    import cv2

    h, w = im_shape
    scale_factor = 4
    hs, ws = int(h / scale_factor), int(w / scale_factor)
    poly_mask = np.zeros((hs, ws), dtype=np.uint8)
    score_map = np.zeros((hs, ws), dtype=np.float32)
    geo_map = np.zeros((hs, ws, 5), dtype=np.float32)
    training_mask = np.ones((hs, ws), dtype=np.uint8)
    gt_idx = np.full((hs, ws), -1, dtype=np.int64)
    labels_out, gt_out = [], []

    def point_dist_to_line(p1, p2, p3):
        # 2-D cross product magnitude (np.cross on 2-vectors is removed
        # in NumPy 2.x; this is the explicit z-component)
        a, b = p2 - p1, p1 - p3
        cross = abs(a[0] * b[1] - a[1] * b[0])
        norm = np.linalg.norm(p2 - p1)
        return cross / norm if norm > 0.5 else cross

    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 4, 2)
    for poly_idx in range(polys.shape[0]):
        txt = labels[poly_idx]
        pts_orig = polys[poly_idx]
        tag = bool(tags[poly_idx])
        angle = (
            math.atan2(pts_orig[2][1] - pts_orig[1][1], pts_orig[2][0] - pts_orig[1][0])
            + math.atan2(pts_orig[3][1] - pts_orig[0][1], pts_orig[3][0] - pts_orig[0][0])
        ) / 2

        dh1 = pts_orig[1] - pts_orig[0]
        dh1 = math.sqrt(dh1[0] ** 2 + dh1[1] ** 2)
        poly_h = int((dh1 + dh1) / 2)
        dhw = pts_orig[1] - pts_orig[2]
        poly_w = math.sqrt(dhw[0] ** 2 + dhw[1] ** 2)

        pts = pts_orig / scale_factor
        pts2 = np.copy(pts)
        c1 = (pts[0] + pts[1]) / 2
        pts[0] = c1 + (pts[0] - c1) / 1.5
        pts[1] = c1 + (pts[1] - c1) / 1.5
        c1 = (pts[2] + pts[3]) / 2
        pts[2] = c1 + (pts[2] - c1) / 1.5
        pts[3] = c1 + (pts[3] - c1) / 1.5

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

        isLine = False
        if txt.find(" ") != -1:
            pts_line = np.copy(pts2)
            c1 = (pts[1] + pts[2]) / 2
            pts_line[2] = c1 + (pts[2] - c1) / 1.2
            pts_line[1] = c1 + (pts[1] - c1) / 1.2
            c1 = (pts[0] + pts[3]) / 2
            pts_line[3] = c1 + (pts[3] - c1) / 1.2
            pts_line[0] = c1 + (pts[0] - c1) / 1.2
            cv2.fillPoly(training_mask, np.asarray([pts_line.round()], np.int32), 0)
            isLine = True

        cv2.fillPoly(poly_mask, np.asarray([pts.round()], np.int32), poly_idx + 1)
        xy_in_poly = np.argwhere(poly_mask == (poly_idx + 1))

        for y, x in xy_in_poly:
            point = np.array([x, y], dtype=np.float32)
            if score_map[y, x] != 0:
                training_mask[y, x] = 0
                continue
            d1 = point_dist_to_line(pts2[1], pts2[2], point)
            d2 = point_dist_to_line(pts2[0], pts2[3], point)
            dw1 = point_dist_to_line(pts2[0], pts2[1], point)
            dw2 = point_dist_to_line(pts2[2], pts2[3], point)
            geo_map[y, x, 0] = d1
            geo_map[y, x, 1] = d2
            geo_map[y, x, 2] = dw1
            if pts_orig[0, 0] > w or pts_orig[1, 0] > w or pts_orig[0, 0] < 0 or pts_orig[1, 0] < 0:
                geo_map[y, x, 2] = -1
            geo_map[y, x, 3] = dw2
            if pts_orig[2, 0] > w or pts_orig[3, 0] > w or pts_orig[2, 0] < 0 or pts_orig[3, 0] < 0:
                geo_map[y, x, 3] = -1
            gt_idx[y, x] = len(gt_out)
            if dw1 < 1 or dw2 < 1:
                score_map[y, x] = 0
            if isLine:
                if dw1 > dw2:
                    geo_map[y, x, 2] = -1
                else:
                    geo_map[y, x, 3] = -1
            geo_map[y, x, 4] = angle

        cv2.fillPoly(score_map, np.asarray([pts.round()], np.int32), 1)
        gt_out.append(pts_orig)
        labels_out.append(txt)

    score_map[training_mask == 0] = 0
    return score_map, geo_map, training_mask, gt_idx, gt_out, labels_out


def decode_quads_oracle(segm, geo, angle, segm_thresh):
    """Scalar transliteration of the adaptor decode loop
    (reference nms/adaptor.cpp:76-117).  Returns list of (quad(4,2), score,
    probs(4,), x, y) in scan order with fixed-point rounding."""
    h, w = segm.shape
    scale_factor = 4.0
    precision = 10000.0
    out = []
    for y in range(h):
        for x in range(w):
            p = segm[y, x]
            if p <= segm_thresh:
                continue
            r = geo[y, x]
            a_sin, a_cos = angle[y, x, 0], angle[y, x, 1]
            xp, yp = x + 0.25, y + 0.25
            pos_r_x = (xp - r[2] * a_cos) * scale_factor
            pos_r_y = (yp - r[2] * a_sin) * scale_factor
            pos_r2_x = (xp + r[3] * a_cos) * scale_factor
            pos_r2_y = (yp + r[3] * a_sin) * scale_factor
            ph = 9.0
            probs = (
                math.exp(-r[2] / ph) * math.exp(-r[1] / ph),
                math.exp(-r[2] / ph) * math.exp(-r[0] / ph),
                math.exp(-r[3] / ph) * math.exp(-r[0] / ph),
                math.exp(-r[3] / ph) * math.exp(-r[1] / ph),
            )
            quad = np.array(
                [
                    [pos_r_x - r[1] * a_sin * scale_factor, pos_r_y + r[1] * a_cos * scale_factor],
                    [pos_r_x + r[0] * a_sin * scale_factor, pos_r_y - r[0] * a_cos * scale_factor],
                    [pos_r2_x + r[0] * a_sin * scale_factor, pos_r2_y - r[0] * a_cos * scale_factor],
                    [pos_r2_x - r[1] * a_sin * scale_factor, pos_r2_y + r[1] * a_cos * scale_factor],
                ]
            )
            quad = np.round(quad * precision) / precision
            out.append((quad, p, np.array(probs), x, y))
    return out


def generate_rbox2_oracle(im_shape, polys, tags, labels):
    """Scalar transliteration of generate_rbox2 (reference
    tools/data_gen.py:255-412)."""
    import cv2

    h, w = im_shape
    scale_factor = 4
    hs, ws = int(h / scale_factor), int(w / scale_factor)
    poly_mask = np.zeros((hs, ws), dtype=np.uint8)
    poly_full = np.zeros((hs, ws), dtype=np.uint8)
    score_map = np.zeros((hs, ws), dtype=np.float32)
    geo_map = np.zeros((hs, ws, 5), dtype=np.float32)
    training_mask = np.ones((hs, ws), dtype=np.uint8)
    gt_idx = np.full((hs, ws), -1, dtype=np.int64)
    labels_out, gt_out = [], []

    polys = np.asarray(polys, dtype=np.float64).reshape(-1, 4, 2)
    for poly_idx in range(polys.shape[0]):
        txt = labels[poly_idx]
        pts_orig = polys[poly_idx]
        tag = bool(tags[poly_idx])
        angle = (
            math.atan2(pts_orig[2][1] - pts_orig[1][1], pts_orig[2][0] - pts_orig[1][0])
            + math.atan2(pts_orig[3][1] - pts_orig[0][1], pts_orig[3][0] - pts_orig[0][0])
        ) / 2
        dh1v = pts_orig[1] - pts_orig[0]
        dh1 = math.sqrt(dh1v[0] ** 2 + dh1v[1] ** 2)
        poly_h = int((dh1 + dh1) / 2)
        dhw = pts_orig[1] - pts_orig[2]
        poly_w = math.sqrt(dhw[0] ** 2 + dhw[1] ** 2)
        pts = pts_orig / scale_factor
        pts2 = np.copy(pts)
        c1 = (pts[0] + pts[1]) / 2
        pts[0] = c1 + (pts[0] - c1) / 2
        pts[1] = c1 + (pts[1] - c1) / 2
        c1 = (pts[2] + pts[3]) / 2
        pts[2] = c1 + (pts[2] - c1) / 2
        pts[3] = c1 + (pts[3] - c1) / 2
        if (tag or poly_h < 6 or poly_w < 6 or np.sum(pts < 0) != 0
                or pts_orig[:, 0].max() > w or pts_orig[:, 1].max() > w
                or (poly_w < poly_h and len(txt) > 3)):
            cv2.fillPoly(training_mask, np.asarray([pts2.round()], np.int32), 0)
            continue
        isLine = False
        if txt.find(" ") != -1:
            pts_line = np.copy(pts2)
            c1 = (pts[1] + pts[2]) / 2
            pts_line[2] = c1 + (pts[2] - c1) / 1.5
            pts_line[1] = c1 + (pts[1] - c1) / 1.5
            c1 = (pts[0] + pts[3]) / 2
            pts_line[3] = c1 + (pts[3] - c1) / 1.5
            pts_line[0] = c1 + (pts[0] - c1) / 1.5
            cv2.fillPoly(training_mask, np.asarray([pts_line.round()], np.int32), 0)
            isLine = True
        cv2.fillPoly(poly_mask, np.asarray([pts.round()], np.int32), poly_idx + 1)
        cv2.fillPoly(poly_full, np.asarray([pts2.round()], np.int32), poly_idx + 1)
        xy_in_poly = np.argwhere(poly_mask == (poly_idx + 1))
        xy_in_polyf = np.argwhere(poly_full == (poly_idx + 1))
        for y, x in xy_in_poly:
            point = np.array([x, y], dtype=np.float32)
            if score_map[y, x] != 0:
                training_mask[y, x] = 0
                continue
            same_y = xy_in_polyf[xy_in_polyf[:, 0] == point[1]]
            min_x = same_y[:, 1].min()
            max_x = same_y[:, 1].max()
            same_x = xy_in_polyf[xy_in_polyf[:, 1] == point[0]]
            min_y = same_x[:, 0].min()
            max_y = same_x[:, 0].max()
            d1 = point[1] - min_y
            d2 = max_y - point[1]
            dw1 = point[0] - min_x
            dw2 = max_x - point[0]
            geo_map[y, x, 0] = d1
            geo_map[y, x, 1] = d2
            geo_map[y, x, 2] = dw1
            if pts_orig[0, 0] > w or pts_orig[1, 0] > w or pts_orig[0, 0] < 0 or pts_orig[1, 0] < 0:
                geo_map[y, x, 2] = -1
            geo_map[y, x, 3] = dw2
            if pts_orig[2, 0] > w or pts_orig[3, 0] > w or pts_orig[2, 0] < 0 or pts_orig[3, 0] < 0:
                geo_map[y, x, 3] = -1
            gt_idx[y, x] = len(gt_out)
            if dw1 < 0.5 or dw2 < 0.5:
                training_mask[y, x] = 0
            if isLine:
                if dw1 > dw2:
                    geo_map[y, x, 2] = -1
                else:
                    geo_map[y, x, 3] = -1
            geo_map[y, x, 4] = angle
        cv2.fillPoly(score_map, np.asarray([pts], np.int32), 1)
        gt_out.append(pts_orig)
        labels_out.append(txt)
    score_map[training_mask == 0] = 0
    score_map = cv2.blur(score_map, (3, 3))
    return score_map, geo_map, training_mask, gt_idx, gt_out, labels_out
