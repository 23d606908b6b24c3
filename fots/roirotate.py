"""Training-time RoIRotate sampling: predictions+GT -> fixed-size roi batch.

Re-implements the host logic of ``process_boxes`` (reference
src/ocr_process.py:73-303) and its GT-only variant ``process_crnn``
(src/utils.py:390-478), producing *fixed-shape padded* roi batches (the
TPU replacement for per-step dynamic roi counts):

Filters preserved from the reference (ocr_process.py:104-187):
- sample up to 100 random predicted text pixels (pred>0.5 and gt>0);
- at most 3 crops per GT word (the reference's ``count > 2`` check);
- skip '##'-tagged transcriptions;
- GT short-edge height >= 10 px;
- GT box inside image (the reference compares y against the image *width*
  — ocr_process.py:136 uses size(3) twice; reproduced);
- predicted-vs-GT angle error < pi/16;
- axis-aligned IoU(pred box, gt box) >= 0.9; height ratio >= 0.5;
- always append every valid GT box (ocr_process.py:196-221), cap 32 rois.

Output rois feed ``rroi_align(focr, rois, 11, W, 1/4)`` with W snapped to
a width bucket, then the recognition head + CTC.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import cv2
import numpy as np

from fots.codec import LabelCodec
from fots.ops.rroi_align import width_bucket

# MAX_ROIS / MAX_LABEL_LEN / TRAIN_STRIP_BUCKETS are env-overridable
# compile-surface knobs: the driver's multi-chip dryrun
# (__graft_entry__.dryrun_multichip) must jit the FULL train step on a
# virtual 8-device CPU mesh of a 1-core host inside a ~10 min budget, and
# the compiled program size scales with all three.  Production defaults
# match the reference (32 rois/batch, ocr_process.py:104-221).
MAX_ROIS = int(os.environ.get("FOTS_MAX_ROIS", "32"))
MAX_LABEL_LEN = int(os.environ.get("FOTS_MAX_LABEL_LEN", "64"))
POOLED_HEIGHT = 11  # reference ocr_process.py:260

# coarse bucket grid for TRAINING strips: every distinct width compiles a
# fresh train step — ~90 s over the remote-compile tunnel — so the grid is
# just {256, 512}: 256 covers aspect ratios up to ~23 (the reference's
# dynamic ceil(11*max_aspect) width, ocr_process.py:260-263), and 512
# catches rare extreme-aspect batches.  The bucket choice does NOT affect
# the CTC objective: the train step masks logit_lengths down to the
# reference's batch-dynamic T = ceil(11*max_aspect) (fots/train.py), so a
# wider compiled bucket only costs FLOPs on masked frames, never changes
# training dynamics.  The bucket width DOES leak into the features through
# the recognition head's InstanceNorm statistics (computed over the padded
# strip), so serving must run rois at the SAME bucket grid — unless the
# model is trained with masked (bucket-width-invariant) InstanceNorm,
# Trainer(masked_norm=True), in which case serving may use the fine
# FINE_STRIP_BUCKETS grid.  See fots/pipeline.py:STRIP_BUCKETS.
TRAIN_STRIP_BUCKETS = tuple(
    int(w) for w in os.environ.get(
        "FOTS_TRAIN_STRIP_BUCKETS", "256,512").split(","))


@dataclass
class RoiBatch:
    rois: np.ndarray           # [MAX_ROIS, 6] float32 (padded)
    labels: np.ndarray         # [MAX_ROIS, MAX_LABEL_LEN] int32
    label_lengths: np.ndarray  # [MAX_ROIS] int32
    roi_mask: np.ndarray       # [MAX_ROIS] float32 1=valid
    strip_width: int           # static pooled width bucket
    n_predicted: int           # rois sampled from predictions
    n_gt: int                  # rois from GT quads


def _axis_iou(a, b):
    r0, c0 = max(a[0], b[0]), max(a[1], b[1])
    r1, c1 = min(a[2], b[2]), min(a[3], b[3])
    inter = (r1 - r0) * (c1 - c0) if (r1 > r0 and c1 > c0) else 0.0
    u = (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))
    union = (u[2] - u[0]) * (u[3] - u[1])
    return inter / float(union) if union > 0 else 0.0


def sample_rois(
    rng: np.random.Generator,
    score_maps: np.ndarray,       # [B,hs,ws] GT score
    gt_idxs: np.ndarray,          # [B,hs,ws] pixel -> word index
    gt_quads: Sequence[Sequence[np.ndarray]],
    labels: Sequence[Sequence[str]],
    im_hw,
    codec: LabelCodec,
    segm_pred: Optional[np.ndarray] = None,   # [B,hs,ws] predictions
    geo_pred: Optional[np.ndarray] = None,    # [B,hs,ws,4]
    angle_pred: Optional[np.ndarray] = None,  # [B,hs,ws,2] (sin,cos)
    max_rois: int = MAX_ROIS,
    jitter: bool = True,
    pred_candidates: Optional[np.ndarray] = None,  # [B,8,K] packed rows
    pred_map_hw=None,                              # (hs, ws) for candidates
) -> RoiBatch:
    """Build one fixed-shape roi batch for the whole image batch.

    Predicted-pixel sampling takes either full prediction maps
    (segm/geo/angle_pred) or pre-extracted random candidates from
    :func:`fots.train.extract_roi_candidates` (``pred_candidates`` packed as
    ``(score, d0..d3, sin, cos, flat_idx)`` channels; invalid slots have
    score <= 0) — the on-device extraction ships ~100x fewer bytes per
    step while keeping the same uniform-sample semantics.
    """
    H, W = im_hw
    rrois: List[List[float]] = []
    texts: List[str] = []
    n_pred = 0
    n_gt = 0

    B = score_maps.shape[0]
    for bid in range(B):
        gts = gt_quads[bid]
        lbs = labels[bid]

        # ---- predicted-pixel sampling (ocr_process.py:93-187) ----
        cand = None  # (ys, xs, geo rows [n,4], sin [n], cos [n])
        if pred_candidates is not None and len(gts) > 0:
            rows = np.asarray(pred_candidates[bid]).T      # [K, 8]
            rows = rows[rows[:, 0] > 0]
            if rows.shape[0]:
                flat = rows[:, 7].astype(np.int64)
                cand = (flat // pred_map_hw[1], flat % pred_map_hw[1],
                        rows[:, 1:5], rows[:, 5], rows[:, 6])
        elif (segm_pred is not None and geo_pred is not None
                and angle_pred is not None and len(gts) > 0):
            # full-map path: geo/angle indexed per candidate pixel
            to_walk = segm_pred[bid] * score_maps[bid] * (segm_pred[bid] > 0.5)
            ys, xs = np.nonzero(to_walk > 0)
            if ys.size:
                cand = (ys, xs, geo_pred[bid, ys, xs],
                        angle_pred[bid, ys, xs, 0], angle_pred[bid, ys, xs, 1])
        if cand is not None:
            ys_c, xs_c, geo_c, sin_c, cos_c = cand
            order = rng.permutation(len(ys_c))[: min(len(ys_c), 100)]
            counts: dict = {}
            for k in order:
                y, x = int(ys_c[k]), int(xs_c[k])
                gt_id = int(gt_idxs[bid, y, x])
                if gt_id < 0 or gt_id >= len(gts):
                    continue
                counts.setdefault(gt_id, 0)
                if counts[gt_id] > 2:
                    continue
                gt = np.asarray(gts[gt_id])
                gt_txt = lbs[gt_id]
                if gt_txt.startswith("##"):
                    continue
                dh = gt[1] - gt[0]
                h_gt = math.hypot(dh[0], dh[1])
                if h_gt < 10:
                    continue
                # parity: both axes compared to image width
                if gt[:, 0].max() > W or gt[:, 1].max() > W:
                    continue
                a_sin = float(sin_c[k])
                a_cos = float(cos_c[k])
                angle = math.atan2(a_sin, a_cos)
                angle_gt = (
                    math.atan2(gt[2][1] - gt[1][1], gt[2][0] - gt[1][0])
                    + math.atan2(gt[3][1] - gt[0][1], gt[3][0] - gt[0][0])
                ) / 2
                if math.fabs(angle_gt - angle) > math.pi / 16:
                    continue
                off = geo_c[k]
                yp, xp = y + 0.25, x + 0.25
                pos_g = np.array([(xp - off[0] * math.sin(angle)) * 4,
                                  (yp - off[0] * math.cos(angle)) * 4])
                pos_g2 = np.array([(xp + off[1] * math.sin(angle)) * 4,
                                   (yp + off[1] * math.cos(angle)) * 4])
                pos_r = np.array([(xp - off[2] * math.cos(angle)) * 4,
                                  (yp - off[2] * math.sin(angle)) * 4])
                pos_r2 = np.array([(xp + off[3] * math.cos(angle)) * 4,
                                   (yp + off[3] * math.sin(angle)) * 4])
                center = (pos_g + pos_g2 + pos_r + pos_r2) / 2 - [4 * x, 4 * y]
                dw = pos_r - pos_r2
                dhv = pos_g - pos_g2
                w_box = math.hypot(dw[0], dw[1])
                h_box = math.hypot(dhv[0], dhv[1])
                rect = ((center[0], center[1]), (w_box, h_box), angle * 180 / math.pi)
                pts = cv2.boxPoints(rect)
                bb = cv2.boundingRect(pts)
                pred_bbox = [bb[0], bb[1], bb[0] + bb[2], bb[1] + bb[3]]
                gt_bbox = [gt[:, 0].min(), gt[:, 1].min(), gt[:, 0].max(), gt[:, 1].max()]
                if _axis_iou(pred_bbox, gt_bbox) < 0.9:
                    continue
                if min(h_box, h_gt) / max(h_box, h_gt) < 0.5:
                    continue
                ang_deg = -angle / math.pi * 180.0
                rrois.append([bid, center[0], center[1], h_box, w_box, ang_deg])
                texts.append(gt_txt)
                counts[gt_id] += 1
                n_pred += 1

        # ---- always append GT rois (ocr_process.py:196-221) ----
        if len(gts) > 0:
            g = np.asarray(gts, dtype=np.float64)
            center = g.mean(axis=1)
            dw = g[:, 2, :] - g[:, 1, :]
            dh = g[:, 1, :] - g[:, 0, :]
            w_all = np.sqrt((dw ** 2).sum(-1))
            h_all = np.sqrt((dh ** 2).sum(-1))
            if jitter:
                h_all = h_all + int(rng.integers(-2, 3))
            ang = (
                np.arctan2(g[:, 2, 1] - g[:, 1, 1], g[:, 2, 0] - g[:, 1, 0])
                + np.arctan2(g[:, 3, 1] - g[:, 0, 1], g[:, 3, 0] - g[:, 0, 0])
            ) / 2
            ang_deg = -ang / math.pi * 180.0
            for gi in range(len(gts)):
                gt_txt = lbs[gi]
                if gt_txt.startswith("##"):
                    continue
                gt = np.asarray(gts[gi])
                if gt[:, 0].max() > W or gt[:, 1].max() > H or gt.min() < 0:
                    continue
                if h_all[gi] <= 0 or w_all[gi] <= 0:
                    continue
                rrois.append([bid, center[gi][0], center[gi][1],
                              h_all[gi], w_all[gi], ang_deg[gi]])
                texts.append(gt_txt)
                n_gt += 1

    if len(rrois) > max_rois:  # cap (ocr_process.py:253-255)
        rrois = rrois[:max_rois]
        texts = texts[:max_rois]

    rois_arr = np.zeros((max_rois, 6), np.float32)
    mask = np.zeros((max_rois,), np.float32)
    n = len(rrois)
    if n:
        rois_arr[:n] = np.asarray(rrois, np.float32)
        mask[:n] = 1.0
        ratio = (rois_arr[:n, 4] / np.maximum(rois_arr[:n, 3], 1e-6)).max()
        width = width_bucket(int(math.ceil(POOLED_HEIGHT * float(ratio))),
                             buckets=TRAIN_STRIP_BUCKETS)
    else:
        width = width_bucket(POOLED_HEIGHT, buckets=TRAIN_STRIP_BUCKETS)
    # padding slots get a harmless dummy roi (masked out downstream)
    rois_arr[n:] = [0, 8.0, 8.0, 8.0, 8.0, 0.0]

    labels_mat, lengths = codec.encode_padded(texts + [""] * (max_rois - n), MAX_LABEL_LEN)
    lengths[n:] = 0
    return RoiBatch(
        rois=rois_arr,
        labels=labels_mat,
        label_lengths=lengths,
        roi_mask=mask,
        strip_width=int(width),
        n_predicted=n_pred,
        n_gt=n_gt,
    )
