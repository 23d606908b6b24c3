"""Training losses (pure JAX, static shapes, mask-weighted).

Re-implements the reference's loss semantics with boolean indexing replaced
by mask-weighted reductions (XLA needs static shapes):

- dice loss (reference tools/models.py:105-113) — note the reference's
  dice is *negative* (≈ -1 at perfect overlap); kept as-is so loss curves
  are comparable.
- angle sin/cos MSE over gt-text pixels (models.py:478-485).
- EAST IoU loss with separate left/right width validity masks
  (models.py:197-235): ``-log((I+1)/(U+1))`` on axis-aligned boxes built
  from the 4 distances.
- combined: ``dice + 2*angle + 0.5*iou`` (models.py:505), with the 1/8
  multi-scale terms using align_corners bilinear-resized ground truth
  (models.py:469-503).
- CTC: optax.ctc_loss with blank=0, summed then divided by batch
  (warp-ctc semantics, reference src/ocr_process.py:300-301).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import optax

from fots.models.layers import resize_bilinear


def dice_loss(pred, target):
    """Reference dice (models.py:105-113): -(2*I + 1)/(sum + 1)."""
    smooth = 1.0
    p = pred.reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(p * t)
    return -((2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth))


def _masked_mean(x, mask):
    cnt = jnp.sum(mask)
    return jnp.where(cnt > 0, jnp.sum(x * mask) / jnp.maximum(cnt, 1.0), 0.0)


def iou_loss(geo_gt, mask, geo_pred):
    """EAST IoU loss (reference iou_loss, models.py:197-235).

    geo_gt: [B,H,W,4] gt distances (top,bottom,left,right); mask: [B,H,W]
    text-pixel mask; geo_pred: [B,H,W,4].  The left/right halves are
    evaluated separately under validity masks d3>0 / d4>0.
    """
    d1_gt, d2_gt, d3_gt, d4_gt = [geo_gt[..., i] for i in range(4)]
    d1_p, d2_p, d3_p, d4_p = [geo_pred[..., i] for i in range(4)]

    def half(dside_gt, dside_p):
        m = mask * (dside_gt > 0)
        area_gt = (d1_gt + d2_gt) * dside_gt
        area_p = (d1_p + d2_p) * dside_p
        w_union = jnp.minimum(dside_gt, dside_p)
        h_union = jnp.minimum(d1_gt, d1_p) + jnp.minimum(d2_gt, d2_p)
        inter = w_union * h_union
        union = area_gt + area_p - inter
        # sanitize masked-out pixels BEFORE the log: poisoned gt distances
        # (-1) make union+1 <= 0 there, and 0 * NaN would still be NaN
        ratio = jnp.where(m > 0, (inter + 1.0) / (union + 1.0), 1.0)
        aabb = -jnp.log(jnp.maximum(ratio, 1e-8))
        return _masked_mean(aabb, m)

    return half(d3_gt, d3_p) + half(d4_gt, d4_p)


def _resize_map(x, out_hw):
    """Bilinear align_corners resize of a [B,H,W] map."""
    return resize_bilinear(x[..., None], out_hw)[..., 0]


def ohem_score_loss(pred, score_gt, training_mask, n_hard_neg: int = 512):
    """Per-image OHEM classification loss (FOTS paper arXiv:1801.01671
    §3.4; the reference repo omits it — SURVEY.md §2.2 — so this is an
    opt-in improvement, not a parity behavior).

    Balanced binary cross-entropy over all positive pixels plus the
    ``n_hard_neg`` highest-loss negative pixels per image.  Hard-negative
    selection uses ``jax.lax.top_k`` so shapes stay static under jit; when
    an image has fewer than ``n_hard_neg`` negatives the extra top-k slots
    carry zero loss and the denominator counts only real negatives.
    """
    import jax

    b = pred.shape[0]
    tgt = (score_gt > 0.5).astype(pred.dtype)
    m = training_mask.astype(pred.dtype)
    p = jnp.clip(pred.astype(jnp.float32), 1e-6, 1.0 - 1e-6)
    ce = -(tgt * jnp.log(p) + (1.0 - tgt) * jnp.log(1.0 - p)) * m

    pos = tgt * m
    neg = (1.0 - tgt) * m
    neg_ce = (ce * neg).reshape(b, -1)
    k = min(n_hard_neg, neg_ce.shape[1])
    hard_neg = jax.lax.top_k(neg_ce, k)[0].sum(-1)              # [B]
    pos_sum = (ce * pos).reshape(b, -1).sum(-1)
    n_sel = pos.reshape(b, -1).sum(-1) + jnp.minimum(neg.reshape(b, -1).sum(-1), float(k))
    return jnp.mean((pos_sum + hard_neg) / jnp.maximum(n_sel, 1.0))


def detection_loss(
    outputs: Dict,
    score_gt,
    training_mask,
    geo_gt,
    angle_gt,
    multi_scale: bool = True,
    ohem: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full EAST loss (reference ModelResNetSep2.loss, models.py:459-505).

    outputs: the detector's dict (segm/rbox/angle lists, NHWC);
    score_gt/training_mask/angle_gt: [B,Hs,Ws]; geo_gt: [B,Hs,Ws,4].
    ``ohem=True`` swaps the dice score loss for the FOTS paper's OHEM
    cross-entropy (:func:`ohem_score_loss`).
    Returns dict of scalars: total, segm, angle, iou.
    """
    segm_p = outputs["segm"][0][..., 0]
    angle_p = outputs["angle"][0]
    geo_p = outputs["rbox"][0]

    score_fn = ohem_score_loss if ohem else (
        lambda p, gt, m: dice_loss(p * m, gt * m))
    segm_loss = score_fn(segm_p, score_gt, training_mask)

    if multi_scale:
        segm_p2 = outputs["segm"][1][..., 0]
        hw2 = segm_p2.shape[1:3]
        gt2 = _resize_map(score_gt, hw2)
        m2 = _resize_map(training_mask, hw2)
        segm_loss = segm_loss + score_fn(segm_p2, gt2, m2)

    byte_mask = (score_gt > 0.5).astype(segm_p.dtype)
    gt_sin = jnp.sin(angle_gt)
    gt_cos = jnp.cos(angle_gt)
    angle_loss = _masked_mean((angle_p[..., 0] - gt_sin) ** 2, byte_mask) + _masked_mean(
        (angle_p[..., 1] - gt_cos) ** 2, byte_mask
    )
    box_loss = iou_loss(geo_gt, byte_mask, geo_p)

    if multi_scale:
        angle_p2 = outputs["angle"][1]
        geo_p2 = outputs["rbox"][1]
        hw2 = angle_p2.shape[1:3]
        bm2 = (_resize_map(score_gt, hw2) > 0.5).astype(segm_p.dtype)
        ag2 = _resize_map(angle_gt, hw2)
        angle_loss = angle_loss + _masked_mean(
            (angle_p2[..., 0] - jnp.sin(ag2)) ** 2, bm2
        ) + _masked_mean((angle_p2[..., 1] - jnp.cos(ag2)) ** 2, bm2)
        geo2 = resize_bilinear(geo_gt, hw2) / 2.0
        box_loss = box_loss + iou_loss(geo2, bm2, geo_p2)

    total = segm_loss + angle_loss * 2.0 + 0.5 * box_loss
    return {
        "total": total,
        "segm": segm_loss,
        "angle": angle_loss,
        "iou": box_loss,
    }


def ctc_loss(log_probs, labels, label_lengths, logit_lengths=None, roi_mask=None):
    """CTC with blank=0 and warp-ctc-style batch-mean reduction.

    log_probs: [N, T, K]; labels: [N, L] padded with 0; label_lengths: [N];
    roi_mask: optional [N] 0/1 validity of padded roi slots.  Division is
    by the number of *valid* rois, matching the reference's
    ``ctc_loss(...)/B`` (src/ocr_process.py:300-301) once padding slots
    are excluded.
    """
    n, t, _ = log_probs.shape
    if logit_lengths is None:
        logit_lengths = jnp.full((n,), t, dtype=jnp.int32)
    frame_ids = jnp.arange(t)[None, :]
    logit_paddings = (frame_ids >= logit_lengths[:, None]).astype(log_probs.dtype)
    pos_ids = jnp.arange(labels.shape[1])[None, :]
    label_paddings = (pos_ids >= label_lengths[:, None]).astype(log_probs.dtype)
    per_example = optax.ctc_loss(log_probs, logit_paddings, labels, label_paddings, blank_id=0)
    # impossible alignments (more label symbols than frames) produce the
    # optax log-eps clamp (~1e5) and would drown the real signal; mask them
    feasible = (label_lengths <= logit_lengths).astype(log_probs.dtype)
    if roi_mask is None:
        roi_mask = jnp.ones((n,), log_probs.dtype)
    roi_mask = roi_mask * feasible
    cnt = jnp.maximum(jnp.sum(roi_mask), 1.0)
    return jnp.sum(per_example * roi_mask) / cnt
