"""Loss parity: scalar/NumPy oracles of the reference loss math, and CTC
cross-checked against torch's CPU CTC implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from fots.losses import ctc_loss, detection_loss, dice_loss, iou_loss


def test_dice_matches_reference_formula(rng):
    p = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
    t = (rng.uniform(0, 1, (2, 8, 8)) > 0.5).astype(np.float32)
    got = float(dice_loss(jnp.asarray(p), jnp.asarray(t)))
    inter = (p * t).sum()
    want = -((2 * inter + 1) / (p.sum() + t.sum() + 1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # perfect prediction ~ -1
    assert float(dice_loss(jnp.asarray(t), jnp.asarray(t))) < -0.9


def _iou_loss_oracle(geo_gt, mask, geo_pred):
    """Boolean-indexing transliteration of reference models.py:197-235."""
    m = mask.astype(bool)
    d1g, d2g, d3g, d4g = [geo_gt[..., i][m] for i in range(4)]
    d1p, d2p, d3p, d4p = [geo_pred[..., i][m] for i in range(4)]
    out = 0.0
    for dg, dp, msk in ((d3g, d3p, d3g > 0), (d4g, d4p, d4g > 0)):
        if msk.sum() == 0:
            continue
        a_gt = (d1g[msk] + d2g[msk]) * dg[msk]
        a_p = (d1p[msk] + d2p[msk]) * dp[msk]
        w_u = np.minimum(dg[msk], dp[msk])
        h_u = np.minimum(d1g[msk], d1p[msk]) + np.minimum(d2g[msk], d2p[msk])
        inter = w_u * h_u
        union = a_gt + a_p - inter
        out += np.mean(-np.log((inter + 1) / (union + 1)))
    return out


def test_iou_loss_matches_oracle(rng):
    B, H, W = 2, 16, 16
    geo_gt = rng.uniform(0, 30, (B, H, W, 4)).astype(np.float32)
    # poison some side distances to -1 like the target generator does
    geo_gt[..., 2] *= rng.uniform(0, 1, (B, H, W)) > 0.3
    geo_gt[..., 2][geo_gt[..., 2] == 0] = -1
    geo_pred = rng.uniform(0, 30, (B, H, W, 4)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W)) > 0.5).astype(np.float32)
    got = float(iou_loss(jnp.asarray(geo_gt), jnp.asarray(mask), jnp.asarray(geo_pred)))
    want = _iou_loss_oracle(geo_gt, mask, geo_pred)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_detection_loss_runs_and_finite(rng):
    B, Hs, Ws = 1, 16, 16
    outputs = {
        "segm": [jnp.asarray(rng.uniform(0, 1, (B, Hs, Ws, 1)), jnp.float32),
                 jnp.asarray(rng.uniform(0, 1, (B, Hs // 2, Ws // 2, 1)), jnp.float32)],
        "rbox": [jnp.asarray(rng.uniform(0, 64, (B, Hs, Ws, 4)), jnp.float32),
                 jnp.asarray(rng.uniform(0, 64, (B, Hs // 2, Ws // 2, 4)), jnp.float32)],
        "angle": [jnp.asarray(rng.uniform(-1, 1, (B, Hs, Ws, 2)), jnp.float32),
                  jnp.asarray(rng.uniform(-1, 1, (B, Hs // 2, Ws // 2, 2)), jnp.float32)],
    }
    score_gt = jnp.asarray((rng.uniform(0, 1, (B, Hs, Ws)) > 0.6), jnp.float32)
    mask = jnp.ones((B, Hs, Ws), jnp.float32)
    geo_gt = jnp.asarray(rng.uniform(0, 30, (B, Hs, Ws, 4)), jnp.float32)
    angle_gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, Hs, Ws)), jnp.float32)
    losses = detection_loss(outputs, score_gt, mask, geo_gt, angle_gt)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    got = float(losses["total"])
    want = float(losses["segm"]) + 2 * float(losses["angle"]) + 0.5 * float(losses["iou"])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_detection_loss_empty_mask_is_finite():
    B, Hs, Ws = 1, 8, 8
    z = jnp.zeros
    outputs = {
        "segm": [z((B, Hs, Ws, 1)), z((B, Hs // 2, Ws // 2, 1))],
        "rbox": [z((B, Hs, Ws, 4)), z((B, Hs // 2, Ws // 2, 4))],
        "angle": [z((B, Hs, Ws, 2)), z((B, Hs // 2, Ws // 2, 2))],
    }
    losses = detection_loss(outputs, z((B, Hs, Ws)), z((B, Hs, Ws)),
                            z((B, Hs, Ws, 4)), z((B, Hs, Ws)))
    assert np.isfinite(float(losses["total"]))


def test_ctc_matches_torch(rng):
    torch = pytest.importorskip("torch")
    N, T, K, L = 3, 12, 8, 4
    logits = rng.standard_normal((N, T, K)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(1, K, (N, L)).astype(np.int32)
    lengths = np.array([4, 2, 3], dtype=np.int32)
    labels_masked = labels.copy()
    for i, l in enumerate(lengths):
        labels_masked[i, l:] = 0

    got = float(ctc_loss(jnp.asarray(log_probs), jnp.asarray(labels_masked),
                         jnp.asarray(lengths)))

    lp = torch.from_numpy(log_probs).permute(1, 0, 2)  # [T,N,K]
    tgt = torch.from_numpy(
        np.concatenate([labels[i, :lengths[i]] for i in range(N)]).astype(np.int64)
    )
    want = torch.nn.functional.ctc_loss(
        lp, tgt, torch.full((N,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)),
        blank=0, reduction="mean", zero_infinity=False,
    )
    # torch 'mean' divides each example by its label length then averages;
    # compare against per-example sum/batch (warp-ctc style) instead
    want_sum = torch.nn.functional.ctc_loss(
        lp, tgt, torch.full((N,), T, dtype=torch.long),
        torch.from_numpy(lengths.astype(np.int64)),
        blank=0, reduction="sum",
    ) / N
    np.testing.assert_allclose(got, float(want_sum), rtol=1e-4)


def test_ctc_roi_mask_excludes_padding(rng):
    N, T, K, L = 4, 10, 6, 3
    logits = rng.standard_normal((N, T, K)).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = np.zeros((N, L), np.int32)
    labels[:2, :2] = 1
    lengths = np.array([2, 2, 0, 0], np.int32)
    mask = np.array([1, 1, 0, 0], np.float32)
    got = float(ctc_loss(jnp.asarray(log_probs), jnp.asarray(labels),
                         jnp.asarray(lengths), roi_mask=jnp.asarray(mask)))
    got2 = float(ctc_loss(jnp.asarray(log_probs[:2]), jnp.asarray(labels[:2]),
                          jnp.asarray(lengths[:2])))
    np.testing.assert_allclose(got, got2, rtol=1e-5)


def test_ohem_score_loss_selects_hard_negatives():
    """OHEM: perfect predictions -> ~0 loss; hard negatives dominate when
    a few background pixels confidently fire."""
    from fots.losses import ohem_score_loss

    B, H, W = 2, 16, 16
    gt = np.zeros((B, H, W), np.float32)
    gt[:, 4:8, 4:12] = 1.0
    mask = np.ones((B, H, W), np.float32)

    perfect = jnp.asarray(np.where(gt > 0.5, 0.999999, 1e-6).astype(np.float32))
    low = float(ohem_score_loss(perfect, jnp.asarray(gt), jnp.asarray(mask)))
    assert low < 1e-3

    # 3 confident false positives per image -> selected as hard negatives
    bad = np.where(gt > 0.5, 0.999999, 1e-6).astype(np.float32)
    bad[:, 0, :3] = 0.99
    high = float(ohem_score_loss(jnp.asarray(bad), jnp.asarray(gt), jnp.asarray(mask)))
    assert high > low + 0.01

    # with a tiny hard-negative budget the same FPs weigh MORE per pixel
    high_small_k = float(ohem_score_loss(jnp.asarray(bad), jnp.asarray(gt),
                                         jnp.asarray(mask), n_hard_neg=4))
    assert high_small_k > high


def test_ohem_respects_training_mask():
    from fots.losses import ohem_score_loss

    gt = np.zeros((1, 8, 8), np.float32)
    pred = np.full((1, 8, 8), 0.99, np.float32)  # all false positives
    mask0 = np.zeros((1, 8, 8), np.float32)
    assert float(ohem_score_loss(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(mask0))) == 0.0


def test_detection_loss_ohem_flag():
    """ohem=True swaps only the score term; angle/iou terms unchanged."""
    from fots.losses import detection_loss

    rng = np.random.default_rng(0)
    B, H, W = 1, 8, 8
    out = {
        "segm": [jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)),
                 jnp.asarray(rng.uniform(0, 1, (B, H // 2, W // 2, 1)).astype(np.float32))],
        "rbox": [jnp.asarray(rng.uniform(1, 8, (B, H, W, 4)).astype(np.float32)),
                 jnp.asarray(rng.uniform(1, 8, (B, H // 2, W // 2, 4)).astype(np.float32))],
        "angle": [jnp.asarray(rng.uniform(-1, 1, (B, H, W, 2)).astype(np.float32)),
                  jnp.asarray(rng.uniform(-1, 1, (B, H // 2, W // 2, 2)).astype(np.float32))],
    }
    score = np.zeros((B, H, W), np.float32); score[:, 2:6, 2:6] = 1.0
    mask = np.ones((B, H, W), np.float32)
    geo = rng.uniform(1, 4, (B, H, W, 4)).astype(np.float32)
    ang = np.zeros((B, H, W), np.float32)
    d = detection_loss(out, jnp.asarray(score), jnp.asarray(mask),
                       jnp.asarray(geo), jnp.asarray(ang))
    o = detection_loss(out, jnp.asarray(score), jnp.asarray(mask),
                       jnp.asarray(geo), jnp.asarray(ang), ohem=True)
    assert float(o["angle"]) == float(d["angle"])
    assert float(o["iou"]) == float(d["iou"])
    assert float(o["segm"]) != float(d["segm"])
    assert np.isfinite(float(o["total"]))
