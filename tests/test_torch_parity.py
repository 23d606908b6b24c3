"""Cross-framework numeric parity vs the runnable torch reference.

The reference's pretrained weights are not in the container
(/root/reference/weights is empty), so the strongest available correctness
evidence is: instantiate the actual reference ``ModelResNetSep2``
(tools/models.py:237-505) on CPU torch with random weights, pull its
``state_dict()`` through :func:`fots.checkpoint.import_torch_state_dict`,
and assert pixel-wise closeness of

- the full detection forward (reference models.py:387-457),
- ``forward_ocr`` on random strips (models.py:334-379),
- the training loss on identical inputs (models.py:459-505).

This exercises the same code path a real .h5 import uses, so any kernel
transpose, instance-norm eps, CReLU ordering, or align-corners mismatch
fails here.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles / subprocess drives; smoke tier = -m "not slow"

torch = pytest.importorskip("torch")

REF_TOOLS = "/root/reference/tools"


@pytest.fixture(scope="module")
def ref_models():
    if REF_TOOLS not in sys.path:
        sys.path.insert(0, REF_TOOLS)
    return pytest.importorskip("models")


@pytest.fixture(scope="module")
def pair(ref_models):
    """(torch net, flax model, imported variables), weights synchronized."""
    import jax

    from fots.checkpoint import import_torch_state_dict
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector

    torch.manual_seed(0)
    net = ref_models.ModelResNetSep2(attention=True, multi_scale=True, nclass=87)
    net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0),
                              image_shape=(1, 64, 64, 3))
    variables, imported, skipped = import_torch_state_dict(sd, variables)
    # every torch param must land somewhere, except dead reference params:
    # batch6/8/9 are declared (models.py:276-279) but never applied in
    # forward_ocr (models.py:334-379), and num_batches_tracked is BN state
    dead = ("batch6.", "batch8.", "batch9.")
    real_skipped = [k for k in skipped
                    if not k.endswith("num_batches_tracked")
                    and not k.startswith(dead)]
    assert not real_skipped, f"unmapped torch keys: {real_skipped}"
    return net, model, variables


def test_forward_parity(pair):
    net, model, variables = pair
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0, (2, 96, 128, 3)).astype(np.float32)

    with torch.no_grad():
        segm_t, rbox_t, angle_t, feats_t = net(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    out = model.apply(variables, x, train=False)

    def chw(t):
        return np.transpose(t.numpy(), (0, 2, 3, 1))

    for scale in (0, 1):
        np.testing.assert_allclose(
            np.asarray(out["segm"][scale]), chw(segm_t[scale]),
            atol=1e-3, rtol=0, err_msg=f"segm scale {scale}")
        np.testing.assert_allclose(
            np.asarray(out["rbox"][scale]), chw(rbox_t[scale]),
            atol=1e-2, rtol=0, err_msg=f"rbox scale {scale}")  # x128 range
        np.testing.assert_allclose(
            np.asarray(out["angle"][scale]), chw(angle_t[scale]),
            atol=1e-3, rtol=0, err_msg=f"angle scale {scale}")
    np.testing.assert_allclose(
        np.asarray(out["focr"]), chw(feats_t[1]), atol=1e-3, rtol=0,
        err_msg="focr (shared OCR feature)")
    np.testing.assert_allclose(
        np.asarray(out["features"]), chw(feats_t[0]), atol=1e-3, rtol=0,
        err_msg="final 1/4 merged feature")


def test_forward_ocr_parity(pair):
    net, model, variables = pair
    rng = np.random.default_rng(2)
    strips = rng.standard_normal((3, 11, 40, 64)).astype(np.float32)

    with torch.no_grad():
        ref = net.forward_ocr(torch.from_numpy(np.transpose(strips, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 1))  # [N, nclass, W] -> [N, W, nclass]

    ours = np.asarray(model.apply(variables, strips, train=False,
                                  method="recognize"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=0)


def test_loss_parity(pair, monkeypatch):
    """Detection loss on identical (random) predictions and targets."""
    from fots.losses import detection_loss

    net, _, _ = pair
    # reference loss() calls .cuda(); return a non-leaf CPU clone so the
    # in-place += in iou_loss (models.py:218-235) stays autograd-legal
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self.clone())

    rng = np.random.default_rng(3)
    b, h, w = 2, 16, 24
    segm_gt = (rng.uniform(size=(b, h, w)) > 0.7).astype(np.float32)
    mask = (rng.uniform(size=(b, h, w)) > 0.1).astype(np.float32)
    angle_gt = rng.uniform(-0.4, 0.4, (b, h, w)).astype(np.float32)
    geo_gt = rng.uniform(0.0, 20.0, (b, h, w, 4)).astype(np.float32)

    segm_p = [rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32),
              rng.uniform(0, 1, (b, h // 2, w // 2, 1)).astype(np.float32)]
    geo_p = [rng.uniform(0, 25, (b, h, w, 4)).astype(np.float32),
             rng.uniform(0, 25, (b, h // 2, w // 2, 4)).astype(np.float32)]
    ang = rng.uniform(-1, 1, (b, h, w, 2)).astype(np.float32)
    ang2 = rng.uniform(-1, 1, (b, h // 2, w // 2, 2)).astype(np.float32)
    angle_p = [ang / np.linalg.norm(ang, axis=-1, keepdims=True),
               ang2 / np.linalg.norm(ang2, axis=-1, keepdims=True)]

    tt = torch.from_numpy
    ref = net.loss(
        [tt(np.transpose(p, (0, 3, 1, 2))) for p in segm_p],
        tt(segm_gt), tt(mask),
        [tt(np.transpose(p, (0, 3, 1, 2))) for p in angle_p],
        tt(angle_gt),
        [tt(np.transpose(p, (0, 3, 1, 2))) for p in geo_p],
        tt(geo_gt),
    ).item()

    outputs = {"segm": segm_p, "rbox": geo_p, "angle": angle_p}
    ours = detection_loss(outputs, segm_gt, mask, geo_gt, angle_gt,
                          multi_scale=True)
    np.testing.assert_allclose(float(ours["total"]), ref, atol=2e-4, rtol=0)
