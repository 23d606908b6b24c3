"""Fused e2e inference pipeline smoke test (random weights, tiny image)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles / subprocess drives; smoke tier = -m "not slow"

import jax

from fots.models import FOTSDetector
from fots.models.detector import init_detector
from fots.pipeline import FOTSInference, strip_width_for_box


@pytest.fixture(scope="module")
def engine():
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    return FOTSInference(model, variables)


def test_strip_width_rule():
    # h=22 -> scale 0.5; w=100 -> 50+11=61 -> max(2, 61//32)*32 = 64
    # (the reference rule floors at 2*32, ocr_utils.py:150)
    assert strip_width_for_box(100, 22) == 64
    # huge box saturates at the top bucket
    assert strip_width_for_box(5000, 11) == 512
    # degenerate h clamps to scale 11 (reference max(1,h), ocr_utils.py:148)
    assert strip_width_for_box(10, 0) == 96


def test_pipeline_runs_on_random_image(engine, rng):
    im = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    results, im_resized = engine(im)
    assert isinstance(results, list)
    assert im_resized.shape[0] % 32 == 0 and im_resized.shape[1] % 32 == 0
    for r in results:
        assert r["box"].shape == (9,)
        assert isinstance(r["text"], str)


def test_recognize_boxes_bucketing(engine):
    # synthetic boxes with different widths land in different buckets but
    # all decode without error
    boxes = np.array(
        [
            [10, 10, 10, 30, 90, 30, 90, 10, 1.0],
            [10, 40, 10, 60, 300, 60, 300, 40, 1.0],
        ],
        np.float32,
    )
    focr = engine.detect_maps(np.zeros((1, 96, 128, 3), np.float32))[3]
    texts = engine.recognize_boxes(boxes, focr)
    assert len(texts) == 2


def test_pipeline_mixed_precision(rng):
    import jax

    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.pipeline import FOTSInference, cast_params_bf16

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    eng = FOTSInference(model, variables, mixed_precision=True)
    im = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    results, _ = eng(im)
    assert isinstance(results, list)
    # geometry heads stayed f32
    cast = cast_params_bf16(dict(variables))
    import jax.numpy as jnp
    assert cast["params"]["act"]["kernel"].dtype == jnp.float32
    assert cast["params"]["stem"]["conv0a"]["kernel"].dtype == jnp.bfloat16


def test_pipeline_split_words(engine, rng):
    im = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    results, _ = engine(im, split_words=True)
    for r in results:
        assert "words" in r
        for wd in r["words"]:
            assert wd["quad"].shape == (4, 2)


def test_batch_call_serving(engine, rng):
    ims = [(rng.uniform(0, 255, (70, 100, 3))).astype(np.uint8),
           (rng.uniform(0, 255, (120, 80, 3))).astype(np.uint8)]
    results = engine.batch_call(ims, serve_hw=(96, 128))
    assert len(results) == 2
    for i, res in enumerate(results):
        for r in res:
            # random weights can hallucinate boxes anywhere (incl. the
            # letterbox padding); just require finite, rescaled output
            assert np.isfinite(r["box"][:8]).all()
            assert isinstance(r["text"], str)


def test_stream_matches_batch_call(engine, rng):
    """The pipelined stream() must produce exactly batch_call's results."""
    batches = [[(rng.uniform(0, 255, (70, 100, 3))).astype(np.uint8),
                (rng.uniform(0, 255, (120, 80, 3))).astype(np.uint8)]
               for _ in range(3)]
    want = [engine.batch_call(b, serve_hw=(96, 128)) for b in batches]
    got = list(engine.stream(iter(batches), serve_hw=(96, 128)))
    assert len(got) == len(want)
    for gb, wb in zip(got, want):
        assert len(gb) == len(wb)
        for gres, wres in zip(gb, wb):
            assert len(gres) == len(wres)
            for g, w in zip(gres, wres):
                np.testing.assert_allclose(g["box"], w["box"], atol=1e-5)
                assert g["text"] == w["text"]


def test_uint8_serving_matches_f32(engine, rng):
    """Serving ships u8 letterboxed batches; on-device normalization must be
    bit-identical to host-side (x/128-1) f32 normalization."""
    imgs = [rng.integers(0, 255, (50, 60, 3)).astype(np.uint8) for _ in range(2)]
    batch_u8, _scales = engine._letterbox(imgs, (64, 64))
    assert batch_u8.dtype == np.uint8
    c_u8, _ = engine._dispatch_detect(batch_u8)
    c_f32, _ = engine._dispatch_detect(batch_u8.astype(np.float32) / 128.0 - 1.0)
    np.testing.assert_array_equal(np.asarray(c_u8), np.asarray(c_f32))


def test_masked_norm_engine_fine_buckets():
    """masked_norm engine serves on the fine bucket grid and recognizes
    through the masked-IN path."""
    from fots.pipeline import FINE_STRIP_BUCKETS

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    eng = FOTSInference(model, variables, masked_norm=True)
    assert eng.strip_buckets == FINE_STRIP_BUCKETS
    import jax.numpy as jnp

    focr = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((1, 32, 32, 64)).astype(np.float32))
    boxes = np.array([[10, 40, 10, 20, 80, 20, 80, 40, 0.9],
                      [20, 100, 20, 88, 120, 88, 120, 100, 0.8]], np.float32)
    texts = eng.recognize_boxes(boxes, focr)
    assert len(texts) == 2


def test_results_carry_confidence(engine, rng):
    """Every emitted result has the reference's per-box mean CTC confidence
    (eval.py:645-652): mean over character frames of exp(max logp), in
    (0, 1]."""
    im = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    results, _ = engine(im)
    for r in results:
        assert 0.0 < r["conf"] <= 1.0
    # batched serving path carries it too
    batched = engine.batch_call([im], serve_hw=(96, 128))
    for r in batched[0]:
        assert 0.0 < r["conf"] <= 1.0

    # manual check against the decode on a synthetic box: conf must equal
    # mean(exp(max logp)) over non-blank frames of the returned ids
    boxes = np.array([[10, 10, 10, 30, 90, 30, 90, 10, 1.0]], np.float32)
    focr = engine.detect_maps(np.zeros((1, 96, 128, 3), np.float32))[3]
    texts, ids, confs = engine.recognize_boxes(boxes, focr, return_ids=True)
    assert confs.shape == (1,)
    assert 0.0 <= confs[0] <= 1.0
    if (ids[0] > 0).any():
        assert confs[0] > 0.0


def test_yuv420_transport_close_to_u8(rng):
    """yuv420 serving (half the link bytes) must produce candidate packs
    close to the exact u8 path: same chip program downstream, pixels differ
    only by the chroma subsample the source JPEGs already had."""
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    exact = FOTSInference(model, variables)
    yuv = FOTSInference(model, variables, transport="yuv420")
    # smooth-chroma images (like decoded photos — the 4:2:0 sources this
    # transport targets): chroma subsampling is near-lossless there.  A
    # random-noise image is the adversarial worst case (every 2x2 cell a
    # different hue) and is NOT what the transport claims to preserve.
    import cv2

    imgs = []
    for _ in range(2):
        base = rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
        imgs.append(cv2.GaussianBlur(base, (15, 15), 6))
    b_u8, s1 = exact._letterbox(imgs, (64, 64))
    (y, uv), s2 = yuv._letterbox(imgs, (64, 64))
    assert s1 == s2
    assert y.shape == (2, 64, 64) and uv.shape == (2, 32, 32, 2)
    # the YUV roundtrip reconstructs pixels to within a couple of LSB
    import jax.numpy as jnp

    yf = y.astype(np.float32)
    uvf = uv.astype(np.float32) - 128.0
    uvf = np.repeat(np.repeat(uvf, 2, axis=1), 2, axis=2)
    bb = yf + uvf[..., 0] / 0.492
    rr = yf + uvf[..., 1] / 0.877
    gg = (yf - 0.299 * rr - 0.114 * bb) / 0.587
    recon = np.clip(np.stack([bb, gg, rr], -1), 0, 255)
    diff = np.abs(recon - b_u8.astype(np.float32))
    assert np.median(diff) <= 2.0, float(np.median(diff))
    # end-to-end: both transports run the same downstream program
    res_u8 = exact.batch_call(imgs, serve_hw=(64, 64))
    res_yuv = yuv.batch_call(imgs, serve_hw=(64, 64))
    assert len(res_u8) == len(res_yuv) == 2


def test_device_letterbox_matches_cv2(rng):
    """device_letterbox_batch == host cv2 letterbox + u8 normalize, to a
    couple of u8 LSB (cv2 INTER_LINEAR uses fixed-point; device is f32)."""
    import cv2

    from fots.pipeline import device_letterbox_batch

    raw = rng.integers(0, 255, (3, 50, 70, 3)).astype(np.uint8)
    H, W = 64, 96
    got = np.asarray(device_letterbox_batch(raw, (H, W)))
    s = min(H / 50, W / 70)
    nh, nw = int(50 * s), int(70 * s)
    want = np.zeros((3, H, W, 3), np.uint8)
    for i in range(3):
        want[i, :nh, :nw] = cv2.resize(raw[i], (nw, nh))
    wantf = want.astype(np.float32) / 128.0 - 1.0
    # interior match within 2 u8 LSB (2/128); padding exactly -1
    assert np.abs(got - wantf).max() <= 2.01 / 128.0, np.abs(got - wantf).max()
    assert np.all(got[:, nh:, :] == -1.0) and np.all(got[:, :, nw:] == -1.0)


def test_device_letterbox_engine_matches_host(rng):
    """An engine with device_letterbox=True serves the same images through
    the raw-batch program and produces the same result structure (and the
    same scales) as the host-letterbox engine."""
    from fots.pipeline import _RawBatch

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    host = FOTSInference(model, variables)
    dev = FOTSInference(model, variables, device_letterbox=True)
    imgs = [rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
            for _ in range(2)]
    b_host, s_host = host._letterbox(imgs, (64, 64))
    b_dev, s_dev = dev._letterbox(imgs, (64, 64))
    assert isinstance(b_dev, _RawBatch) and not isinstance(b_host, _RawBatch)
    np.testing.assert_allclose(s_host, s_dev)
    res_host = host.batch_call(imgs, serve_hw=(64, 64))
    res_dev = dev.batch_call(imgs, serve_hw=(64, 64))
    assert len(res_host) == len(res_dev) == 2
    # mixed source shapes fall back to the host path
    mixed = imgs + [rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)]
    b_mix, _ = dev._letterbox(mixed, (64, 64))
    assert not isinstance(b_mix, _RawBatch)


def test_max_boxes_cap():
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    eng = FOTSInference(model, variables, max_boxes=2)
    boxes = np.zeros((5, 9), np.float32)
    boxes[:, 8] = [0.1, 0.9, 0.5, 0.7, 0.3]
    capped = eng._cap_boxes([boxes])[0]
    assert capped.shape[0] == 2
    # keeps the two highest scores, in original order
    np.testing.assert_allclose(capped[:, 8], [0.9, 0.7])


def test_beam_engine_decodes(rng):
    """FOTSInference(beam=N) decodes through the device-pruned top-k host
    beam search; output types/shapes match the greedy path."""
    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0))
    eng = FOTSInference(model, variables, beam=4)
    boxes = np.array([[10, 10, 10, 30, 90, 30, 90, 10, 1.0]], np.float32)
    focr = eng.detect_maps(np.zeros((1, 96, 128, 3), np.float32))[3]
    texts, ids, confs = eng.recognize_boxes(boxes, focr, return_ids=True)
    assert len(texts) == 1 and isinstance(texts[0], str)
    assert confs.shape == (1,)


def test_put_rois_pads_to_pow2_grid(engine):
    """Roi counts are a compiled-program shape: live counts must collapse
    onto a small grid (next pow2, min 8) or every distinct count compiles
    a fresh recognition program on a real serving stream."""
    for n, want in [(1, 8), (8, 8), (9, 16), (16, 16), (17, 32), (100, 128)]:
        rois = np.tile(np.asarray(engine._DUMMY_ROI, np.float32), (n, 1))
        out = np.asarray(engine._put_rois(rois))
        assert out.shape == (want, 6), (n, out.shape)
        np.testing.assert_array_equal(out[:n], rois)
