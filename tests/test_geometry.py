"""Target generation and quad-decode parity vs scalar oracles."""

import numpy as np

from fots.geometry import (
    decode_quads_np,
    generate_rbox,
    quads_to_rrois,
    resize_to_multiple_of_32,
)
from tests.oracles import decode_quads_oracle, generate_rbox_oracle


def _sample_polys():
    polys = np.array(
        [
            # a wide horizontal word
            [[40, 40], [40, 70], [300, 70], [300, 40]],
            # a rotated word
            [[100, 120], [90, 150], [260, 200], [270, 170]],
            # a tiny one (filtered: poly_h < 6)
            [[10, 10], [10, 13], [30, 13], [30, 10]],
            # an ignore-tagged one
            [[350, 300], [350, 340], [460, 340], [460, 300]],
        ],
        dtype=np.float64,
    )
    tags = [False, False, False, True]
    labels = ["HELLO", "WORLD", "ab", "###"]
    return polys, tags, labels


def test_generate_rbox_matches_oracle():
    polys, tags, labels = _sample_polys()
    shape = (512, 512)
    got = generate_rbox(shape, polys, tags, labels)
    want = generate_rbox_oracle(shape, polys, tags, labels)
    for g, w, name in zip(got, want, ["score", "geo", "mask", "gt_idx"]):
        if name in ("score", "geo"):
            np.testing.assert_allclose(g, w, atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(g, w, err_msg=name)
    assert got[5] == want[5]  # labels_out
    assert len(got[4]) == len(want[4])


def test_generate_rbox_multiword_line_masks():
    polys = np.array([[[40, 40], [40, 70], [300, 70], [300, 40]]], dtype=np.float64)
    got = generate_rbox((512, 512), polys, [False], ["TWO WORDS"])
    want = generate_rbox_oracle((512, 512), polys, [False], ["TWO WORDS"])
    np.testing.assert_allclose(got[0], want[0], atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], atol=1e-4)
    np.testing.assert_array_equal(got[2], want[2])


def test_quads_to_rrois_basic():
    quad = np.array([[[0, 0], [0, 10], [40, 10], [40, 0]]], dtype=np.float64)
    r = quads_to_rrois(quad)
    assert r.shape == (1, 6)
    np.testing.assert_allclose(r[0, 1:3], [20, 5])  # center
    np.testing.assert_allclose(r[0, 3], 10)  # h
    np.testing.assert_allclose(r[0, 4], 40)  # w
    np.testing.assert_allclose(r[0, 5], 0, atol=1e-9)  # angle


def test_decode_quads_matches_oracle(rng):
    h, w = 24, 32
    segm = rng.uniform(0, 1, (h, w)).astype(np.float32)
    geo = rng.uniform(0, 20, (h, w, 4)).astype(np.float32)
    theta = rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32)
    angle = np.stack([np.sin(theta), np.cos(theta)], -1)

    quads, scores, probs, xs, ys = decode_quads_np(segm, geo, angle, 0.5)
    want = decode_quads_oracle(segm, geo, angle, 0.5)
    assert len(want) == quads.shape[0]
    for i, (q, s, p, x, y) in enumerate(want):
        np.testing.assert_allclose(quads[i], q, atol=1e-3)
        np.testing.assert_allclose(scores[i], s)
        np.testing.assert_allclose(probs[i], p, rtol=1e-5)
        assert (xs[i], ys[i]) == (x, y)


def test_resize_multiple_of_32(rng):
    im = (rng.uniform(0, 255, (523, 771, 3))).astype(np.uint8)
    scaled, (rh, rw) = resize_to_multiple_of_32(im, scale_up=False)
    assert rh % 32 == 0 and rw % 32 == 0
    assert scaled.shape[:2] == (rh, rw)
    scaled, (rh, rw) = resize_to_multiple_of_32(im, scale_up=True)
    assert rh % 32 == 0 and rw % 32 == 0
    assert rh * rw <= 1585152


def test_generate_rbox2_matches_oracle():
    from fots.geometry import generate_rbox2
    from tests.oracles import generate_rbox2_oracle

    polys, tags, labels = _sample_polys()
    shape = (512, 512)
    got = generate_rbox2(shape, polys, tags, labels)
    want = generate_rbox2_oracle(shape, polys, tags, labels)
    np.testing.assert_allclose(got[0], want[0], atol=1e-4)   # blurred score
    np.testing.assert_allclose(got[1], want[1], atol=1e-4)   # geo
    np.testing.assert_array_equal(got[2], want[2])           # mask
    np.testing.assert_array_equal(got[3], want[3])           # gt_idx
    assert got[5] == want[5]


def test_generate_rbox2_line_case():
    from fots.geometry import generate_rbox2
    from tests.oracles import generate_rbox2_oracle

    polys = np.array([[[40, 40], [40, 80], [400, 80], [400, 40]]], np.float64)
    got = generate_rbox2((512, 512), polys, [False], ["TWO WORDS"])
    want = generate_rbox2_oracle((512, 512), polys, [False], ["TWO WORDS"])
    np.testing.assert_allclose(got[0], want[0], atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], atol=1e-4)
    np.testing.assert_array_equal(got[2], want[2])


def test_rroi_from_box_expand_w():
    """expand_w_frac widens the crop by that fraction of the box height,
    centered (reference eval's w + h/4 margin, tools/eval.py:575,587);
    center, height and angle are untouched."""
    from fots.geometry import rroi_from_box

    box = np.array([100.0, 60.0, 100.0, 40.0, 180.0, 40.0, 180.0, 60.0])
    base, w0, h0 = rroi_from_box(box)
    ex, w1, h1 = rroi_from_box(box, expand_w_frac=0.25)
    assert h1 == h0 and w1 == w0 + 0.25 * h0
    np.testing.assert_allclose(ex[[0, 1, 2, 3, 5]], base[[0, 1, 2, 3, 5]])
    np.testing.assert_allclose(ex[4], base[4] + 0.25 * h0)
