"""RoIRotate parity vs the scalar oracle + autodiff sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fots.ops.rroi_align import rroi_align, pooled_width_for, width_bucket
from tests.oracles import rroi_align_oracle


def _random_case(rng, B=2, C=3, H=48, W=64, N=5):
    feats = rng.standard_normal((B, C, H, W)).astype(np.float32)
    rois = []
    for _ in range(N):
        bid = rng.integers(0, B)
        cx = rng.uniform(10, W - 10)
        cy = rng.uniform(10, H - 10)
        h = rng.uniform(6, 16)
        w = rng.uniform(10, 40)
        ang = rng.uniform(-45, 45)
        rois.append([bid, cx, cy, h, w, ang])
    return feats, np.asarray(rois, dtype=np.float32)


def test_matches_scalar_oracle(rng):
    feats_nchw, rois = _random_case(rng)
    ph = 8
    pw = pooled_width_for(rois, ph)
    want = rroi_align_oracle(feats_nchw.astype(np.float64), rois.astype(np.float64), ph, pw, 1.0)
    feats_nhwc = jnp.asarray(feats_nchw.transpose(0, 2, 3, 1))
    got = rroi_align(feats_nhwc, jnp.asarray(rois), ph, pw, 1.0)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-4)


def test_spatial_scale_quarter(rng):
    feats_nchw, rois = _random_case(rng, H=32, W=32)
    # rois in image coords, features at 1/4 (reference ocr_process.py:266)
    rois[:, 1:5] *= 4.0
    ph = 11
    pw = 32
    want = rroi_align_oracle(feats_nchw.astype(np.float64), rois.astype(np.float64), ph, pw, 0.25)
    got = rroi_align(jnp.asarray(feats_nchw.transpose(0, 2, 3, 1)), jnp.asarray(rois), ph, pw, 0.25)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)


def test_invalid_columns_are_zero(rng):
    feats_nchw, rois = _random_case(rng, N=1)
    rois[0, 3] = 10.0  # h
    rois[0, 4] = 20.0  # w -> roi_pw = 8*20/10 = 16
    ph = 8
    got = rroi_align(jnp.asarray(feats_nchw.transpose(0, 2, 3, 1)), jnp.asarray(rois), ph, 64, 1.0)
    np.testing.assert_array_equal(np.asarray(got)[:, :, 17:, :], 0.0)


def test_gradients_flow_and_are_finite(rng):
    feats_nchw, rois = _random_case(rng, B=1, C=2, H=24, W=24, N=2)
    feats = jnp.asarray(feats_nchw.transpose(0, 2, 3, 1))

    def loss(f):
        out = rroi_align(f, jnp.asarray(rois), 8, 16, 1.0)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_jit_cache_static_shapes():
    # two calls with the same static shape must not retrace the program
    feats = jnp.zeros((1, 16, 16, 4))
    r1 = jnp.asarray([[0, 8.0, 8.0, 4.0, 8.0, 0.0]])
    r2 = jnp.asarray([[0, 4.0, 4.0, 4.0, 6.0, 30.0]])
    a = rroi_align(feats, r1, 8, 16, 1.0)
    b = rroi_align(feats, r2, 8, 16, 1.0)
    assert a.shape == b.shape == (1, 8, 16, 4)


def test_width_bucket_monotonic():
    assert width_bucket(1) == 32
    assert width_bucket(33) == 64
    assert width_bucket(4000) == 512
    ws = [width_bucket(i) for i in range(1, 600, 7)]
    assert all(b >= a for a, b in zip(ws, ws[1:]))


def test_rroi_demo_cli(tmp_path):
    """The gradient-visualization demo (reference rroi_align/test2.py
    analog) runs end-to-end: crops + gradient images written, gradient
    mass concentrated on the pooled word regions."""
    import cv2

    from fots.cli.rroi_demo import main

    out = tmp_path / "demo"
    main(["-image",
          "/root/reference/sample_train_data/MLT/icdar-2015-Ch4/Train/img_784.jpg",
          "-out_dir", str(out), "-pooled_height", "8", "-max_rois", "2"])
    assert (out / "crop0.jpg").exists() and (out / "grad_overlay.jpg").exists()
    g = cv2.imread(str(out / "grad.jpg"))
    assert g is not None and g.sum() > 0


def test_pack_neighbors_pallas_interpret():
    """The Pallas streaming pack must equal the XLA pack on every in-map
    row (out-of-map neighbor slots differ by design — zeros vs wraparound
    — and are weight-masked in rroi_align_packed; verified end-to-end by
    the crop comparison)."""
    import jax
    import jax.numpy as jnp

    from fots.ops.rroi_align import (_pack_neighbors_pallas,
                                     _pack_neighbors_xla, rroi_align_packed)

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.random((2, 16, 32, 64), np.float32))
    qx = _pack_neighbors_xla(f)
    qp = _pack_neighbors_pallas(f, interpret=True)
    assert qp.shape == qx.shape
    # full crops must match exactly through the gather (masks hide the
    # wrap-vs-zero difference at map edges)
    rois = jnp.asarray(np.array(
        [[0, 16, 8, 6, 18, 15.0], [1, 30, 14, 5, 10, -30.0],
         [0, 1, 1, 4, 8, 0.0], [1, 31, 15, 5, 9, 40.0]], np.float32))
    a = rroi_align_packed(qx, f.shape, rois, 11, 24, 1.0)
    b = rroi_align_packed(qp, f.shape, rois, 11, 24, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_pallas_vjp_is_exact_adjoint():
    """The Pallas pack's custom VJP must be the exact transpose of the
    zero-fill linear map the kernel computes (the training path
    backprops through RoIRotate): <pack(x), g> == <x, bwd(g)> for random
    cotangents, checked against a NumPy zero-fill pack."""
    from fots.ops.rroi_align import _pack_pallas_diff_bwd

    rng = np.random.default_rng(7)
    b, h, w, c = 2, 6, 8, 4
    n = b * h * w
    x = rng.standard_normal((b, h, w, c)).astype(np.float64)
    flat = x.reshape(n, c)

    # zero-fill forward (the Pallas kernel's semantics)
    quads = np.zeros((n, 4, c))
    for i in range(n):
        quads[i, 0] = flat[i]
        if i + 1 < n:
            quads[i, 1] = flat[i + 1]
        if i + w < n:
            quads[i, 2] = flat[i + w]
        if i + w + 1 < n:
            quads[i, 3] = flat[i + w + 1]

    g = rng.standard_normal((n, 4 * c)).astype(np.float64)
    lhs = float((quads.reshape(n, 4 * c) * g).sum())
    (df,) = _pack_pallas_diff_bwd((b, h, w, c),
                                 np.asarray(g, np.float32))
    rhs = float((x * np.asarray(df)).sum())
    # the jnp bwd runs in f32 (x64 disabled); structure is exact
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
    # and elementwise vs a NumPy transpose
    gq = g.reshape(n, 4, c)
    ref = gq[:, 0].copy()
    ref[1:] += gq[:-1, 1]
    ref[w:] += gq[:-w, 2]
    ref[w + 1:] += gq[:-w - 1, 3]
    np.testing.assert_allclose(np.asarray(df).reshape(n, c), ref,
                               rtol=1e-5, atol=1e-5)
