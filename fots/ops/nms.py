"""Locality-aware polygon NMS: vectorized decode + native host merge.

Pipeline (replaces reference nms/__init__.py:get_boxes + adaptor.cpp):

1. score/geometry/angle maps come off the device (they are tiny —
   1/4-scale);
2. :func:`fots.geometry.decode_quads_np` decodes all candidate quads
   vectorized (NumPy) in the reference's row-major scan order with the
   same 1e-4 fixed-point rounding;
3. the inherently sequential locality-aware merge runs in native C++
   (native/nms_core.cpp via ctypes), with a pure-NumPy fallback
   implementing the identical algorithm.

Returns [N, 9] float32 rows: 8 quad coords (image pixels) + merged score,
matching ``get_boxes`` (reference nms/__init__.py:20-29).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from fots.geometry import decode_candidates_np, decode_quads_np

PRECISION = 10000.0
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    so = os.path.join(_NATIVE_DIR, "libfots_nms.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.fots_nms.restype = ctypes.c_int
    lib.fots_nms.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.fots_quad_iou.restype = ctypes.c_double
    lib.fots_quad_iou.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2
    _lib = lib
    return _lib


def quad_iou(qa: np.ndarray, qb: np.ndarray) -> float:
    """Rotated-quad IoU (|I| / |A|+|B|-|I|), native if available."""
    lib = _load_native()
    qa = np.ascontiguousarray(np.asarray(qa, np.float64).reshape(8))
    qb = np.ascontiguousarray(np.asarray(qb, np.float64).reshape(8))
    if lib is not None:
        return float(lib.fots_quad_iou(
            qa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            qb.ctypes.data_as(ctypes.POINTER(ctypes.c_double))))
    return _quad_iou_np(qa.reshape(4, 2), qb.reshape(4, 2))


# ---------------- NumPy fallback (same algorithm) ----------------

def _clip_convex(subject, a, b, orient):
    out = []
    n = len(subject)
    if n == 0:
        return out
    ex, ey = b[0] - a[0], b[1] - a[1]
    for i in range(n):
        cur = subject[i]
        prev = subject[i - 1]
        sc = (ex * (cur[1] - a[1]) - ey * (cur[0] - a[0])) * orient
        sp = (ex * (prev[1] - a[1]) - ey * (prev[0] - a[0])) * orient
        if sc >= 0:
            if sp < 0:
                t = sp / (sp - sc)
                out.append((prev[0] + t * (cur[0] - prev[0]), prev[1] + t * (cur[1] - prev[1])))
            out.append(tuple(cur))
        elif sp >= 0:
            t = sp / (sp - sc)
            out.append((prev[0] + t * (cur[0] - prev[0]), prev[1] + t * (cur[1] - prev[1])))
    return out


def _shoelace(pts):
    if len(pts) < 3:
        return 0.0
    s = 0.0
    for i in range(len(pts)):
        j = (i + 1) % len(pts)
        s += pts[i][0] * pts[j][1] - pts[j][0] * pts[i][1]
    return 0.5 * s


def _quad_iou_np(qa, qb) -> float:
    a = [tuple(p) for p in qa]
    b = [tuple(p) for p in qb]
    area_a, area_b = _shoelace(a), _shoelace(b)
    orient = 1.0 if area_b >= 0 else -1.0
    inter = a
    for i in range(4):
        if not inter:
            break
        inter = _clip_convex(inter, b[i], b[(i + 1) % 4], orient)
    ia = abs(_shoelace(inter))
    uni = abs(area_a) + abs(area_b) - ia
    return ia / max(uni, 1.0)


class _PolyNP:
    __slots__ = ("q", "score", "probs", "x", "y")

    def __init__(self, q, score, probs, x, y):
        self.q = q  # [4,2] int64 fixed point
        self.score = np.float32(score)
        self.probs = probs.astype(np.float32)
        self.x = int(x)
        self.y = int(y)


def _merge_np(target: _PolyNP, incoming: _PolyNP, incoming_first: bool) -> _PolyNP:
    # parity with reference PolyMerger (nms.h:45-110): all float math is
    # f32, and each `data[j] += X * prob` converts the int64 accumulator
    # to f32, adds the f32 product, and truncates back (C implicit
    # conversions) — see native/nms_core.cpp Merger::add
    f32 = np.float32
    seq = (incoming, target) if incoming_first else (target, incoming)
    data = np.zeros(8, np.int64)
    probs = np.zeros(4, f32)
    score = f32(0.0)
    ji = ((0, 0, 0), (1, 0, 3), (2, 1, 0), (3, 1, 1),
          (4, 2, 2), (5, 2, 1), (6, 3, 2), (7, 3, 3))
    for p in seq:
        pq = p.q.astype(f32)
        for j, corner, pk in ji:
            axis = j & 1  # even slots are X, odd are Y
            data[j] = np.int64(f32(data[j]) + pq[corner, axis] * p.probs[pk])
        score = f32(score + p.score)
        probs = probs + p.probs
    q = np.zeros((4, 2), np.int64)
    q[0, 0] = np.int64(f32(data[0]) / probs[0])
    q[0, 1] = np.int64(f32(data[1]) / probs[3])
    q[1, 0] = np.int64(f32(data[2]) / probs[0])
    q[1, 1] = np.int64(f32(data[3]) / probs[1])
    q[2, 0] = np.int64(f32(data[4]) / probs[2])
    q[2, 1] = np.int64(f32(data[5]) / probs[1])
    q[3, 0] = np.int64(f32(data[6]) / probs[2])
    q[3, 1] = np.int64(f32(data[7]) / probs[3])
    return _PolyNP(q, score, probs, 0, 0)


def _nms_np(quads_fp, scores, probs, xs, ys, w, h, th1, th2):
    poly_map = np.full(w * h, -1, np.int64)
    polys = []
    for i in range(len(scores)):
        poly = _PolyNP(quads_fp[i], scores[i], probs[i], xs[i], ys[i])
        merged = False
        if polys:
            if _quad_iou_np(poly.q, polys[-1].q) > th1:
                polys[-1] = _merge_np(polys[-1], poly, False)
                poly_map[poly.y * w + poly.x] = len(polys) - 1
                merged = True
            elif poly.y > 0:
                idx = poly_map[(poly.y - 1) * w + poly.x]
                if idx >= 0:
                    if _quad_iou_np(poly.q, polys[idx].q) > th1:
                        polys[idx] = _merge_np(polys[idx], poly, False)
                        poly_map[poly.y * w + poly.x] = idx
                        merged = True
                    if not merged and poly.x > 0:
                        idx2 = poly_map[(poly.y - 1) * w + poly.x - 1]
                        if idx2 >= 0 and _quad_iou_np(poly.q, polys[idx2].q) > th1:
                            polys[idx2] = _merge_np(polys[idx2], poly, False)
                            poly_map[poly.y * w + poly.x] = idx2
                            merged = True
                    if not merged:
                        off = (poly.y - 1) * w + poly.x + 1
                        if off < poly_map.size:
                            idx3 = poly_map[off]
                            if idx3 >= 0 and _quad_iou_np(poly.q, polys[idx3].q) > th1:
                                polys[idx3] = _merge_np(polys[idx3], poly, False)
                                poly_map[poly.y * w + poly.x] = idx3
                                merged = True
            if not merged:
                polys.append(poly)  # parity: double insert (nms.h:208+211)
        if not merged:
            polys.append(poly)
            poly_map[poly.y * w + poly.x] = len(polys) - 1

    # standard nms
    if not polys:
        return []
    order = sorted(range(len(polys)), key=lambda i: -polys[i].score)
    keep = []
    idx = list(order)
    while idx:
        cur = idx[0]
        keep.append(cur)
        rest = []
        for i in idx[1:]:
            if _quad_iou_np(polys[cur].q, polys[i].q) > th2:
                polys[cur] = _merge_np(polys[cur], polys[i], True)
            else:
                rest.append(i)
        idx = rest
    return [polys[k] for k in keep]


# ---------------- public API ----------------

def locality_aware_nms(quads, scores, probs, xs, ys, map_w, map_h,
                       iou_th1=0.4, iou_th2=0.2, max_out=1024):
    """Merge decoded candidate quads. quads: [N,4,2] float image coords."""
    n = quads.shape[0]
    if n == 0:
        return np.zeros((0, 9), np.float32)
    quads_fp = np.round(np.asarray(quads, np.float64) * PRECISION).astype(np.int64)
    scores = np.ascontiguousarray(scores, np.float32)
    probs = np.ascontiguousarray(probs, np.float32)
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)

    lib = _load_native()
    if lib is not None:
        qin = np.ascontiguousarray(quads_fp.reshape(n, 8))
        out_q = np.zeros((max_out, 8), np.int64)
        out_s = np.zeros((max_out,), np.float32)
        m = lib.fots_nms(
            qin.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n, map_w, map_h, iou_th1, iou_th2,
            out_q.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_out,
        )
        m = min(m, max_out)
        ret = np.zeros((m, 9), np.float32)
        ret[:, :8] = out_q[:m].astype(np.float64) / PRECISION
        ret[:, 8] = out_s[:m]
        return ret

    merged = _nms_np(quads_fp, scores, probs, xs, ys, map_w, map_h, iou_th1, iou_th2)
    ret = np.zeros((len(merged), 9), np.float32)
    for i, p in enumerate(merged):
        ret[i, :8] = (p.q.astype(np.float64) / PRECISION).reshape(8)
        ret[i, 8] = p.score
    return ret


def extract_candidates(segm, geo, angle, k: int, segm_thresh: float = 0.5):
    """Device-side NMS candidate extraction (jittable).

    The reference ships the full score/geo/angle maps to the host and scans
    them pixel-by-pixel (nms/adaptor.cpp:40-69).  Over a slow host link the
    map transfer dominates end-to-end latency, so instead we keep the maps
    on device and extract only the top-``k`` above-threshold pixels with
    their geometry — a ~50x smaller transfer at serving shapes.

    segm [B,Hs,Ws], geo [B,Hs,Ws,4], angle [B,Hs,Ws,2] (sin,cos) ->
    packed [B, 8, k] float32, channels ``(score, d0..d3, sin, cos,
    flat_idx)``.  Channel-FIRST on purpose: k must be the minor (lane)
    dim on TPU — a [B,k,8] layout pads 8 -> 128 lanes and the host link
    ships the padded buffer (16x blowup).  Slots with score <=
    ``segm_thresh`` are masked to score -1 (the host filters them).
    Exact vs the dense path whenever the image has <= k candidate pixels
    (flat_idx < Hs*Ws << 2^24 is exact in f32).
    """
    import jax
    import jax.numpy as jnp

    B, H, W = segm.shape
    k = min(k, H * W)
    flat = segm.reshape(B, H * W)
    masked = jnp.where(flat > segm_thresh, flat, -1.0)
    scores, idx = jax.lax.top_k(masked, k)                      # [B,k]
    g = jnp.take_along_axis(geo.reshape(B, H * W, 4), idx[..., None], axis=1)
    a = jnp.take_along_axis(angle.reshape(B, H * W, 2), idx[..., None], axis=1)
    packed = jnp.concatenate(
        [scores[..., None], g, a, idx[..., None].astype(jnp.float32)],
        axis=-1).astype(jnp.float32)
    return jnp.transpose(packed, (0, 2, 1))                     # [B,8,k]


def unpack_candidates(cands: np.ndarray) -> np.ndarray:
    """Inverse of the engine's u16 candidate transport (see
    ``FOTSInference(cand_transport=...)``): channels 0-6 are float16 bit
    patterns, channel 7 (last axis -1 of the channel dim) the uint16 pixel
    index.  f32 packs pass through unchanged."""
    cands = np.asarray(cands)
    if cands.dtype != np.uint16:
        return cands
    out = np.empty(cands.shape, np.float32)
    out[..., :7, :] = cands[..., :7, :].view(np.float16)
    out[..., 7, :] = cands[..., 7, :]
    return out


def get_boxes_from_candidates(cands, map_h: int, map_w: int,
                              segm_thresh=0.5, iou_th1=0.4, iou_th2=0.2):
    """Host-side decode + merge from one image's packed candidates
    (``extract_candidates`` output slice ``[8, k]``).

    Restores the reference's row-major scan order before the locality-aware
    merge, so results match :func:`get_boxes` exactly when all candidates
    fit in k.
    """
    c = unpack_candidates(np.asarray(cands)).T  # [k, 8] rows
    c = c[c[:, 0] > segm_thresh]
    if c.shape[0] == 0:
        return np.zeros((0, 9), np.float32)
    idx = c[:, 7].astype(np.int64)
    order = np.argsort(idx, kind="stable")  # top_k is score-sorted; re-sort row-major
    c = c[order]
    idx = idx[order]
    ys = idx // map_w
    xs = idx % map_w
    quads, probs = decode_candidates_np(c[:, 1:5], c[:, 5], c[:, 6], xs, ys)
    return locality_aware_nms(quads, c[:, 0], probs, xs, ys, map_w, map_h,
                              iou_th1, iou_th2)


_NMS_POOL = None


def _nms_pool():
    global _NMS_POOL
    if _NMS_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _NMS_POOL = ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 1),
            thread_name_prefix="fots-nms")
    return _NMS_POOL


def get_boxes_from_candidates_batch(cands, map_h: int, map_w: int,
                                    segm_thresh=0.5, iou_th1=0.4,
                                    iou_th2=0.2):
    """Batched :func:`get_boxes_from_candidates` over a [B, 8, k] pack.

    Host NMS was the largest non-overlapped cost in the serving loop
    (~7 ms/image at batch 16): the per-pixel quad decode is GIL-bound
    NumPy and the sequential merge is C.  So: ONE vectorized decode over
    the whole batch, then only the ctypes merge (GIL released for the
    entire C pass) fans out across a thread pool.  Per-image results are
    identical to the scalar helper.
    """
    cands = unpack_candidates(np.asarray(cands))
    B, _, k = cands.shape
    scores = cands[:, 0, :]
    valid = scores > segm_thresh
    counts = valid.sum(axis=1)
    idx = cands[:, 7, :].astype(np.int64)
    # restore the reference's row-major scan order per image (top_k output
    # is score-sorted); invalid slots sort to the end
    order = np.argsort(np.where(valid, idx, np.iinfo(np.int64).max),
                       axis=1, kind="stable")
    # live candidates sorted to the front: gather + decode only the first
    # nmax columns (live density is typically ~1/3 of k; the decode and
    # the [B,k,8] gather were ~40% of batch-NMS wall on a 1-core host)
    nmax = int(counts.max()) if B else 0
    order = order[:, :max(nmax, 1)]
    bi = np.arange(B)[:, None]
    s_sorted = scores[bi, order]
    rows = np.transpose(cands, (0, 2, 1))[bi, order]   # [B, nmax, 8]
    idx_s = rows[..., 7].astype(np.int64)
    ys = idx_s // map_w
    xs = idx_s % map_w
    quads, probs = decode_candidates_np(
        rows[..., 1:5].reshape(-1, 4), rows[..., 5].ravel(),
        rows[..., 6].ravel(), xs.ravel(), ys.ravel())
    quads = quads.reshape(B, -1, 4, 2)
    probs = probs.reshape(B, -1, 4)

    def merge_one(i):
        n = counts[i]
        if n == 0:
            return np.zeros((0, 9), np.float32)
        return locality_aware_nms(quads[i, :n], s_sorted[i, :n],
                                  probs[i, :n], xs[i, :n], ys[i, :n],
                                  map_w, map_h, iou_th1, iou_th2)

    import os

    if B <= 1 or counts.sum() == 0 or (os.cpu_count() or 1) <= 1:
        # single-core hosts (this container): a pool only adds switches
        return [merge_one(i) for i in range(B)]
    return list(_nms_pool().map(merge_one, range(B)))


def get_boxes(segm, geo, angle, segm_thresh=0.5, iou_th1=0.4, iou_th2=0.2):
    """Decode + merge. segm [H,W]; geo [H,W,4]; angle [H,W,2] (sin,cos).

    Drop-in equivalent of reference nms/__init__.py:get_boxes (which takes
    angle CHW and transposes; here everything is HWC already).
    """
    segm = np.asarray(segm)
    quads, scores, probs, xs, ys = decode_quads_np(segm, np.asarray(geo), np.asarray(angle), segm_thresh)
    return locality_aware_nms(quads, scores, probs, xs, ys, segm.shape[1], segm.shape[0],
                              iou_th1, iou_th2)
