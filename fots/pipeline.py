"""Fused end-to-end inference: detect -> decode+NMS -> bucketed recognize.

TPU re-design of the reference inference path (test.py:74-127 +
tools/ocr_utils.py:131-199).  The reference launches one RRoIAlign + one
forward_ocr per detected box from a Python loop; here all boxes are
bucketed by strip width and processed in a handful of compiled programs:

  image -> [jit] detector forward (NHWC, static shape)
        -> tiny score/geo/angle maps to host -> vectorized decode +
           native locality-aware NMS (fots/ops/nms.py)
        -> rrois bucketed by /32-rounded strip width
        -> [jit per bucket] rroi_align(focr) + recognition head + argmax
        -> host CTC-collapse decode to text.

The shared OCR feature (focr) never leaves the device.  Compiled program
count is bounded by len(width buckets) + number of distinct input image
shapes (use fixed input sizing for throughput serving).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fots.codec import LabelCodec
from fots.geometry import (TARGET_H, resize_to_multiple_of_32, rroi_from_box,
                           strip_width_for_box as _strip_width_for_box)
from fots.models import FOTSDetector
from fots.ops.nms import extract_candidates, get_boxes_from_candidates_batch
from fots.ops.rroi_align import pack_neighbors, rroi_align, rroi_align_packed

# Strip-width buckets for serving.  MUST match the training bucket grid
# (fots/roirotate.py TRAIN_STRIP_BUCKETS): the recognition head's
# InstanceNorms compute statistics over the whole padded strip, so a roi
# recognized at a different bucket width than it was trained in sees
# shifted feature statistics — measured on an overfit checkpoint, serving
# the 256-trained model at bucket 64 degraded 'CALVIN' to 'ALVIN'/'ALV'
# while 256 read every word exactly.  (The reference has the same skew
# between its batch-dynamic training widths, ocr_process.py:260-263, and
# its exact per-box inference widths — it just never decodes both ways.)
STRIP_BUCKETS = (256, 512)
# Fine grid used when the model was TRAINED with masked InstanceNorm
# (Trainer(masked_norm=True)): strip features are then bucket-width-
# invariant by construction, so short words can use narrow buckets —
# up to 8x less recognition compute than the coarse train-matched grid.
FINE_STRIP_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)

# parameter subtrees kept in f32 under mixed precision: geometry/score
# heads need sub-pixel precision and the vocab logits a stable softmax
_KEEP_F32 = ("act", "rbox", "angle", "conv_attention")


class _RawBatch(NamedTuple):
    """Marker for a device-letterbox batch: raw same-shape u8 images; the
    resize+pad to ``serve_hw`` happens inside the detection program."""

    images: np.ndarray
    serve_hw: Tuple[int, int]


class PackedFocr(NamedTuple):
    """Shared OCR features pre-packed for RoIRotate gathers.

    The detection program emits the focr map already packed by
    :func:`fots.ops.rroi_align.pack_neighbors` (``quads`` [B*H*W, 4C]),
    so every strip-width bucket's recognition program does one sparse
    take instead of rebuilding the dense packed map — the round-4
    profile showed that per-bucket rebuild (~4x the focr bytes, per
    bucket, per batch) dominating recognition device time.  ``shape`` is
    the original (B, H, W, C), a static arg of the crop programs.
    """

    quads: object  # jax device array [B*H*W, 4C]
    shape: Tuple[int, int, int, int]


def device_letterbox_batch(raw, serve_hw):
    """Letterbox a raw u8 batch [B,h,w,3] to normalized f32 [B,H,W,3] on
    device: x/128-1, half-pixel bilinear resize (the cv2 INTER_LINEAR
    convention; two 2-tap row gathers — NOT a dense matmul, whose
    contraction over 700+ source rows would cost teraflops), pad with the
    background value -1.  Jit-traceable, static shapes."""
    h0, w0 = raw.shape[1:3]
    H, W = serve_hw
    s = min(H / h0, W / w0)
    nh, nw = int(h0 * s), int(w0 * s)

    def taps(src, dst):
        pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        lo = np.clip(np.floor(pos), 0, src - 1).astype(np.int32)
        hi = np.minimum(lo + 1, src - 1).astype(np.int32)
        fr = np.clip(pos - lo, 0.0, 1.0).astype(np.float32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(fr)

    ylo, yhi, yfr = taps(h0, nh)
    xlo, xhi, xfr = taps(w0, nw)
    x = raw.astype(jnp.float32)
    x = (x[:, ylo] * (1.0 - yfr)[None, :, None, None]
         + x[:, yhi] * yfr[None, :, None, None])
    x = (x[:, :, xlo] * (1.0 - xfr)[None, None, :, None]
         + x[:, :, xhi] * xfr[None, None, :, None])
    x = x / 128.0 - 1.0
    return jnp.pad(x, ((0, 0), (0, H - nh), (0, W - nw), (0, 0)),
                   constant_values=-1.0)


def cast_params_bf16(variables: Dict, keep_f32=_KEEP_F32) -> Dict:
    """Cast backbone/recognizer params to bfloat16 for inference.

    Convs with bf16 kernels compute in bf16 on the MXU (double throughput,
    half HBM traffic); subtrees named in ``keep_f32`` stay float32 so the
    geometry heads keep sub-pixel precision (their convs then compute in
    f32 via dtype promotion).  InstanceNorm statistics are always computed
    in f32 internally regardless of input dtype.
    """
    import jax.numpy as jnp

    def cast_tree(tree, path):
        if isinstance(tree, dict):
            return {k: (tree[k] if k in keep_f32 else cast_tree(tree[k], path + (k,)))
                    for k in tree}
        return tree.astype(jnp.bfloat16) if tree.dtype == jnp.float32 else tree

    out = dict(variables)
    out["params"] = cast_tree(variables["params"], ())
    return out


def strip_width_for_box(w: float, h: float, target_h: int = TARGET_H,
                        buckets=FINE_STRIP_BUCKETS) -> int:
    """Reference width rule; canonical implementation in fots.geometry
    (host-only module), re-exported here with the serving default grid."""
    return _strip_width_for_box(w, h, target_h, buckets)


def valid_frames(roi: np.ndarray, width: int, target_h: int = TARGET_H) -> int:
    """Number of recognition frames actually covered by the roi.

    rroi_align leaves pooled columns beyond ``pooled_h * w / h`` zero
    (reference kernel.cu:68,107) and the head is width-preserving, so
    frames past ceil(target_h * aspect) carry no trained signal."""
    aspect = roi[4] / max(float(roi[3]), 1e-6)
    return int(min(width, math.ceil(target_h * aspect)))


class FOTSInference:
    """Stateful wrapper owning compiled programs + device-resident params."""

    #: per-frame symbol fanout shipped to the host beam search (matches
    #: prefix_beam_search's default top_k_per_frame pruning)
    BEAM_TOPK = 16

    def __init__(self, model: FOTSDetector, variables, codec: Optional[LabelCodec] = None,
                 segm_thresh: float = 0.5, iou_th1: float = 0.4, iou_th2: float = 0.2,
                 mixed_precision: bool = False, max_candidates: int = 8192,
                 mesh=None, expand_w_frac: float = 0.0,
                 masked_norm: bool = False, beam: int = 0,
                 transport: str = "u8", max_boxes: Optional[int] = None,
                 device_letterbox: bool = False, cand_transport: str = "u16"):
        self.model = model
        # device_letterbox: resize + pad INSIDE the detection program
        # (gather-based half-pixel bilinear, cv2 INTER_LINEAR convention)
        # instead of cv2 on the host.  On a 1-core host the cv2 letterbox
        # of a 16-image batch costs ~55 ms — the single largest host stage
        # of the serving loop — while the device resize adds ~1 ms of HBM
        # traffic.  Requires every image in a batch to share one source
        # shape (one compiled program per (src_hw, serve_hw)); mixed-shape
        # batches fall back to the host path.  u8 transport only.
        self.device_letterbox = device_letterbox and transport == "u8"
        self._lb_cache = {}
        # transport: how batched serving ships pixels over the host link.
        #   "u8"     — letterboxed uint8 BGR, normalized on device (exact);
        #   "yuv420" — Y full-res + chroma at 1/2 res (1.5 B/px vs 3),
        #              reconstructed to BGR on device.  Halves host-link
        #              bytes; the source JPEGs are 4:2:0-subsampled already,
        #              so serving fidelity matches the decoded file's chroma
        #              content (detector maps differ by ~1 u8 LSB).  Worth
        #              2x e2e throughput when the link, not the chip, is the
        #              bottleneck (see docs/PERFORMANCE.md "link floor").
        if transport not in ("u8", "yuv420"):
            raise ValueError(f"unknown transport {transport!r}")
        self.transport = transport
        # cand_transport: how the NMS candidate pack crosses the host link.
        #   "u16" (default) — the 7 value channels (score, 4 distances,
        #     sin, cos) travel as float16 bit patterns and the pixel index
        #     as uint16: 16 B/candidate instead of 32.  Candidate d2h is a
        #     first-order serving cost (the pack is ~1 MB/batch16 at the
        #     2048-candidate cap); f16 moves decoded quad corners by
        #     <0.1 px (distances <=128 px, f16 rel. eps 5e-4) — measured
        #     heldout hmean delta: none (docs/PERFORMANCE.md).  Falls back
        #     to f32 automatically when the 1/4-scale map has >= 2^16
        #     pixels (the index would overflow; serve_hw above ~1024x1024).
        #   "f32" — exact values, bit-identical to the dense-map path.
        if cand_transport not in ("u16", "f32"):
            raise ValueError(f"unknown cand_transport {cand_transport!r}")
        self.cand_transport = cand_transport
        # max_boxes: optional per-image cap on detections entering
        # recognition (top-k by merged NMS score).  The reference has no
        # cap; production serving uses one to bound tail latency on noisy
        # frames.  None = reference parity (recognize everything).
        self.max_boxes = max_boxes
        # beam > 0: decode recognition with prefix beam search of that
        # width (host side, over device-pruned top-k log-probs) instead of
        # greedy argmax.  Applies to the per-image path (__call__ /
        # recognize_boxes) used by eval; the batched stream keeps greedy.
        self.beam = int(beam)
        # masked_norm: the checkpoint was trained with bucket-width-
        # invariant masked InstanceNorm (Trainer(masked_norm=True)); serve
        # with the same masking and the fine bucket grid
        self.masked_norm = masked_norm
        self.strip_buckets = FINE_STRIP_BUCKETS if masked_norm else STRIP_BUCKETS
        # optional crop-width margin (fraction of box height), the
        # reference accuracy harness' w + h/4 rule (tools/eval.py:575,587).
        # Default 0 = align_ocr parity; measured on an overfit checkpoint
        # the margin slightly hurt ('BREAD' -> 'BRETDR') because training
        # crops are exact-box (ocr_process.py:196-221)
        self.expand_w_frac = expand_w_frac
        if mixed_precision:
            variables = cast_params_bf16(dict(variables))
        # multi-chip serving: params replicated (vocab head optionally
        # tensor-sharded) on the mesh; image/roi batches shard over 'data'
        # — XLA splits the forward across chips and inserts the collectives
        # (the serving-side analog of the training mesh, SURVEY.md §2.3)
        self.mesh = mesh
        self._data_parallel = 1
        if mesh is not None:
            from fots.parallel import batch_sharding, shard_init
            from fots.parallel.mesh import DATA_AXIS

            variables = shard_init(dict(variables), mesh)
            self._batch_sharding = batch_sharding(mesh)
            self._data_parallel = mesh.shape[DATA_AXIS]
        self.variables = variables
        self.mixed_precision = mixed_precision
        self.codec = codec or LabelCodec()
        self.segm_thresh = segm_thresh
        self.iou_th1 = iou_th1
        self.iou_th2 = iou_th2
        # NMS candidates extracted on device per image; exact vs the dense
        # path while the count of score>thresh pixels stays under this cap
        self.max_candidates = max_candidates

        def _norm(images):
            """Normalize on device: serving ships uint8 (4x less traffic
            over the host link than pre-normalized f32); f32 inputs are
            assumed already (x/128-1)."""
            ct = jnp.bfloat16 if mixed_precision else jnp.float32
            if images.dtype == jnp.uint8:
                return images.astype(ct) / 128.0 - 1.0
            return images.astype(ct)

        @jax.jit
        def _forward(variables, images):
            images = _norm(images)
            out = model.apply(variables, images, train=False)
            # pack all head maps channel-FIRST into one tensor: the last
            # (lane) dim must be the wide W axis — a [B,H,W,4] layout pads
            # 4 -> 128 lanes on TPU and device->host transfers ship the
            # padded buffer (32x blowup over slow links)
            maps = jnp.concatenate(
                [out["segm"][0], out["rbox"][0], out["angle"][0]], axis=-1)
            maps = jnp.transpose(maps, (0, 3, 1, 2)).astype(jnp.float32)
            return maps, out["focr"]

        def _detect_body(variables, images_f):
            out = model.apply(variables, images_f, train=False)
            cands = extract_candidates(
                out["segm"][0][..., 0].astype(jnp.float32),
                out["rbox"][0].astype(jnp.float32),
                out["angle"][0].astype(jnp.float32),
                self.max_candidates, segm_thresh)
            hs, ws = images_f.shape[1] // 4, images_f.shape[2] // 4
            if self.cand_transport == "u16" and hs * ws < 65536:
                vals = jax.lax.bitcast_convert_type(
                    cands[:, :7, :].astype(jnp.float16), jnp.uint16)
                idx = cands[:, 7, :].astype(jnp.uint16)
                cands = jnp.concatenate([vals, idx[:, None, :]], axis=1)
            # pack focr for the recognition gathers HERE, once per batch
            # (see PackedFocr); callers wrap the raw quads in a PackedFocr.
            # Under a mesh the XLA pack is used — the Pallas streaming
            # kernel is single-device (sharded operands would need a
            # shard_map wrapper it doesn't have)
            return cands, pack_neighbors(out["focr"],
                                         prefer_pallas=self.mesh is None)

        @jax.jit
        def _forward_sparse(variables, images):
            """Forward + on-device NMS candidate extraction: ships only the
            top-k above-threshold pixels (fots/ops/nms.py:extract_candidates)
            instead of full head maps — the host link is the e2e bottleneck."""
            return _detect_body(variables, _norm(images))

        self._detect_body = _detect_body

        @jax.jit
        def _forward_sparse_yuv(variables, y, uv):
            """yuv420 transport: reconstruct BGR on device from Y [B,H,W]
            u8 + chroma [B,H/2,W/2,2] u8 (cv2 COLOR_BGR2YUV convention:
            U = 0.492(B-Y)+128, V = 0.877(R-Y)+128), then normalize.
            Chroma is upsampled nearest — the 4:2:0 source JPEGs carry no
            finer chroma to recover."""
            ct = jnp.bfloat16 if mixed_precision else jnp.float32
            yf = y.astype(jnp.float32)
            uvf = uv.astype(jnp.float32) - 128.0
            # nearest 2x chroma upsample
            uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=1), 2, axis=2)
            uvf = uvf[:, : yf.shape[1], : yf.shape[2]]
            u, v = uvf[..., 0], uvf[..., 1]
            b = yf + u / 0.492
            r = yf + v / 0.877
            g = (yf - 0.299 * r - 0.114 * b) / 0.587
            bgr = jnp.stack([b, g, r], axis=-1)
            images_f = (jnp.clip(bgr, 0.0, 255.0) / 128.0 - 1.0).astype(ct)
            return _detect_body(variables, images_f)

        # first id that counts as a real character for the confidence mean:
        # the reference computes conf over frames with ``labels > 3`` under
        # its 4-offset codec (tools/eval.py:646); for a blank-at-0 codec the
        # analogous rule is id > 0 (any non-blank frame)
        self._char_id_start = getattr(self.codec, "reserved_ids", 1)

        def _box_conf(ids, logp_max, char_start: int):
            """Per-box mean CTC confidence, the reference's
            ``np.mean(np.exp(ctc_f.max(2)[labels > 3]))``
            (tools/eval.py:645-652), computed on device: mean of
            exp(max logp) over character frames (0.0 when no char frame —
            the reference would produce NaN there, but such boxes decode to
            the empty string and are dropped before gating anyway)."""
            mask = (ids >= char_start).astype(jnp.float32)
            num = jnp.sum(jnp.exp(logp_max.astype(jnp.float32)) * mask, axis=-1)
            return num / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)

        def _crop_strips(feat, rois, width: int, fshape):
            """RoIRotate from either a raw focr map (``fshape`` None) or a
            pre-packed quads array + its static source shape."""
            if fshape is None:
                return rroi_align(feat, rois, TARGET_H, width, 0.25)
            return rroi_align_packed(feat, fshape, rois, TARGET_H, width,
                                     0.25)

        def _ids_small(ids):
            """ids travel as u8 when the vocab fits — the id pack is a
            per-chunk d2h and the host link charges per byte."""
            if model.nclass <= 255:
                return ids.astype(jnp.uint8)
            return ids.astype(jnp.int32)

        @functools.partial(jax.jit, static_argnames=("width", "fshape"))
        def _recognize(variables, feat, rois, width: int, fshape=None):
            strips = _crop_strips(feat, rois, width, fshape)
            valid_w = None
            if masked_norm:
                aspect = rois[:, 4] / jnp.maximum(rois[:, 3], 1e-6)
                valid_w = jnp.clip(jnp.ceil(TARGET_H * aspect),
                                   1, width).astype(jnp.int32)
            logp = model.apply(variables, strips, train=False,
                               method=FOTSDetector.recognize, valid_w=valid_w)
            ids = jnp.argmax(logp, axis=-1)
            conf = _box_conf(ids, jnp.max(logp, axis=-1), self._char_id_start)
            return _ids_small(ids), conf

        @functools.partial(jax.jit, static_argnames=("width", "fshape"))
        def _recognize_topk(variables, feat, rois, width: int, fshape=None):
            """Beam-decode variant: also ship each frame's top-k symbol
            log-probs + the blank log-prob (tens of floats/frame instead of
            the full nclass row) for the host prefix beam search."""
            strips = _crop_strips(feat, rois, width, fshape)
            valid_w = None
            if masked_norm:
                aspect = rois[:, 4] / jnp.maximum(rois[:, 3], 1e-6)
                valid_w = jnp.clip(jnp.ceil(TARGET_H * aspect),
                                   1, width).astype(jnp.int32)
            logp = model.apply(variables, strips, train=False,
                               method=FOTSDetector.recognize, valid_w=valid_w)
            ids = jnp.argmax(logp, axis=-1)
            conf = _box_conf(ids, jnp.max(logp, axis=-1), self._char_id_start)
            k = min(self.BEAM_TOPK, logp.shape[-1])
            top_lp, top_ids = jax.lax.top_k(logp.astype(jnp.float32), k)
            blank_lp = logp[..., 0].astype(jnp.float32)
            return ids, conf, top_lp, top_ids, blank_lp

        @functools.partial(jax.jit, static_argnames=("width",))
        def _recognize_from_image(variables, images, rois, width: int):
            # reference ocr_image path (tools/ocr_utils.py:64-128): crop the
            # raw image at target height 40, run the stem, then the CTC head
            crops = rroi_align(images, rois, 4 * TARGET_H - 4, width, 1.0)
            if mixed_precision:
                crops = crops.astype(jnp.bfloat16)
            feats = model.apply(variables, crops,
                                method=FOTSDetector.forward_features)
            logp = model.apply(variables, feats, train=False,
                               method=FOTSDetector.recognize)
            ids = jnp.argmax(logp, axis=-1)
            conf = _box_conf(ids, jnp.max(logp, axis=-1), self._char_id_start)
            return ids, conf

        self._forward = _forward
        self._forward_sparse = _forward_sparse
        self._forward_sparse_yuv = _forward_sparse_yuv
        self._recognize = _recognize
        self._recognize_topk = _recognize_topk
        self._recognize_from_image = _recognize_from_image

    # -------- mesh helpers --------

    _DUMMY_ROI = (0.0, 8.0, 8.0, 8.0, 8.0, 0.0)

    def _pad_to_shards(self, n: int) -> int:
        d = self._data_parallel
        return -(-n // d) * d

    def _put_batch(self, arr):
        arr = jnp.asarray(arr)
        if self.mesh is not None:
            return jax.device_put(arr, self._batch_sharding)
        return arr

    def _put_rois(self, rois_np: np.ndarray):
        """Device-put rois sharded over 'data', padding the count to the
        next power of two (min 8) and to a multiple of the data-axis size.

        The roi count is a *shape* of the compiled recognition program, so
        live box counts — different on every real image — would otherwise
        compile a fresh program per distinct count (~tens of seconds each
        over the remote link).  A power-of-two grid caps the program count
        at log2(max rois) per strip bucket, for at most 2x padded compute
        (padded slots get a harmless dummy roi; callers slice outputs back
        to the true count)."""
        n = rois_np.shape[0]
        m = max(8, 1 << (max(n, 1) - 1).bit_length())
        m = self._pad_to_shards(max(m, n))
        if m != n:
            pad = np.tile(np.asarray(self._DUMMY_ROI, np.float32), (m - n, 1))
            rois_np = np.concatenate([rois_np, pad], axis=0)
        return self._put_batch(rois_np)

    #: target strip columns (rois x bucket width) per recognition program
    #: invocation — sets the fixed per-width roi chunk size
    CHUNK_FRAME_BUDGET = 2048

    def _roi_chunk(self, width: int) -> int:
        """Fixed roi count per recognition program at this strip width.

        Each width bucket compiles exactly ONE program shape; bucket loads
        are served by repeated invocations with the final chunk padded by
        dummy rois.  vs the earlier power-of-two roi-count grid this cuts
        both worst-case padding waste (<= chunk-1 dummy rois per bucket,
        instead of up to 2x the whole load) and compiled-program count
        (1 per width instead of log2(max rois) per width).  The frame
        budget keeps per-invocation compute roughly even across widths —
        wide rois are rarer but each costs proportionally more.
        """
        c = max(1, self.CHUNK_FRAME_BUDGET // max(width, 1))
        c = 1 << (c.bit_length() - 1)  # round down to a power of two
        return self._pad_to_shards(max(4, min(64, c)))

    def _roi_chunks(self, rois_np: np.ndarray, idxs, width: int):
        """Yield (idx_chunk, device_rois) pieces of one width bucket's
        rois, each padded to the fixed per-width chunk size."""
        csize = self._roi_chunk(width)
        idxs = list(idxs)
        for start in range(0, len(idxs), csize):
            chunk = idxs[start:start + csize]
            sel = rois_np[np.asarray(chunk)]
            if len(chunk) < csize:
                pad = np.tile(np.asarray(self._DUMMY_ROI, np.float32),
                              (csize - len(chunk), 1))
                sel = np.concatenate([sel, pad], axis=0)
            yield chunk, self._put_batch(sel)

    # -------- detection --------

    def detect_maps(self, images_norm: np.ndarray):
        """Run the detector; images_norm: [B,H,W,3] already (x/128-1).

        Returns (segm [B,Hs,Ws], rbox [B,Hs,Ws,4], angle [B,Hs,Ws,2], focr)
        with the maps as host numpy (one packed transfer) and focr left on
        device.
        """
        maps_dev, focr = self._forward(self.variables, jnp.asarray(images_norm))
        maps = np.asarray(maps_dev)  # [B, 7, Hs, Ws] — single d2h transfer
        segm = maps[:, 0]
        rbox = np.moveaxis(maps[:, 1:5], 1, -1)
        angle = np.moveaxis(maps[:, 5:7], 1, -1)
        return segm, rbox, angle, focr

    def detect_boxes_batch(self, batch):
        """Sparse detection path: device top-k candidate extraction, then
        per-image host NMS.  ``batch``: [B,H,W,3] images (u8/f32) or the
        (Y, UV) pair from a yuv420 letterbox.  Returns (boxes, focr)."""
        if isinstance(batch, _RawBatch):
            n = batch.images.shape[0]
            hs, ws = batch.serve_hw[0] // 4, batch.serve_hw[1] // 4
        else:
            lead = batch[0] if isinstance(batch, tuple) else batch
            n = lead.shape[0]
            hs, ws = lead.shape[1] // 4, lead.shape[2] // 4
        cands_dev, focr = self._dispatch_detect(batch)
        cands = np.asarray(cands_dev)  # [B, 8, k] — the only map-side transfer
        boxes = get_boxes_from_candidates_batch(
            cands[:n], hs, ws, self.segm_thresh, self.iou_th1, self.iou_th2)
        return self._cap_boxes(boxes), focr

    def _cap_boxes(self, per_image_boxes):
        """Optional top-``max_boxes``-by-score cap per image (see __init__);
        original NMS order is preserved among the kept boxes."""
        if self.max_boxes is None:
            return per_image_boxes
        out = []
        for b in per_image_boxes:
            if b.shape[0] > self.max_boxes:
                keep = np.argsort(-b[:, 8], kind="stable")[: self.max_boxes]
                b = b[np.sort(keep)]
            out.append(b)
        return out

    def detect(self, image_bgr: np.ndarray, scale_up: bool = False):
        """Detect text boxes in one raw BGR image.  Returns (boxes [N,9] in
        resized-image pixels, focr device array, resized shape)."""
        im_resized, _ = resize_to_multiple_of_32(image_bgr, scale_up=scale_up)
        # ship u8; the compiled forward normalizes on device (see _norm)
        boxes, focr = self.detect_boxes_batch(
            np.ascontiguousarray(im_resized[None]))
        return boxes[0], focr, im_resized

    # -------- recognition over detected boxes --------

    def recognize_boxes(self, boxes: np.ndarray, focr=None, batch_index: int = 0,
                        images_norm=None, return_ids: bool = False):
        """Batched RoIRotate + CTC head over all boxes, bucketed by width.

        Uses the shared 1/4-scale features (align_ocr path) when ``focr``
        is given, or crops the raw normalized image (ocr_image path,
        reference tools/ocr_utils.py:64-128) when ``images_norm`` is given.
        """
        n = boxes.shape[0]
        if n == 0:
            return ([], [], []) if return_ids else []
        buckets: Dict[int, List[int]] = {}
        rois = np.zeros((n, 6), np.float32)
        for i in range(n):
            roi, w, h = rroi_from_box(boxes[i], batch_index,
                                      expand_w_frac=self.expand_w_frac)
            rois[i] = roi
            buckets.setdefault(
                strip_width_for_box(w, h, buckets=self.strip_buckets), []
            ).append(i)

        texts = [""] * n
        ids_out: List[Optional[np.ndarray]] = [None] * n
        confs = np.zeros((n,), np.float32)
        feat, fshape = self._feat_args(focr)
        for width, idxs in sorted(buckets.items()):
            if images_norm is not None:
                # raw-image path: per-batch roi pad (pow2 grid) — the crop
                # reads the image, not the shared packed focr
                sel = self._put_rois(rois[np.asarray(idxs)])
                ids, conf = self._recognize_from_image(
                    self.variables, jnp.asarray(images_norm), sel, width * 4)
                pieces = [(idxs, ids, conf, None)]
            else:
                pieces = []
                for chunk, sel in self._roi_chunks(rois, idxs, width):
                    if self.beam > 0:
                        ids, conf, top_lp, top_ids, blank_lp = \
                            self._recognize_topk(self.variables, feat, sel,
                                                 width, fshape)
                        beams = (np.asarray(top_lp), np.asarray(top_ids),
                                 np.asarray(blank_lp))
                    else:
                        ids, conf = self._recognize(self.variables, feat,
                                                    sel, width, fshape)
                        beams = None
                    pieces.append((chunk, ids, conf, beams))
            for idx_chunk, ids, conf, beams in pieces:
                ids = np.asarray(ids)[: len(idx_chunk)]
                conf = np.asarray(conf)[: len(idx_chunk)]
                decoded = self.codec.decode_batch(ids)
                if beams is not None:
                    from fots.ops.ctc_decode import prefix_beam_search_topk

                    top_lp, top_ids, blank_lp = beams
                    for j in range(len(idx_chunk)):
                        hyp = prefix_beam_search_topk(
                            top_ids[j], top_lp[j], blank_lp[j],
                            beam_width=self.beam)
                        if hyp:
                            decoded[j] = self.codec.decode_ids(hyp[0][0],
                                                               raw=True)
                for j, i in enumerate(idx_chunk):
                    texts[i] = decoded[j]
                    ids_out[i] = ids[j]
                    confs[i] = conf[j]
        return (texts, ids_out, confs) if return_ids else texts

    # -------- batched serving --------

    def _raw_letterbox_program(self, src_hw, serve_hw):
        """Compiled detect program that letterboxes ON DEVICE: u8 source
        batch -> normalize -> half-pixel bilinear resize (two 2-tap row
        gathers, the cv2 INTER_LINEAR convention) -> pad with the
        background value (-1 == u8 zero normalized) -> detector + candidate
        extraction.  One program per (source shape, serve shape)."""
        key = (tuple(src_hw), tuple(serve_hw))
        if key not in self._lb_cache:
            import jax

            detect_body = self._detect_body
            ct = jnp.bfloat16 if self.mixed_precision else jnp.float32
            hw = tuple(serve_hw)

            @jax.jit
            def run(variables, raw):
                x = device_letterbox_batch(raw, hw)
                return detect_body(variables, x.astype(ct))

            self._lb_cache[key] = run
        return self._lb_cache[key]

    def _letterbox(self, images_bgr, serve_hw):
        """Letterbox to the fixed serving shape, staying uint8: the batch
        ships to the device raw (1 byte/px) and is normalized on device
        (see ``_norm``) — 4x less host-link traffic than f32.  With
        ``transport='yuv420'`` the batch is a (Y, UV_half) pair instead —
        1.5 bytes/px, reconstructed to BGR on device.  With
        ``device_letterbox`` (uniform source shapes) the host only stacks
        the raw images; resize+pad run inside the detection program."""
        import cv2

        H, W = serve_hw
        n = len(images_bgr)
        scales = []
        if (self.device_letterbox
                and len({im.shape for im in images_bgr}) == 1):
            h0, w0 = images_bgr[0].shape[:2]
            s = min(H / h0, W / w0)
            return _RawBatch(np.stack(images_bgr), (H, W)), [s] * n
        if self.transport == "yuv420":
            ybuf = np.zeros((n, H, W), np.uint8)
            uvbuf = np.full((n, H // 2, W // 2, 2), 128, np.uint8)
            for i, im in enumerate(images_bgr):
                s = min(H / im.shape[0], W / im.shape[1])
                nh, nw = int(im.shape[0] * s), int(im.shape[1] * s)
                yuv = cv2.cvtColor(cv2.resize(im, (nw, nh)), cv2.COLOR_BGR2YUV)
                ybuf[i, :nh, :nw] = yuv[..., 0]
                uvbuf[i, : (nh + 1) // 2, : (nw + 1) // 2] = cv2.resize(
                    yuv[..., 1:], ((nw + 1) // 2, (nh + 1) // 2),
                    interpolation=cv2.INTER_AREA)
                scales.append(s)
            return (ybuf, uvbuf), scales
        batch = np.zeros((n, H, W, 3), np.uint8)
        for i, im in enumerate(images_bgr):
            s = min(H / im.shape[0], W / im.shape[1])
            nh, nw = int(im.shape[0] * s), int(im.shape[1] * s)
            batch[i, :nh, :nw] = cv2.resize(im, (nw, nh))
            scales.append(s)
        return batch, scales

    def _dispatch_detect(self, batch):
        """Dispatch the sparse detection program; returns device handles
        (cands_dev, packed_focr) without synchronizing.  ``batch`` is a
        [B,H,W,3] array (u8/f32 transport), a (Y, UV) pair (yuv420), or a
        :class:`_RawBatch` (device letterbox)."""
        if isinstance(batch, _RawBatch):
            raw, serve_hw = batch.images, batch.serve_hw
            n = raw.shape[0]
            m = self._pad_to_shards(n)
            if m != n:
                raw = np.concatenate(
                    [raw, np.zeros((m - n,) + raw.shape[1:], raw.dtype)],
                    axis=0)
            prog = self._raw_letterbox_program(raw.shape[1:3], serve_hw)
            cands, quads = prog(self.variables, self._put_batch(raw))
            return cands, self._wrap_focr(quads, m, serve_hw)
        if isinstance(batch, tuple):
            y, uv = batch
            n = y.shape[0]
            m = self._pad_to_shards(n)
            if m != n:
                y = np.concatenate(
                    [y, np.zeros((m - n,) + y.shape[1:], y.dtype)], axis=0)
                uv = np.concatenate(
                    [uv, np.full((m - n,) + uv.shape[1:], 128, uv.dtype)],
                    axis=0)
            cands, quads = self._forward_sparse_yuv(
                self.variables, self._put_batch(y), self._put_batch(uv))
            return cands, self._wrap_focr(quads, m, y.shape[1:3])
        images_norm = batch
        n = images_norm.shape[0]
        m = self._pad_to_shards(n)
        if m != n:
            images_norm = np.concatenate(
                [images_norm, np.zeros((m - n,) + images_norm.shape[1:],
                                       images_norm.dtype)], axis=0)
        cands, quads = self._forward_sparse(
            self.variables, self._put_batch(images_norm))
        return cands, self._wrap_focr(quads, m, images_norm.shape[1:3])

    @staticmethod
    def _wrap_focr(quads, batch: int, serve_hw) -> PackedFocr:
        """Pair the detection program's packed quads with the static focr
        shape (B, H/4, W/4, C) the crop programs need."""
        return PackedFocr(quads, (batch, serve_hw[0] // 4, serve_hw[1] // 4,
                                  quads.shape[1] // 4))

    @staticmethod
    def _feat_args(focr):
        """(feat, fshape) args of the _recognize programs for either a
        :class:`PackedFocr` or a raw [B,H,W,C] focr map."""
        if isinstance(focr, PackedFocr):
            return focr.quads, focr.shape
        if getattr(focr, "ndim", None) == 2:
            raise TypeError(
                "raw packed quads [B*H*W, 4C] carry no shape info — wrap "
                "them via FOTSInference._wrap_focr(quads, batch, serve_hw)")
        return focr, None

    def batch_call(self, images_bgr: List[np.ndarray], serve_hw: Tuple[int, int] = (704, 1280),
                   split_words: bool = False):
        """Fixed-shape batched serving: letterbox all images to ``serve_hw``
        (one compiled program regardless of input sizes), detect, then run
        recognition for ALL images' boxes together in shared width buckets.

        Returns a list (per image) of result lists like :meth:`__call__`,
        with boxes mapped back to each original image's coordinates.
        For throughput over many batches use :meth:`stream`, which overlaps
        host NMS/decoding and transfers with the next batch's device work.
        """
        batch, scales = self._letterbox(images_bgr, serve_hw)
        n = len(images_bgr)

        per_image_boxes, focr = self.detect_boxes_batch(batch)
        all_keys, jobs = self._recognize_dispatch(per_image_boxes, focr)
        return self._recognize_finish(n, per_image_boxes, all_keys, jobs,
                                      scales, split_words)

    def _recognize_dispatch(self, per_image_boxes, focr):
        """Dispatch bucketed recognition for all images' boxes; returns
        (keys, jobs) with device-resident id arrays (no sync)."""
        all_rois: List = []
        all_keys: List = []
        buckets: Dict[int, List[int]] = {}
        for i, boxes in enumerate(per_image_boxes):
            for j in range(boxes.shape[0]):
                roi, w, h = rroi_from_box(boxes[j], i,
                                          expand_w_frac=self.expand_w_frac)
                buckets.setdefault(
                    strip_width_for_box(w, h, buckets=self.strip_buckets), []
                ).append(len(all_rois))
                all_rois.append(roi)
                all_keys.append((i, j))
        jobs = []
        if all_rois:
            rois_arr = np.asarray(all_rois, np.float32)
            feat, fshape = self._feat_args(focr)
            for width, idxs in sorted(buckets.items()):
                for chunk, sel in self._roi_chunks(rois_arr, idxs, width):
                    ids_dev, conf_dev = self._recognize(
                        self.variables, feat, sel, width, fshape)
                    try:
                        ids_dev.copy_to_host_async()
                        conf_dev.copy_to_host_async()
                    except AttributeError:
                        pass
                    jobs.append((chunk, ids_dev, conf_dev))
        return all_keys, jobs

    def _recognize_finish(self, n, per_image_boxes, all_keys, jobs, scales,
                          split_words):
        """Materialize recognition jobs + assemble per-image results.

        The full bucket width is decoded (reference behavior: align_ocr
        decodes all of target_gw, ocr_utils.py:179-186).  CTC is
        alignment-free — the trained model may emit characters anywhere in
        the loss window, measurably including frames past the roi's
        geometric extent — so truncating ids at ceil(11*aspect) cuts real
        emissions (verified on an overfit checkpoint: 'ALVIN' -> 'ALV')."""
        texts = [""] * len(all_keys)
        ids_out: List[Optional[np.ndarray]] = [None] * len(all_keys)
        confs = np.zeros((len(all_keys),), np.float32)
        for idxs, ids_dev, conf_dev in jobs:
            ids = np.asarray(ids_dev)[: len(idxs)]
            conf = np.asarray(conf_dev)[: len(idxs)]
            dec = self.codec.decode_batch(ids)
            for k, ridx in enumerate(idxs):
                texts[ridx] = dec[k]
                ids_out[ridx] = ids[k]
                confs[ridx] = conf[k]

        results = [[] for _ in range(n)]
        for ridx, (i, j) in enumerate(all_keys):
            t = texts[ridx]
            if not t:
                continue
            b = per_image_boxes[i][j].copy()
            b[:8] /= scales[i]  # back to original image coords
            entry = {"box": b, "text": t, "conf": float(confs[ridx])}
            if split_words and ids_out[ridx] is not None:
                from fots.wordsplit import split_detection

                entry["words"] = [{"quad": q / scales[i], "text": wt}
                                  for q, wt in split_detection(
                                      per_image_boxes[i][j], ids_out[ridx], self.codec)]
            results[i].append(entry)
        return results

    # -------- pipelined streaming serving --------

    def stream(self, batch_iter, serve_hw: Tuple[int, int] = (704, 1280),
               split_words: bool = False, with_context: bool = False):
        """Software-pipelined serving over an iterable of image-BGR lists.

        Yields one :meth:`batch_call`-format results list per input batch.
        Two detector forwards stay in flight so host NMS/decoding and the
        link round trip hide behind device work; each batch's recognition
        is dispatched before the next forward AND materialized one
        iteration later (depth-2 on recognition too), so the recognition
        programs' device time and their id transfers hide behind the next
        batch's detector forward — the structure that reaches chip-bound
        throughput in bench.py (vs the reference's strictly sequential
        per-image loop, test.py:74-127).

        With ``with_context=True`` the iterable yields ``(ctx, images)``
        pairs and the stream yields ``(ctx, results)`` — the caller's
        per-batch metadata rides through the pipeline instead of being
        re-paired by arrival order.
        """
        from collections import deque

        hs, ws = serve_hw[0] // 4, serve_hw[1] // 4
        it = iter(batch_iter)
        inflight = deque()
        rec_pending = deque()

        def pull():
            item = next(it, None)
            if item is None:
                return False
            ctx, images = item if with_context else (None, item)
            batch, scales = self._letterbox(images, serve_hw)
            cands_dev, focr = self._dispatch_detect(batch)
            try:
                cands_dev.copy_to_host_async()
            except AttributeError:
                pass
            inflight.append((ctx, len(images), scales, cands_dev, focr))
            return True

        if pull():
            pull()
        while inflight or rec_pending:
            if inflight:
                ctx, n, scales, cands_dev, focr = inflight.popleft()
                cands = np.asarray(cands_dev)
                boxes = self._cap_boxes(get_boxes_from_candidates_batch(
                    cands[:n], hs, ws, self.segm_thresh, self.iou_th1,
                    self.iou_th2))
                keys, jobs = self._recognize_dispatch(boxes, focr)
                rec_pending.append((ctx, n, scales, boxes, keys, jobs))
                pull()  # next forward overlaps this batch's recognition
            if rec_pending and (len(rec_pending) > 1 or not inflight):
                ctx, n, scales, boxes, keys, jobs = rec_pending.popleft()
                res = self._recognize_finish(n, boxes, keys, jobs, scales,
                                             split_words)
                yield (ctx, res) if with_context else res

    # -------- fused end-to-end --------

    def __call__(self, image_bgr: np.ndarray, scale_up: bool = False,
                 split_words: bool = False):
        """Full pipeline on one image.  Returns list of dicts:
        {'box': [8 coords + score], 'text': str} (plus per-word sub-boxes
        under 'words' when split_words is set)."""
        boxes, focr, im_resized = self.detect(image_bgr, scale_up=scale_up)
        texts, ids, confs = self.recognize_boxes(boxes, focr, return_ids=True)
        out = []
        for k, (b, t) in enumerate(zip(boxes, texts)):
            if len(t) == 0:
                continue
            entry = {"box": b, "text": t, "conf": float(confs[k])}
            if split_words and ids[k] is not None:
                from fots.wordsplit import split_detection

                entry["words"] = [
                    {"quad": q, "text": wt}
                    for q, wt in split_detection(b, ids[k], self.codec)
                ]
            out.append(entry)
        return out, im_resized
