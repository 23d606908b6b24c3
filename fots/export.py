"""Portable serving artifacts via ``jax.export`` (StableHLO).

Deployment story the reference lacks entirely: its serving path needs the
full torch + custom-CUDA-extension build on every box (test.py:59-67 loads
the model class and .h5 weights in-process).  Here the two compiled
serving programs of :class:`fots.pipeline.FOTSInference` are serialized to
versioned StableHLO bytes that any compatible JAX runtime can execute
WITHOUT the model-definition code (no flax, no fots.models):

- ``detect.shlo`` — normalize (u8 x/128-1) + detector forward + on-device
  top-k NMS candidate extraction -> packed candidates [B,8,k] + shared OCR
  features (focr, stays on device between programs);
- ``recognize_<w>.shlo`` (one per strip-width bucket) — RoIRotate over
  focr + CTC head -> argmax ids + per-box confidence, at a fixed padded
  roi count (``roi_pad``).

Weights ride alongside in ``params.npz`` (bfloat16 params stored as f32 —
npz can't hold bf16 — and re-cast at load; f32->bf16->f32->bf16 is
bit-stable).  The host stages between the programs — quad decode,
locality-aware NMS merge, strip bucketing, CTC collapse — are NumPy/C++
(:mod:`fots.ops.nms`, :mod:`fots.geometry`, :mod:`fots.codec`) and come
along as a lightweight host library; :class:`ExportedEngine` wires them
up exactly like ``FOTSInference.batch_call``.

Multi-platform: artifacts are lowered for ``("tpu", "cpu")`` by default,
so one bundle serves on TPU and replays in CPU CI.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping
from typing import Dict, List, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
_SEP = "//"  # path separator in params.npz keys (flax names contain '_')


def _flatten(tree, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[_SEP.join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten(flat: Dict) -> Dict:
    tree: Dict = {}
    for path, arr in flat.items():
        parts = path.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def export_serving(engine, out_dir: str, batch: int, height: int, width: int,
                   roi_pad: int = 32,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> Dict:
    """Serialize ``engine``'s serving programs to ``out_dir``.

    ``engine``: a single-device :class:`fots.pipeline.FOTSInference`
    (mesh serving stays in-process — shardings are a runtime property,
    not an artifact one).  The detection program is exported at serving
    shape ``[batch, height, width, 3]`` u8; one recognition program per
    ``engine.strip_buckets`` entry at a fixed ``roi_pad`` roi count.

    Returns the manifest dict (also written to ``out_dir/manifest.json``).
    """
    import jax
    from jax import export as jexport

    from fots.codec import LabelCodec
    from fots.geometry import TARGET_H

    if engine.mesh is not None:
        raise ValueError("export_serving requires a single-device engine")
    if height % 32 or width % 32:
        raise ValueError("serving height/width must be /32 multiples")
    # the bundle must be decodable without the exporting process: only the
    # plain LabelCodec's state (alphabet) round-trips through the manifest
    if type(engine.codec) is not LabelCodec:
        raise ValueError(
            f"export_serving supports LabelCodec engines; got "
            f"{type(engine.codec).__name__} (pass a matching codec to "
            f"ExportedEngine yourself and export with a LabelCodec stub "
            f"if you know what you're doing)")
    os.makedirs(out_dir, exist_ok=True)

    # pull params to host once; bf16 stored as f32 (npz limitation).
    # Canonicalized to plain nested dicts so the exported in_tree matches
    # what ExportedEngine rebuilds from the npz (FrozenDict != dict as a
    # pytree).
    host_vars = _unflatten(_flatten(jax.tree.map(np.asarray,
                                                 engine.variables)))
    flat = _flatten(host_vars)
    # vocab-head width must match the codec baked into the manifest,
    # or every served string would silently decode with the wrong alphabet
    for key, arr in flat.items():
        if key.endswith(f"conv11{_SEP}kernel"):
            if arr.shape[-1] != engine.codec.num_classes:
                raise ValueError(
                    f"vocab head {key} has {arr.shape[-1]} classes but the "
                    f"engine codec expects {engine.codec.num_classes}")
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    np.savez(os.path.join(out_dir, "params.npz"),
             **{k: (v.astype(np.float32) if v.dtype == np.dtype("bfloat16")
                    else v) for k, v in flat.items()})

    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_vars)
    img_spec = jax.ShapeDtypeStruct((batch, height, width, 3), np.uint8)
    exp = jexport.export(engine._forward_sparse, platforms=list(platforms))(
        var_spec, img_spec)
    with open(os.path.join(out_dir, "detect.shlo"), "wb") as f:
        f.write(exp.serialize())
    # out avals: (candidates [B,8,k], packed focr quads [B*H/4*W/4, 4C] —
    # pre-packed for the recognition gathers, see
    # fots.ops.rroi_align.pack_neighbors)
    cands_aval, focr_aval = exp.out_avals
    programs = {"detect": {
        "file": "detect.shlo",
        "images": [list(img_spec.shape), "uint8"],
        "candidates": [list(cands_aval.shape), str(cands_aval.dtype)],
        "focr": [list(focr_aval.shape), str(focr_aval.dtype)],
    }}

    focr_spec = jax.ShapeDtypeStruct(focr_aval.shape, focr_aval.dtype)
    rois_spec = jax.ShapeDtypeStruct((roi_pad, 6), np.float32)
    fshape = (batch, height // 4, width // 4, focr_aval.shape[1] // 4)
    for w in engine.strip_buckets:
        rexp = jexport.export(engine._recognize, platforms=list(platforms))(
            var_spec, focr_spec, rois_spec, width=w, fshape=fshape)
        fname = f"recognize_{w}.shlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(rexp.serialize())
        programs[f"recognize_{w}"] = {"file": fname, "width": w}

    manifest = {
        "format": "fots-serving-v1",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": batch, "height": height, "width": width,
        "max_candidates": engine.max_candidates,
        "strip_buckets": list(engine.strip_buckets),
        "roi_pad": roi_pad,
        "target_h": TARGET_H,
        "segm_thresh": engine.segm_thresh,
        "iou_th1": engine.iou_th1, "iou_th2": engine.iou_th2,
        "expand_w_frac": engine.expand_w_frac,
        "mixed_precision": engine.mixed_precision,
        "masked_norm": engine.masked_norm,
        "max_boxes": engine.max_boxes,
        "codec": {"type": "LabelCodec",
                  "alphabet": engine.codec.alphabet,
                  "ignore_case": bool(engine.codec.ignore_case)},
        "param_dtypes": dtypes,
        "programs": programs,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedEngine:
    """Minimal host runtime over an exported bundle.

    Mirrors ``FOTSInference.batch_call``'s host glue (letterbox ->
    detect -> candidate NMS -> bucketed recognize -> CTC collapse) using
    only host-side fots modules plus the deserialized StableHLO programs.
    """

    def __init__(self, bundle_dir: str, codec=None):
        import jax.numpy as jnp
        from jax import export as jexport

        from fots.codec import LabelCodec

        with open(os.path.join(bundle_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "fots-serving-v1":
            raise ValueError(f"not a fots serving bundle: {bundle_dir}")

        with np.load(os.path.join(bundle_dir, "params.npz")) as z:
            flat = {k: z[k] for k in z.files}
        # device-put every param once at load (restoring the exported
        # dtype: bf16 params travel as f32 in the npz); leaving them as
        # host numpy would re-ship the whole weight set on every call
        for k, dt in self.manifest["param_dtypes"].items():
            flat[k] = jnp.asarray(flat[k], dt)
        self.variables = _unflatten(flat)

        def _load(fname):
            with open(os.path.join(bundle_dir, fname), "rb") as f:
                return jexport.deserialize(f.read())

        progs = self.manifest["programs"]
        self._detect = _load(progs["detect"]["file"])
        self._recognize = {
            p["width"]: _load(p["file"])
            for name, p in progs.items() if name.startswith("recognize_")}
        if codec is not None:
            self.codec = codec
        else:
            spec = self.manifest.get("codec")
            if spec is None or spec.get("type") != "LabelCodec":
                raise ValueError(
                    "bundle manifest carries no LabelCodec spec; pass the "
                    "matching codec= explicitly")
            self.codec = LabelCodec(alphabet=spec["alphabet"],
                                    ignore_case=spec["ignore_case"])

    @property
    def serve_hw(self) -> Tuple[int, int]:
        return self.manifest["height"], self.manifest["width"]

    def detect(self, images_u8: np.ndarray):
        """[B,H,W,3] u8 -> (candidates [B,8,k] f32, focr device array)."""
        return self._detect.call(self.variables, images_u8)

    def recognize(self, focr, rois: np.ndarray, width: int):
        """Padded rois [roi_pad,6] f32 -> (ids, conf) for one bucket."""
        return self._recognize[width].call(self.variables, focr, rois)

    def batch_call(self, images_bgr: List[np.ndarray]):
        """Serve one batch of raw BGR images.

        Returns per-image lists of ``{"box": [8 coords + score], "text",
        "conf"}`` in original-image coordinates, matching
        ``FOTSInference.batch_call`` output (greedy decode path).
        """
        import cv2

        from fots.geometry import rroi_from_box, strip_width_for_box
        from fots.ops.nms import get_boxes_from_candidates_batch

        m = self.manifest
        H, W = self.serve_hw
        n = len(images_bgr)
        if n > m["batch"]:
            raise ValueError(f"batch {n} > exported batch {m['batch']}")
        batch = np.zeros((m["batch"], H, W, 3), np.uint8)
        scales = []
        for i, im in enumerate(images_bgr):
            s = min(H / im.shape[0], W / im.shape[1])
            nh, nw = int(im.shape[0] * s), int(im.shape[1] * s)
            batch[i, :nh, :nw] = cv2.resize(im, (nw, nh))
            scales.append(s)

        cands, focr = self.detect(batch)
        per_image_boxes = get_boxes_from_candidates_batch(
            np.asarray(cands)[:n], H // 4, W // 4,
            m["segm_thresh"], m["iou_th1"], m["iou_th2"])
        if m.get("max_boxes") is not None:  # 0 is a valid cap (matches
            # FOTSInference._cap_boxes's `is None` semantics)
            capped = []
            for b in per_image_boxes:
                if b.shape[0] > m["max_boxes"]:
                    keep = np.argsort(-b[:, 8], kind="stable")[: m["max_boxes"]]
                    b = b[np.sort(keep)]
                capped.append(b)
            per_image_boxes = capped

        # bucket all images' rois by strip width (batch_call semantics)
        all_rois: List[np.ndarray] = []
        all_keys: List[Tuple[int, int]] = []
        buckets: Dict[int, List[int]] = {}
        for i, boxes in enumerate(per_image_boxes):
            for j in range(boxes.shape[0]):
                roi, w, h = rroi_from_box(boxes[j], i,
                                          expand_w_frac=m["expand_w_frac"])
                buckets.setdefault(
                    strip_width_for_box(w, h,
                                        buckets=tuple(m["strip_buckets"])),
                    []).append(len(all_rois))
                all_rois.append(roi)
                all_keys.append((i, j))

        texts = [""] * len(all_keys)
        confs = np.zeros((len(all_keys),), np.float32)
        roi_pad = m["roi_pad"]
        dummy = np.asarray([0.0, 8.0, 8.0, 8.0, 8.0, 0.0], np.float32)
        if all_rois:
            rois_arr = np.asarray(all_rois, np.float32)
            for width, idxs in sorted(buckets.items()):
                for start in range(0, len(idxs), roi_pad):
                    chunk = idxs[start:start + roi_pad]
                    rois = np.tile(dummy, (roi_pad, 1))
                    rois[: len(chunk)] = rois_arr[np.asarray(chunk)]
                    ids, conf = self.recognize(focr, rois, width)
                    ids = np.asarray(ids)[: len(chunk)]
                    conf = np.asarray(conf)[: len(chunk)]
                    dec = self.codec.decode_batch(ids)
                    for k, ridx in enumerate(chunk):
                        texts[ridx] = dec[k]
                        confs[ridx] = conf[k]

        results: List[List[Dict]] = [[] for _ in range(n)]
        for ridx, (i, j) in enumerate(all_keys):
            if not texts[ridx]:
                continue
            b = per_image_boxes[i][j].copy()
            b[:8] /= scales[i]
            results[i].append({"box": b, "text": texts[ridx],
                               "conf": float(confs[ridx])})
        return results
