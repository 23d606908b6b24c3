"""Joint detection + recognition training (pjit over a device mesh).

TPU re-design of the reference trainer (train.py:30-141):

- ONE compiled train step per strip-width bucket does: detector forward,
  EAST loss, RoIRotate of the shared focr features, recognition head, CTC
  — forward AND backward entirely on device (the reference round-trips
  predictions to host mid-step);
- roi sampling (the host part of process_boxes) runs on the *previous*
  step's detached prediction maps, pipelined so the device never waits on
  host Python (one forward per step — the reference also forwards once
  but synchronizes twice);
- batch is sharded over the 'data' mesh axis (pjit-DP; XLA inserts the
  gradient psum over ICI), parameters replicated (vocab head optionally
  sharded over 'model');
- Adam(lr, betas=(0.5, 0.999)) as in train.py:40; per-step metrics via
  running averagers; orbax checkpoints with step/opt state.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from fots.codec import LabelCodec
from fots.losses import ctc_loss, detection_loss
from fots.models import FOTSDetector
from fots.models.detector import init_detector
from fots.ops.rroi_align import rroi_align
from fots.parallel import batch_sharding, make_mesh, param_shardings, replicate
from fots.roirotate import POOLED_HEIGHT, RoiBatch, sample_rois


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    rng: Any = struct.field(pytree_node=True, default=None)


def create_train_state(
    model: FOTSDetector,
    rng,
    learning_rate: float = 1e-3,
    input_size: int = 512,
) -> TrainState:
    variables = init_detector(
        model, rng, image_shape=(1, input_size, input_size, 3)
    )
    tx = optax.adam(learning_rate, b1=0.5, b2=0.999)  # reference train.py:40
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        rng=rng,
        tx=tx,
    )


def pack_host_batch(batch, roi_batch) -> tuple:
    """Flatten the whole host batch into FOUR compact buffers.

    Slow-link transports pay a large per-transfer floor AND per-byte cost
    (the tunnel to the chip moves ~30 MB/s; a naive f32 batch is the train
    loop's bottleneck):
    - images as uint8 (x/128-1 of uint8 pixels: bit-exact round trip, 4x
      smaller than f32; normalization happens on device);
    - score map + training mask as one uint8 buffer (both are 0/1: exact);
    - geometry distances + angle as float16 (quantization ~1e-3 relative,
      far below augmentation noise; 2x smaller);
    - roi data as one replicated flat f32 buffer (int32 label ids
      round-trip exactly through f32, values << 2^24).
    """
    b = batch.images.shape[0]
    images_u8 = np.clip(np.rint((batch.images + 1.0) * 128.0),
                        0, 255).astype(np.uint8)
    maps_u8 = np.concatenate(
        [
            batch.score_maps.reshape(b, -1).astype(np.uint8),
            batch.training_masks.reshape(b, -1).astype(np.uint8),
        ],
        axis=1,
    )
    maps_f16 = np.concatenate(
        [
            np.ascontiguousarray(batch.geo_maps[..., :4], np.float16).reshape(b, -1),
            np.ascontiguousarray(batch.geo_maps[..., 4], np.float16).reshape(b, -1),
        ],
        axis=1,
    )
    rep = np.concatenate(
        [
            roi_batch.rois.ravel(),
            roi_batch.labels.ravel().astype(np.float32),
            roi_batch.label_lengths.astype(np.float32),
            roi_batch.roi_mask,
        ]
    ).astype(np.float32)
    return images_u8, maps_u8, maps_f16, rep


def _unpack_device_batch(images_u8, maps_u8, maps_f16, rep, input_hw,
                         max_rois, max_label):
    h, w = input_hw
    b = maps_u8.shape[0]
    hs, ws = h // 4, w // 4
    n = hs * ws
    batch = {
        "images": images_u8.astype(jnp.float32) / 128.0 - 1.0,
        "score_maps": maps_u8[:, :n].reshape(b, hs, ws).astype(jnp.float32),
        "training_masks": maps_u8[:, n:].reshape(b, hs, ws).astype(jnp.float32),
        "geo_maps": maps_f16[:, : n * 4].reshape(b, hs, ws, 4).astype(jnp.float32),
        "angle_gt": maps_f16[:, n * 4:].reshape(b, hs, ws).astype(jnp.float32),
    }
    r0 = max_rois * 6
    r1 = r0 + max_rois * max_label
    r2 = r1 + max_rois
    batch["rois"] = rep[:r0].reshape(max_rois, 6)
    batch["labels"] = rep[r0:r1].reshape(max_rois, max_label).astype(jnp.int32)
    batch["label_lengths"] = rep[r1:r2].astype(jnp.int32)
    batch["roi_mask"] = rep[r2:r2 + max_rois]
    return batch


ROI_CANDIDATES_K = 128  # random candidate pixels shipped to the host sampler


def extract_roi_candidates(rng, segm_pred, score_gt, geo_pred, angle_pred,
                           k: int = ROI_CANDIDATES_K):
    """Device-side uniform sampling of roi-candidate pixels (jittable).

    The host sampler (fots/roirotate.py:sample_rois) walks a random
    permutation of pixels where ``segm_pred > 0.5`` inside gt text and keeps
    at most 100 — so shipping full prediction maps off-device every step
    (reference ocr_process.py:91-95 does exactly that) wastes ~100x the
    bytes.  Instead, draw ``k`` of those pixels WITHOUT replacement by
    top-k over iid uniform priorities (distributionally identical to
    ``rng.permutation(...)[:k]``), gather their geometry, and pack
    channel-first ``[B, 8, k]`` rows ``(score, d0..d3, sin, cos, flat_idx)``
    with invalid slots marked by score -1.
    """
    b, h, w = segm_pred.shape
    k = min(k, h * w)
    valid = (segm_pred > 0.5) & (score_gt > 0)
    pri = jax.random.uniform(rng, (b, h * w), jnp.float32)
    pri = jnp.where(valid.reshape(b, h * w), pri, -1.0)
    top_pri, idx = jax.lax.top_k(pri, k)
    flat_score = jnp.take_along_axis(segm_pred.reshape(b, h * w), idx, axis=1)
    score = jnp.where(top_pri > 0, flat_score, -1.0)
    g = jnp.take_along_axis(geo_pred.reshape(b, h * w, 4), idx[..., None], axis=1)
    a = jnp.take_along_axis(angle_pred.reshape(b, h * w, 2), idx[..., None], axis=1)
    packed = jnp.concatenate(
        [score[..., None], g, a, idx[..., None].astype(jnp.float32)], axis=-1)
    return jnp.transpose(packed, (0, 2, 1)).astype(jnp.float32)


def make_train_step(model: FOTSDetector, multi_scale: bool = True,
                    ohem: bool = False, masked_norm: bool = True):
    """Returns step(state, sharded, rep, input_hw, strip_width) jitted per
    (input shape, strip bucket).

    masked_norm: train the recognition head with bucket-width-invariant
    masked InstanceNorm statistics (per-roi valid widths) — strips then
    normalize identically at any serve-time bucket width."""
    from fots.roirotate import MAX_LABEL_LEN, MAX_ROIS

    @functools.partial(jax.jit, static_argnames=("strip_width", "input_hw"),
                       donate_argnums=(0,))
    def train_step(state: TrainState, images_u8, maps_u8, maps_f16, rep,
                   input_hw, strip_width: int):
        batch = _unpack_device_batch(images_u8, maps_u8, maps_f16, rep,
                                     input_hw, MAX_ROIS, MAX_LABEL_LEN)
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            det = detection_loss(
                out,
                batch["score_maps"],
                batch["training_masks"],
                batch["geo_maps"],
                batch["angle_gt"],
                multi_scale=multi_scale,
                ohem=ohem,
            )
            strips = rroi_align(out["focr"], batch["rois"], POOLED_HEIGHT,
                                strip_width, 0.25)
            valid_w = None
            if masked_norm:
                aspect_all = batch["rois"][:, 4] / jnp.maximum(
                    batch["rois"][:, 3], 1e-6)
                valid_w = jnp.clip(
                    jnp.ceil(POOLED_HEIGHT * aspect_all), 1, strip_width
                ).astype(jnp.int32)
            logp = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                strips,
                train=True,
                rngs={"dropout": rng},
                method=FOTSDetector.recognize,
                valid_w=valid_w,
            )
            # reference CTC frame window: warp-ctc gets sizes [T]*N with
            # T = ceil(11 * max aspect of the batch) (ocr_process.py:260-263,
            # 299-300).  The compiled strip bucket is wider (static shape),
            # so reproduce T as masked logit_lengths — the CTC objective is
            # then IDENTICAL to the reference's for every bucket choice,
            # decoupling the coarse {256,512} bucket grid from training
            # dynamics (blank-padding beyond T no longer enters the loss).
            rois_w = batch["rois"][:, 4]
            rois_h = jnp.maximum(batch["rois"][:, 3], 1e-6)
            aspect = jnp.where(batch["roi_mask"] > 0, rois_w / rois_h, 0.0)
            t_ref = jnp.ceil(POOLED_HEIGHT * jnp.max(aspect))
            t_ref = jnp.clip(t_ref, 1.0, float(strip_width)).astype(jnp.int32)
            logit_lengths = jnp.full((logp.shape[0],), t_ref)
            ctc = ctc_loss(logp, batch["labels"], batch["label_lengths"],
                           logit_lengths=logit_lengths,
                           roi_mask=batch["roi_mask"])
            total = det["total"] + ctc
            aux = {
                "loss": total,
                "segm_loss": det["segm"],
                "angle_loss": det["angle"],
                "iou_loss": det["iou"],
                "ctc_loss": ctc,
                "segm_pred": out["segm"][0][..., 0],
                "geo_pred": out["rbox"][0],
                "angle_pred": out["angle"][0],
                "batch_stats": updates["batch_stats"],
            }
            return total, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=aux.pop("batch_stats"), rng=new_rng
        )
        # extract next step's roi candidates on device (~100x less d2h
        # traffic than shipping the full prediction maps)
        cand_rng = jax.random.fold_in(rng, 1)
        cands = extract_roi_candidates(
            cand_rng,
            jax.lax.stop_gradient(aux.pop("segm_pred")),
            batch["score_maps"],
            jax.lax.stop_gradient(aux.pop("geo_pred")),
            jax.lax.stop_gradient(aux.pop("angle_pred")),
        )
        # pack scalar metrics into ONE small array (one transfer, not five)
        metric_vec = jnp.stack([aux["loss"], aux["segm_loss"], aux["angle_loss"],
                                aux["iou_loss"], aux["ctc_loss"]])
        return new_state, metric_vec, cands

    return train_step

METRIC_KEYS = ("loss", "segm_loss", "angle_loss", "iou_loss", "ctc_loss")


@dataclass
class Averager:
    """Running mean (reference src/utils.py:192-220)."""

    total: float = 0.0
    count: int = 0

    def add(self, v: float):
        self.total += float(v)
        self.count += 1

    def val(self) -> float:
        return self.total / self.count if self.count else 0.0

    def reset(self):
        self.total, self.count = 0.0, 0


class Trainer:
    """Training loop driver: host sampling pipelined against device steps."""

    def __init__(
        self,
        model: Optional[FOTSDetector] = None,
        codec: Optional[LabelCodec] = None,
        learning_rate: float = 1e-3,
        input_size: int = 512,
        seed: int = 0,
        mesh=None,
        use_predicted_rois: bool = True,
        ohem: bool = False,
        # default ON since round 3: bucket-width-invariant recognition
        # statistics let serving use the fine bucket grid (up to 8x less
        # recognition compute on short words); legacy checkpoints trained
        # pre-flip pass masked_norm=False (auto-detected from the
        # train_config.json sidecar by fots.cli.detect.load_engine)
        masked_norm: bool = True,
    ):
        self.codec = codec or LabelCodec()
        self.model = model or FOTSDetector(nclass=self.codec.num_classes)
        self.masked_norm = masked_norm
        self.mesh = mesh if mesh is not None else make_mesh()
        self.input_size = input_size
        self.use_predicted_rois = use_predicted_rois
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(seed), learning_rate, input_size
        )
        # place params on mesh (replicated / vocab-sharded)
        shardings = param_shardings(self.state.params, self.mesh)
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jax.device_put, self.state.params, shardings)
        )
        self._step_fn = make_train_step(self.model, self.model.multi_scale,
                                        ohem=ohem, masked_norm=masked_norm)
        self._np_rng = np.random.default_rng(seed)
        self._prev_maps = None  # (candidate pack [B,8,K], (hs, ws)) from prev step
        self._pending_metrics: list = []
        self.metrics = {k: Averager() for k in
                        ("loss", "segm_loss", "angle_loss", "iou_loss", "ctc_loss")}

    def _build_roi_batch(self, batch) -> RoiBatch:
        cands = hw = None
        if self.use_predicted_rois and self._prev_maps is not None:
            pc, phw = self._prev_maps
            # pc may still be the device array from the previous step
            # (copied host-side asynchronously); materialize lazily here so
            # the pull overlaps that step's device execution
            pc = np.asarray(pc)
            self._prev_maps = (pc, phw)
            if pc.shape[0] == batch.images.shape[0] and \
               phw == batch.score_maps.shape[1:]:
                cands, hw = pc, phw
        return sample_rois(
            self._np_rng,
            batch.score_maps,
            batch.gt_idxs,
            batch.gt_quads,
            batch.labels,
            batch.images.shape[1:3],
            self.codec,
            pred_candidates=cands,
            pred_map_hw=hw,
        )

    def _prepare(self, batch):
        """Host side of a step: roi sampling, packing, device upload.

        Runs on the prefetch thread in :meth:`train` so the (slow-link)
        upload of batch i+1 overlaps batch i's device execution.
        """
        roi_batch = self._build_roi_batch(batch)
        images_u8, maps_u8, maps_f16, rep_buf = pack_host_batch(batch, roi_batch)
        bsh = batch_sharding(self.mesh)
        dev = jax.device_put(
            {"images": images_u8, "maps_u8": maps_u8, "maps_f16": maps_f16,
             "rep": rep_buf},
            {"images": bsh, "maps_u8": bsh, "maps_f16": bsh,
             "rep": replicate(self.mesh)},
        )
        return roi_batch, dev

    def step(self, batch, defer: bool = False, prepared=None):
        """One training step from a host DetectionBatch.

        defer=True returns the device-resident metric vector instead of
        blocking on it (flush with :meth:`drain_metrics`), so the host
        loop never waits for the device: next-step roi sampling pulls the
        candidate pack lazily and the metric copies stream home in the
        background.  Used by :meth:`train` for a fully pipelined loop.
        """
        roi_batch, dev = prepared if prepared is not None else self._prepare(batch)
        self.state, metric_vec, cands = self._step_fn(
            self.state, dev["images"], dev["maps_u8"], dev["maps_f16"],
            dev["rep"], tuple(batch.images.shape[1:3]), roi_batch.strip_width)
        # candidate pack for next step's roi sampling: start the host copy
        # now, materialize lazily at the next _build_roi_batch
        try:
            cands.copy_to_host_async()
            metric_vec.copy_to_host_async()
        except AttributeError:  # non-jax arrays in tests
            pass
        self._prev_maps = (cands, tuple(batch.score_maps.shape[1:3]))
        if defer:
            self._pending_metrics.append(metric_vec)
            return None
        vals = np.asarray(metric_vec)  # one transfer for all scalars
        out = {}
        for k, v in zip(METRIC_KEYS, vals):
            self.metrics[k].add(float(v))
            out[k] = float(v)
        return out

    def drain_metrics(self) -> Dict[str, float]:
        """Fold deferred metric vectors into the running averagers and
        return the most recent step's values."""
        out = {}
        for mv in self._pending_metrics:
            vals = np.asarray(mv)
            out = {}
            for k, v in zip(METRIC_KEYS, vals):
                self.metrics[k].add(float(v))
                out[k] = float(v)
        self._pending_metrics.clear()
        return out

    def train(self, batches, max_steps: int, log_every: int = 5,
              checkpoint_dir: Optional[str] = None, checkpoint_every: int = 10000,
              debug_dir: Optional[str] = None, debug_every: int = 1000):
        """Pipelined training loop.

        A single prefetch thread runs the host side of step i+1 (roi
        sampling, packing, the slow-link device upload) while the device
        executes step i; metric pulls are deferred to log points.  Roi
        sampling for step i+1 uses step i's candidate pack, pulled lazily
        on the prefetch thread — the data dependency that bounds pipeline
        depth at one step, exactly as the serving path allows.
        """
        from concurrent.futures import ThreadPoolExecutor

        from fots.checkpoint import save_checkpoint

        pool = ThreadPoolExecutor(max_workers=1)
        it = iter(batches)

        def _next_prepared():
            batch = next(it, None)
            if batch is None:
                return None
            return batch, pool.submit(self._prepare, batch)

        t0 = time.time()
        pending = _next_prepared()
        # resume-aware global step accounting: state.step counts applied
        # gradient updates (restored by restore_checkpoint), so a resumed
        # run continues the global numbering — max_steps stays a GLOBAL
        # step bound and checkpoint filenames never collide with the
        # pre-resume ones (reference train.py saves global `step` too)
        step_idx = int(np.asarray(jax.device_get(self.state.step))) - 1
        while pending is not None:
            step_idx += 1
            if step_idx >= max_steps:
                break
            batch, fut = pending
            try:
                prepared = fut.result()
                if debug_dir and step_idx % debug_every == 0:
                    # data/tshow analog (reference ocr_process.py:224-249):
                    # host-only crop dump of this step's sampled rois
                    from fots.debug_vis import dump_roi_crops

                    dump_roi_crops(batch.images, prepared[0], self.codec,
                                   debug_dir, step_idx)
                # dispatch step i, then immediately start preparing i+1 on
                # the worker (its roi sampling blocks on step i's candidate
                # pack, which streams home while the device runs)
                self.step(batch, defer=True, prepared=prepared)
                pending = _next_prepared()
            except Exception:
                # reference-style resilience (train.py:85-123) but logged
                import traceback

                traceback.print_exc()
                pending = _next_prepared()
                continue
            if step_idx % log_every == 0:
                self.drain_metrics()
                dt = time.time() - t0
                msg = " ".join(f"{k}: {self.metrics[k].val():.3f}" for k in self.metrics)
                print(f"step {step_idx} {msg} time {dt:.3f}s", flush=True)
                t0 = time.time()
            if checkpoint_dir and (step_idx + 1) % checkpoint_every == 0:
                self.drain_metrics()
                # label = applied update count (state.step), the value
                # restore_checkpoint puts back — so resuming from
                # step_N continues at exactly N and never re-executes or
                # overwrites the checkpoint it resumed from (exception-
                # skipped steps make state.step lag step_idx, which the
                # label must reflect)
                save_checkpoint(checkpoint_dir, self.state,
                                int(np.asarray(jax.device_get(self.state.step))))
                for avg in self.metrics.values():
                    avg.reset()
        pool.shutdown(wait=True)
        self.drain_metrics()
        if checkpoint_dir:
            save_checkpoint(checkpoint_dir, self.state,
                            int(np.asarray(jax.device_get(self.state.step))))
