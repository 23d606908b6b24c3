"""Recognition-only training: crop batches -> CTC (two model flavors).

Re-designs the reference's standalone recognizer trainers:
- ``train_ocr.py`` (FOTS recognition branch over stem features of
  norm_height-tall crops, reference tools/train_ocr.py:67-95);
- ``train_crnn.py`` (CRNN over 32-px crops, reference
  tools/train_crnn.py:85-139).

Each width bucket gets its own compiled step (static shapes); buckets
stream from :mod:`fots.data.ocr_crops`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from fots.codec import LabelCodec
from fots.losses import ctc_loss
from fots.models import CRNN, FOTSDetector
from fots.models.detector import init_detector


class OcrTrainState(train_state.TrainState):
    batch_stats: Any = None
    rng: Any = struct.field(pytree_node=True, default=None)


def _make_step(apply_logp):
    """apply_logp(params, batch_stats, images, rng) -> (logp, new_stats)."""

    @jax.jit
    def step(state: OcrTrainState, images, labels, label_lengths):
        rng, new_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logp, new_stats = apply_logp(params, state.batch_stats, images, rng)
            loss = ctc_loss(logp, labels, label_lengths)
            return loss, (new_stats, logp)

        (loss, (new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats,
                                          rng=new_rng)
        return new_state, loss

    return step


class CRNNE2ETrainer:
    """OwnModel CRNN branch trained on GT crops from full scenes.

    Device analog of the reference ``process_crnn`` flow
    (src/utils.py:429-478 via train_crnn.1.py): RoIRotate 32-px strips out
    of the raw image, CRNN forward, CTC; eval mode decodes instead.
    """

    def __init__(self, codec: Optional[LabelCodec] = None, lr: float = 1e-4,
                 seed: int = 0):
        import functools

        from fots.models.own import OwnModel, init_own_model
        from fots.ops.rroi_align import rroi_align

        self.codec = codec or LabelCodec()
        self.model = OwnModel(nclass=self.codec.num_classes)
        variables = init_own_model(self.model, jax.random.PRNGKey(seed))
        self.state = OcrTrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            rng=jax.random.PRNGKey(seed + 1),
            tx=optax.adam(lr),
        )
        model = self.model

        @functools.partial(jax.jit, static_argnames=("width",))
        def train_step(state, images, rois, labels, lengths, mask, width):
            rng, new_rng = jax.random.split(state.rng)

            def loss_fn(params):
                crops = rroi_align(images, rois, 32, width, 1.0)
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    crops, train=True, mutable=["batch_stats"],
                    method=OwnModel.ocr_forward)
                logp = jax.nn.log_softmax(out, axis=-1)
                return ctc_loss(logp, labels, lengths, roi_mask=mask), updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(
                grads=grads, batch_stats=updates["batch_stats"], rng=new_rng), loss

        @functools.partial(jax.jit, static_argnames=("width",))
        def infer(state, images, rois, width):
            crops = rroi_align(images, rois, 32, width, 1.0)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                crops, train=False, method=OwnModel.ocr_forward)
            return jnp.argmax(out, axis=-1)

        self._train_step = train_step
        self._infer = infer
        self._rng = np.random.default_rng(seed)

    def step(self, batch) -> float:
        """batch: fots.data.detection.DetectionBatch."""
        rois, labels, lengths, mask, width, _texts = build_gt_crop_batch(
            batch.gt_quads, batch.labels, self.codec,
            batch.images.shape[1:3], rng=self._rng)
        self.state, loss = self._train_step(
            self.state, jnp.asarray(batch.images), jnp.asarray(rois),
            jnp.asarray(labels), jnp.asarray(lengths), jnp.asarray(mask), width)
        return float(loss)

    def predict(self, batch):
        """Eval mode: returns (decoded_texts, gt_texts) for valid rois."""
        rois, labels, lengths, mask, width, gts = build_gt_crop_batch(
            batch.gt_quads, batch.labels, self.codec, batch.images.shape[1:3])
        ids = np.asarray(self._infer(self.state, jnp.asarray(batch.images),
                                     jnp.asarray(rois), width))
        texts = self.codec.decode_batch(ids)
        n = int(mask.sum())
        return texts[:n], gts


class FOTSRecognizerTrainer:
    """Trains the shared-backbone recognition branch on word crops:
    crop -> stem (1/4 features) -> recognition head -> CTC."""

    def __init__(self, codec: Optional[LabelCodec] = None, lr: float = 1e-4,
                 norm_height: int = 44, seed: int = 0):
        self.codec = codec or LabelCodec()
        self.norm_height = norm_height
        self.model = FOTSDetector(nclass=self.codec.num_classes)
        variables = init_detector(self.model, jax.random.PRNGKey(seed))
        self.state = OcrTrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            rng=jax.random.PRNGKey(seed + 1),
            tx=optax.adam(lr, b1=0.5, b2=0.999),
        )
        model = self.model

        def apply_logp(params, batch_stats, images, rng):
            feats = model.apply({"params": params, "batch_stats": batch_stats},
                                images, method=FOTSDetector.forward_features)
            logp = model.apply({"params": params, "batch_stats": batch_stats},
                               feats, train=True, rngs={"dropout": rng},
                               method=FOTSDetector.recognize)
            return logp, batch_stats

        self._step = _make_step(apply_logp)

    def step(self, batch: Dict) -> float:
        self.state, loss = self._step(
            self.state,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["labels"]),
            jnp.asarray(batch["label_lengths"]),
        )
        return float(loss)

    def predict_texts(self, images, beam: int = 0) -> list:
        feats = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(images), method=FOTSDetector.forward_features)
        logp = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            feats, train=False, method=FOTSDetector.recognize)
        if beam > 0:
            from fots.ops.ctc_decode import beam_decode_text

            lp = np.asarray(logp)
            return [beam_decode_text(lp[i], self.codec, beam_width=beam)
                    for i in range(lp.shape[0])]
        ids = np.asarray(jnp.argmax(logp, axis=-1))
        return self.codec.decode_batch(ids)


def build_gt_crop_batch(gt_quads, labels, codec: LabelCodec, im_hw,
                        rng=None, pooled_height: int = 32,
                        max_rois: int = 32, max_label: int = 64):
    """GT quads -> fixed-shape roi batch for image-crop recognition.

    Host part of the reference's ``process_crnn`` (src/utils.py:390-426):
    every non-'##' in-bounds GT quad becomes an rroi (with the reference's
    +-2px height jitter when ``rng`` given); labels are CTC-encoded.
    Returns (rois [R,6], labels [R,L], lengths [R], mask [R], width, texts)
    with width bucketed from the max aspect at ``pooled_height`` and
    ``texts`` the kept transcriptions (aligned with valid roi slots).
    """
    import math

    import numpy as np

    from fots.geometry import quads_to_rrois
    from fots.ops.rroi_align import width_bucket
    from fots.roirotate import TRAIN_STRIP_BUCKETS

    H, W = im_hw
    rois_list, texts = [], []
    for bid, (quads, lbs) in enumerate(zip(gt_quads, labels)):
        if len(quads) == 0:
            continue
        jitter = int(rng.integers(-2, 3)) if rng is not None else 0
        rr = quads_to_rrois(np.asarray(quads), bid, height_jitter=jitter)
        for gi in range(rr.shape[0]):
            txt = lbs[gi]
            if txt.startswith("##"):
                continue
            q = np.asarray(quads[gi])
            if q[:, 0].max() > W or q[:, 1].max() > H or q.min() < 0:
                continue
            if rr[gi, 3] <= 0 or rr[gi, 4] <= 0:
                continue
            rois_list.append(rr[gi])
            texts.append(txt)
    n = min(len(rois_list), max_rois)
    rois = np.zeros((max_rois, 6), np.float32)
    mask = np.zeros((max_rois,), np.float32)
    if n:
        rois[:n] = np.asarray(rois_list[:n], np.float32)
        mask[:n] = 1.0
        ratio = (rois[:n, 4] / np.maximum(rois[:n, 3], 1e-6)).max()
        width = width_bucket(int(math.ceil(pooled_height * float(ratio))),
                             buckets=TRAIN_STRIP_BUCKETS)
    else:
        width = width_bucket(pooled_height, buckets=TRAIN_STRIP_BUCKETS)
    rois[n:] = [0, 8.0, 8.0, 8.0, 8.0, 0.0]
    labels_mat, lengths = codec.encode_padded(texts[:n] + [""] * (max_rois - n),
                                              max_label)
    lengths[n:] = 0
    return rois, labels_mat, lengths, mask, int(width), texts[:n]


class CRNNTrainer:
    """Standalone CRNN trainer (32-px crops)."""

    def __init__(self, codec: Optional[LabelCodec] = None, lr: float = 1e-4,
                 seed: int = 0, input_width: int = 96):
        self.codec = codec or LabelCodec()
        self.model = CRNN(nclass=self.codec.num_classes)
        variables = self.model.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 32, input_width, 3)), train=False)
        self.state = OcrTrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            rng=jax.random.PRNGKey(seed + 1),
            tx=optax.adam(lr),
        )
        model = self.model

        def apply_logp(params, batch_stats, images, rng):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            return jax.nn.log_softmax(out, axis=-1), updates["batch_stats"]

        self._step = _make_step(apply_logp)

    def step(self, batch: Dict) -> float:
        self.state, loss = self._step(
            self.state,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["labels"]),
            jnp.asarray(batch["label_lengths"]),
        )
        return float(loss)

    def predict_texts(self, images, beam: int = 0) -> list:
        out = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(images), train=False)
        if beam > 0:
            from fots.ops.ctc_decode import beam_decode_text

            lp = np.asarray(jax.nn.log_softmax(out, axis=-1))
            return [beam_decode_text(lp[i], self.codec, beam_width=beam)
                    for i in range(lp.shape[0])]
        ids = np.asarray(jnp.argmax(out, axis=-1))
        return self.codec.decode_batch(ids)
