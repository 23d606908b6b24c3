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

        grads, (new_stats, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        loss, _aux = loss_fn(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats,
                                          rng=new_rng)
        return new_state, loss

    return step


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

    def predict_texts(self, images) -> list:
        feats = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(images), method=FOTSDetector.forward_features)
        logp = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            feats, train=False, method=FOTSDetector.recognize)
        ids = np.asarray(jnp.argmax(logp, axis=-1))
        return self.codec.decode_batch(ids)


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

    def predict_texts(self, images) -> list:
        out = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(images), train=False)
        ids = np.asarray(jnp.argmax(out, axis=-1))
        return self.codec.decode_batch(ids)
