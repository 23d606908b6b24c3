"""CRNN recognizer: VGG-ish conv trunk + 2-layer bidirectional LSTM + CTC.

Re-design of the reference ``CRNN`` / ``OwnModel.ocr_forward``
(tools/models.py:795-907): 7 convs collapse a 32-px-high strip to height 1,
then two stacked BiLSTMs produce per-frame class scores.

TPU notes: the LSTM scan runs over the width axis with `nn.RNN`
(lax.scan under jit — no Python-loop unrolling); all shapes are static per
width bucket.  Height must be 32 (as the reference asserts h==1 after the
trunk, models.py:901).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from fots.models.layers import conv, max_pool


class BiLSTM(nn.Module):
    """Bidirectional LSTM + linear embedding (reference models.py:17-33)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")(x)
        y = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, name="embedding")(y)


class CRNN(nn.Module):
    """Conv trunk (reference models.py:879-891) + 2x BiLSTM (models.py:894-896).

    Input [B, 32, W, 3]; output [B, W', nclass] raw scores (the reference
    feeds raw scores to warp-ctc; apply log_softmax for the JAX CTC loss).
    """

    nclass: int = 7500
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(conv(64, (3, 3), 1, bias=True, name="conv0")(x))
        x = max_pool(x, (2, 2), (2, 2))                       # 16 x W/2
        x = nn.relu(conv(128, (3, 3), 1, bias=True, name="conv1")(x))
        x = max_pool(x, (2, 2), (2, 2))                       # 8 x W/4
        x = conv(256, (3, 3), 1, bias=True, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.relu(x)
        x = nn.relu(conv(256, (3, 3), 1, bias=True, name="conv3")(x))
        # (2,2) pool, stride (2,1), pad (0,1): height halves, width keeps
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = max_pool(x, (2, 2), (2, 1))                       # 4 x W/4+1
        x = conv(512, (3, 3), 1, bias=True, name="conv4")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn4")(x)
        x = nn.relu(x)
        x = nn.relu(conv(512, (3, 3), 1, bias=True, name="conv5")(x))
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = max_pool(x, (2, 2), (2, 1))                       # 2 x ...
        x = conv(512, (2, 2), 1, bias=True, padding="VALID", name="conv6")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn6")(x)
        x = nn.relu(x)                                        # 1 x W'
        x = jnp.squeeze(x, axis=1)                            # [B, W', 512]
        x = BiLSTM(self.hidden, self.hidden, name="rnn0")(x)
        x = BiLSTM(self.hidden, self.nclass, name="rnn1")(x)
        return x
