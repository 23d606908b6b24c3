"""OwnModel: the full detector plus a CRNN recognition head.

Equivalent of the reference ``OwnModel`` (tools/models.py:795-850): the
shared-backbone detector with an additional CRNN (conv trunk + BiLSTM)
branch used on RoIRotated *image* crops (the process_crnn path,
src/utils.py:390-478).
"""

from __future__ import annotations

import flax.linen as nn

from fots.models.crnn import CRNN
from fots.models.detector import FOTSDetector


class OwnModel(nn.Module):
    nclass: int = 87
    attention: bool = True
    multi_scale: bool = True

    def setup(self):
        self.detector = FOTSDetector(
            nclass=self.nclass, attention=self.attention,
            multi_scale=self.multi_scale, name="detector")
        self.crnn = CRNN(nclass=self.nclass, name="crnn")

    def __call__(self, images, train: bool = False):
        return self.detector(images, train=train)

    def ocr_forward(self, crops, train: bool = False):
        """CRNN branch over [N, 32, W, 3] RoIRotated image crops
        (reference models.py:840-850)."""
        return self.crnn(crops, train=train)

    def recognize(self, strips, train: bool = False):
        return self.detector.recognize(strips, train=train)


def init_own_model(model: OwnModel, rng, image_shape=(1, 64, 64, 3),
                   crop_shape=(1, 32, 64, 3)):
    import jax.numpy as jnp

    def touch_all(m, images, crops):
        out = m(images, train=False)
        m.ocr_forward(crops, train=False)
        return out

    return model.init(rng, jnp.zeros(image_shape), jnp.zeros(crop_shape),
                      method=touch_all)
