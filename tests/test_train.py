"""Training smoke: one compiled step, loss decreases on a repeated batch,
checkpoints round-trip."""

import numpy as np
import pytest

import jax

from fots.codec import LabelCodec
from fots.data.detection import detection_generator
from fots.models import FOTSDetector
from fots.parallel import make_mesh
from fots.train import Trainer
from tests.helpers import write_icdar_dataset


@pytest.fixture(scope="module")
def trainer_and_batch(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("data")
    list_path = write_icdar_dataset(str(tmpdir), n_images=2)
    gen = detection_generator(list_path, input_size=128, batch_size=2, seed=1,
                              in_train=True)
    batch = next(gen)
    model = FOTSDetector(nclass=87)
    trainer = Trainer(model=model, codec=LabelCodec(), input_size=128,
                      mesh=make_mesh(n_data=2), seed=0)
    return trainer, batch


def test_overfit_single_batch(trainer_and_batch):
    trainer, batch = trainer_and_batch
    losses = [trainer.step(batch)["loss"] for _ in range(6)]
    assert all(np.isfinite(l) for l in losses)
    # overfitting one batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_predicted_maps_pipelined(trainer_and_batch):
    trainer, batch = trainer_and_batch
    trainer.step(batch)
    assert trainer._prev_maps is not None
    assert trainer._prev_maps["segm"].shape == batch.score_maps.shape


def test_checkpoint_roundtrip(trainer_and_batch, tmp_path):
    from fots.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint

    trainer, batch = trainer_and_batch
    path = save_checkpoint(str(tmp_path / "ckpt"), trainer.state, 7)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path
    # restore into a fresh state
    model = FOTSDetector(nclass=87)
    fresh = Trainer(model=model, input_size=128, mesh=make_mesh(n_data=2), seed=99)
    restored, step = restore_checkpoint(path, fresh.state)
    assert step == 7
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
