"""Export a trained orbax checkpoint to the committed serving snapshot.

Usage: python tools/export_serving_params.py CKPT_DIR [OUT_NPZ]

Reads the latest step_N under CKPT_DIR (full TrainState: params +
batch_stats + Adam moments) and writes the params+batch_stats-only .npz
that bench.py / tools/profile_serving.py serve when present
(artifacts/serving_params.npz, ~25 MB — committable, unlike the 3x
orbax state).
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fots.checkpoint import (latest_checkpoint, restore_checkpoint,
                                 save_serving_params)
    from fots.codec import LabelCodec
    from fots.models import FOTSDetector
    from fots.train import Trainer

    import json
    import os

    ckpt_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "artifacts/serving_params.npz"
    path = latest_checkpoint(ckpt_dir) or ckpt_dir
    codec = LabelCodec()
    trainer = Trainer(model=FOTSDetector(nclass=codec.num_classes),
                      codec=codec)
    state, step = restore_checkpoint(path, trainer.state)
    # embed the serving-relevant train config (train_joint's sidecar) so
    # `-model snapshot.npz` picks masked_norm etc. automatically
    config = {}
    for d in (ckpt_dir, os.path.dirname(os.path.abspath(path))):
        cfg = os.path.join(d, "train_config.json")
        if os.path.exists(cfg):
            with open(cfg) as f:
                config = json.load(f)
            break
    else:
        # An empty embedded config makes `-model snapshot.npz` resolve
        # masked_norm=False at load time — silently wrong for a
        # masked-norm-trained checkpoint whose sidecar was moved/stripped.
        print("WARNING: no train_config.json found next to the checkpoint; "
              "embedding an EMPTY config (masked_norm etc. will default "
              "off at serve time)", file=sys.stderr)
    save_serving_params(
        out,
        {"params": state.params, "batch_stats": state.batch_stats},
        step=step, config=config)
    print(f"wrote {out} from {path} (step {step}, config {config})")


if __name__ == "__main__":
    main()
