"""E2E inference CLI: detect + recognize over a folder of images.

Mirrors the reference test.py (44-131): loads a checkpoint, runs the fused
pipeline per image, draws boxes + text overlays, writes annotated images
and a per-image .txt of ``x1,y1,...,x4,y4,score,text`` rows.

Usage:
  python -m fots.cli.detect -model backup/step_100 -test_folder imgs/ -output out/
  python -m fots.cli.detect -h5 weights/FOTS_280000.h5 ...   (torch import)
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np


def load_engine(model_path=None, h5_path=None, nclass=87, segm_thresh=0.5,
                mixed_precision=False, n_data=None, n_model=1,
                expand_w_frac=0.0, masked_norm=None, beam=0):
    """masked_norm None = auto: read save_path/train_config.json written by
    fots.cli.train_joint next to the checkpoint, or — for a `.npz` serving
    snapshot — the config embedded in the archive by
    tools/export_serving_params.py (one read serves both weights and
    config)."""
    import jax

    from fots.checkpoint import (import_torch_state_dict, latest_checkpoint,
                                 load_torch_h5, restore_checkpoint)
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.pipeline import FOTSInference

    model = FOTSDetector(nclass=nclass)
    variables = init_detector(model, jax.random.PRNGKey(0))
    if h5_path:
        sd = load_torch_h5(h5_path)
        variables, imported, skipped = import_torch_state_dict(sd, dict(variables))
        print(f"imported {len(imported)} tensors from {h5_path} "
              f"({len(skipped)} skipped)")
    elif (model_path and model_path.endswith(".npz")
          and os.path.isfile(model_path)):
        # committed serving snapshot (tools/export_serving_params.py) —
        # the in-repo analog of the reference's published .h5 weights
        from fots.checkpoint import load_serving_params

        variables, step, snap_cfg = load_serving_params(
            model_path, dict(variables), with_config=True)
        print(f"loaded serving snapshot {model_path} (step {step})")
        if masked_norm is None:
            masked_norm = snap_cfg.get("masked_norm", False)
    elif model_path:
        from fots.train import Trainer

        path = model_path
        if os.path.isdir(path) and latest_checkpoint(path):
            path = latest_checkpoint(path)
        trainer = Trainer(model=model)
        state, step = restore_checkpoint(path, trainer.state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"restored checkpoint {path} (step {step})")
        if masked_norm is None:
            import json

            cfg = os.path.join(os.path.dirname(os.path.abspath(path)),
                               "train_config.json")
            if os.path.exists(cfg):
                with open(cfg) as f:
                    masked_norm = json.load(f).get("masked_norm", False)
    mesh = None
    if n_data is not None and n_data > 1:
        from fots.parallel import make_mesh
        mesh = make_mesh(n_data=n_data, n_model=n_model)
    return FOTSInference(model, dict(variables), segm_thresh=segm_thresh,
                         mixed_precision=mixed_precision, mesh=mesh,
                         expand_w_frac=expand_w_frac,
                         masked_norm=bool(masked_norm), beam=beam)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-model", default=None, help="orbax checkpoint dir/path")
    parser.add_argument("-h5", default=None, help="reference torch .h5 weights")
    parser.add_argument("-segm_thresh", type=float, default=0.5)
    parser.add_argument("-test_folder", default="/root/reference/data/example_image/")
    parser.add_argument("-output", default="./out")
    parser.add_argument("-scale_up", action="store_true")
    parser.add_argument("-split_words", action="store_true",
                        help="split multi-word lines into word boxes")
    args = parser.parse_args(argv)

    engine = load_engine(args.model, args.h5, segm_thresh=args.segm_thresh)
    os.makedirs(args.output, exist_ok=True)

    paths = sorted(glob.glob(os.path.join(os.path.realpath(args.test_folder), "*.jpg")))
    for path in paths:
        im = cv2.imread(path)
        if im is None:
            continue
        results, im_resized = engine(im, scale_up=args.scale_up,
                                     split_words=args.split_words)
        draw = im_resized.copy()
        lines = []
        for r in results:
            b = r["box"]
            pts = b[:8].reshape(4, 2).astype(np.int32)
            cv2.polylines(draw, [pts], True, (0, 255, 0), 1)
            cv2.putText(draw, r["text"], (int(b[0]), int(b[1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            coords = ",".join(f"{v:.1f}" for v in b[:8])
            lines.append(f"{coords},{b[8]:.3f},{r['text']}")
            print(r["text"])
        base = os.path.basename(path)
        cv2.imwrite(os.path.join(args.output, base), draw)
        with open(os.path.join(args.output, os.path.splitext(base)[0] + ".txt"), "w") as f:
            f.write("\n".join(lines))
        print(f"{base}: {len(results)} boxes")


if __name__ == "__main__":
    main()
