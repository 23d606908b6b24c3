"""Joint detection+recognition training CLI (mirrors reference train.py).

Usage:
  python -m fots.cli.train_joint -train_list data/ICDAR2015.txt \
      -batch_size 2 -input_size 512 -max_iters 300000 -save_path backup
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-train_list", default="./data/ICDAR2015.txt")
    parser.add_argument("-save_path", default="backup")
    parser.add_argument("-model", default=None, help="orbax checkpoint to resume")
    parser.add_argument("-h5", default=None, help="torch .h5 warm start")
    parser.add_argument("-batch_size", type=int, default=2)
    parser.add_argument("-num_readers", type=int, default=4)
    parser.add_argument("-input_size", type=int, default=512)
    parser.add_argument("-base_lr", type=float, default=1e-3)
    parser.add_argument("-max_iters", type=int, default=300000)
    parser.add_argument("-disp_interval", type=int, default=5)
    parser.add_argument("-checkpoint_every", type=int, default=10000)
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-n_data", type=int, default=None, help="data-parallel mesh size")
    parser.add_argument("-n_model", type=int, default=1, help="tensor-parallel mesh size")
    parser.add_argument("-gt_rois_only", action="store_true",
                        help="skip predicted-roi sampling (early-training mode)")
    parser.add_argument("-geo_type", type=int, default=0,
                        help="0=edge-distance targets, 1=row/col-scan variant")
    parser.add_argument("-no_aug", action="store_true",
                        help="disable augmentation (deterministic full-image "
                             "samples; use with -input_size -1 for "
                             "overfit/memorization runs)")
    parser.add_argument("-ohem", action="store_true",
                        help="OHEM score loss (FOTS paper) instead of dice")
    parser.add_argument("-no_masked_norm", action="store_true",
                        help="legacy mode: whole-strip InstanceNorm stats "
                             "(pre-round-3 checkpoints).  Default is masked "
                             "bucket-width-invariant InstanceNorm so serving "
                             "uses the fine bucket grid; the choice is "
                             "recorded in save_path/train_config.json")
    parser.add_argument("-debug", default=None, metavar="DIR",
                        help="dump sampled roi crops to DIR (reference "
                             "data/tshow debug hook, ocr_process.py:224-249)")
    parser.add_argument("-debug_every", type=int, default=1000)
    args = parser.parse_args(argv)

    from fots.checkpoint import (import_torch_state_dict, load_torch_h5,
                                 restore_checkpoint)
    from fots.codec import LabelCodec
    from fots.data.detection import detection_batches
    from fots.models import FOTSDetector
    from fots.parallel import make_mesh
    from fots.train import Trainer

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    n_data = args.n_data
    if n_data is None:
        # default data-parallel width: largest device count that divides
        # the batch (a small batch on a big host mesh must not error)
        import jax

        avail = max(1, len(jax.devices()) // max(1, args.n_model))
        n_data = 1
        for d in range(1, avail + 1):
            if args.batch_size % d == 0:
                n_data = d
    mesh = make_mesh(n_data=n_data, n_model=args.n_model)
    trainer = Trainer(
        model=model,
        codec=codec,
        learning_rate=args.base_lr,
        # init shape is arbitrary for the fully-conv model; the step fn
        # takes the true H,W per batch (native-size mode passes -1 here)
        input_size=args.input_size if args.input_size > 0 else 512,
        seed=args.seed,
        mesh=mesh,
        use_predicted_rois=not args.gt_rois_only,
        ohem=args.ohem,
        masked_norm=not args.no_masked_norm,
    )
    # sidecar read by fots.cli.detect.load_engine so eval/serve pick the
    # matching normalization + bucket grid automatically
    os.makedirs(args.save_path, exist_ok=True)
    import json

    with open(os.path.join(args.save_path, "train_config.json"), "w") as f:
        json.dump({"masked_norm": not args.no_masked_norm}, f)

    if args.h5 and os.path.exists(args.h5):
        sd = load_torch_h5(args.h5)
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        # partial warm start skipping the vocab head (reference train.py:50)
        new_vars, imported, _ = import_torch_state_dict(
            sd, variables, skip_substrings=("conv11", "rnn"))
        trainer.state = trainer.state.replace(
            params=new_vars["params"], batch_stats=new_vars["batch_stats"])
        print(f"warm-started {len(imported)} tensors from {args.h5}")
    elif args.model:
        trainer.state, step = restore_checkpoint(args.model, trainer.state)
        print(f"resumed from {args.model} at step {step}")

    batches = detection_batches(
        args.train_list,
        num_workers=args.num_readers,
        input_size=args.input_size,
        batch_size=args.batch_size,
        seed=args.seed,
        geo_type=args.geo_type,
        augment=not args.no_aug,
    )
    try:
        trainer.train(
            batches,
            max_steps=args.max_iters,
            log_every=args.disp_interval,
            checkpoint_dir=args.save_path,
            checkpoint_every=args.checkpoint_every,
            debug_dir=args.debug,
            debug_every=args.debug_every,
        )
    finally:
        batches.stop()


if __name__ == "__main__":
    main()
