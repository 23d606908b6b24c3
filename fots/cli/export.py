"""Export the serving programs to a portable StableHLO bundle.

Serializes the detect + per-bucket recognize programs (jax.export) plus
weights into a directory that a slim runtime (fots host modules, no model
code) serves via fots.export.ExportedEngine — see docs/MIGRATION.md and
fots/export.py.  The reference has no deployment format at all; serving
it means shipping torch + building its CUDA/C++ extensions on every box.

Usage:
  python -m fots.cli.export -model backup/ -out bundle/ \
      -batch 16 -height 704 -width 1280
  # verify the bundle against the in-process engine on sample images:
  python -m fots.cli.export -model backup/ -out bundle/ -selftest imgs/
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-model", default=None, help="orbax checkpoint")
    parser.add_argument("-h5", default=None, help="torch .h5 weights")
    parser.add_argument("-out", required=True, help="bundle directory")
    parser.add_argument("-batch", type=int, default=16)
    parser.add_argument("-height", type=int, default=704)
    parser.add_argument("-width", type=int, default=1280)
    parser.add_argument("-segm_thresh", type=float, default=0.5)
    parser.add_argument("-max_candidates", type=int, default=1024)
    parser.add_argument("-max_boxes", type=int, default=None,
                        help="per-image recognition cap baked into the "
                             "bundle manifest")
    parser.add_argument("-roi_pad", type=int, default=32)
    parser.add_argument("-platforms", default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("-mixed_precision", action="store_true", default=True)
    parser.add_argument("-f32", dest="mixed_precision", action="store_false")
    parser.add_argument("-selftest", default=None, metavar="IMG_DIR",
                        help="after exporting, reload the bundle and check "
                             "results match the in-process engine on the "
                             "first batch of *.jpg in IMG_DIR")
    args = parser.parse_args(argv)

    from fots.cli.detect import load_engine
    from fots.export import export_serving

    engine = load_engine(args.model, args.h5, segm_thresh=args.segm_thresh,
                         mixed_precision=args.mixed_precision)
    engine.max_candidates = args.max_candidates
    engine.max_boxes = args.max_boxes
    manifest = export_serving(engine, args.out, batch=args.batch,
                              height=args.height, width=args.width,
                              roi_pad=args.roi_pad,
                              platforms=tuple(args.platforms.split(",")))
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in os.listdir(args.out))
    print(f"exported {len(manifest['programs'])} programs "
          f"(buckets {manifest['strip_buckets']}) + params to {args.out} "
          f"({total / 1e6:.1f} MB) for platforms {manifest['platforms']}")

    if args.selftest:
        import cv2
        import numpy as np

        from fots.export import ExportedEngine

        paths = sorted(glob.glob(os.path.join(args.selftest, "*.jpg")))
        images = [im for im in (cv2.imread(p) for p in paths[: args.batch])
                  if im is not None]
        if not images:
            raise SystemExit(f"selftest: no readable *.jpg in {args.selftest}")
        exported = ExportedEngine(args.out)
        got = exported.batch_call(images)
        want = engine.batch_call(images, serve_hw=(args.height, args.width))
        n_boxes = 0
        for g_img, w_img in zip(got, want):
            assert len(g_img) == len(w_img), "result count mismatch"
            for g, w in zip(g_img, w_img):
                assert g["text"] == w["text"], (g["text"], w["text"])
                np.testing.assert_allclose(g["box"], w["box"], atol=1e-4)
                n_boxes += 1
        print(f"selftest ok: {n_boxes} boxes identical across "
              f"{len(images)} images")


if __name__ == "__main__":
    main()
