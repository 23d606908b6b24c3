#!/bin/bash
# Round-3 held-out accuracy artifacts, LARGE train set: 114 images
# (112 synth + img_784 + img_5407) -> eval on 16 DISJOINT synth scenes.
# Successor of make_heldout_artifacts.sh (13-image train set), where the
# train->heldout gap was recognition generalization from too little data.
#
# Usage: tools/make_synthbig_artifacts.sh [CKPT]
set -ex -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
CKPT=${1:-/tmp/synthbig_ckpt}
mkdir -p artifacts

# the dataset is deterministic from its seed and not committed (16 MB)
[ -f data/synth_big/img_000.jpg ] || \
  python tools/make_synth_dataset.py --out data/synth_big --n 128 --n_eval 16 --seed 7

python -m fots.cli.eval_e2e -model "$CKPT" \
  -images_list data/synth_big_eval.txt \
  -out_json artifacts/synthbig_heldout_metrics.json \
  -dump_json artifacts/synthbig_heldout_detections.json \
  | tail -5 > artifacts/synthbig_stdout.txt

# training-set metrics with the same checkpoint (overfit-vs-heldout gap)
python -m fots.cli.eval_e2e -model "$CKPT" \
  -images_list data/synth_big_train.txt \
  -out_json artifacts/synthbig_trainset_metrics.json \
  | tail -3 >> artifacts/synthbig_stdout.txt

# held-out through the production serving path (704x1280 letterbox — the
# bench headline config; upscales these 640x960 scenes ~1.1x, which the
# recognizer measurably prefers: see artifacts/serving_sweep.json)
python -m fots.cli.eval_e2e -model "$CKPT" -serve_hw 704x1280 \
  -images_list data/synth_big_eval.txt \
  -out_json artifacts/synthbig_heldout_metrics_serve704.json \
  | tail -3 >> artifacts/synthbig_stdout.txt

# overlays on the held-out scenes for visual inspection
EVAL_DIR=$(mktemp -d)
while read -r im; do cp "$im" "$EVAL_DIR/"; done < data/synth_big_eval.txt
python -m fots.cli.detect -model "$CKPT" \
  -test_folder "$EVAL_DIR" \
  -output artifacts/synthbig_overlays
rm -rf "$EVAL_DIR"
