#!/bin/bash
# Round-2 accuracy artifacts: proves train -> checkpoint -> eval end-to-end
# through the real CLI loop (VERDICT r1 item 5).
#
# 1. joint overfit checkpoint (produced by fots.cli.train_joint on
#    data/overfit_icdar2015.txt) -> eval_e2e on the training image:
#    detection + e2e P/R/hmean JSON + per-image detection dump.
# 2. recognition overfit checkpoint (fots.cli.train_ocr on MLT_CROPS)
#    -> eval_ocr accuracy/CER JSON.
#
# Usage: tools/make_accuracy_artifacts.sh [JOINT_CKPT] [OCR_CKPT]
set -ex
cd "$(dirname "$0")/.."
# prepend repo root WITHOUT clobbering the axon sitecustomize dir already on
# PYTHONPATH (it registers the TPU backend; replacing the var kills the TPU)
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
JOINT=${1:-/tmp/overfit_ckpt/step_9400}
OCR=${2:-}
mkdir -p artifacts

python -m fots.cli.eval_e2e -model "$JOINT" \
  -images_list data/overfit_icdar2015.txt \
  -out_json artifacts/overfit_e2e_metrics.json \
  -dump_json artifacts/overfit_e2e_detections.json \
  | tail -5 > artifacts/overfit_e2e_stdout.txt

# overlay image for visual inspection
python -m fots.cli.detect -model "$JOINT" \
  -test_folder "$(dirname "$(head -1 data/overfit_icdar2015.txt)")" \
  -output artifacts/overfit_overlays

if [ -n "$OCR" ]; then
  python -m fots.cli.eval_ocr -arch fots -model "$OCR" \
    -train_list /root/reference/sample_train_data/MLT_CROPS/gt.txt \
    -norm_height 44 > artifacts/overfit_ocr_metrics.json
fi
