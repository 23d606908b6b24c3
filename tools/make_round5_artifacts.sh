#!/bin/bash
# Round-5 artifact reproduction: domain-shift measurement, mixed-domain
# fine-tune (the shipped snapshot), real-photo demo, serving sweep and
# profile.  Every dataset is deterministic from its seed; checkpoints
# train on the tunnel v5e (~40 min for the 4.5k-step fine-tune leg).
#
# Usage: tools/make_round5_artifacts.sh [BASE_CKPT]
#   BASE_CKPT: the step-20001 synthbig checkpoint dir/path to continue
#              from (default /tmp/synthbig_ckpt/step_20001; produced by
#              tools/make_synthbig_artifacts.sh's training run)
set -ex -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
BASE=${1:-/tmp/synthbig_ckpt/step_20001}
mkdir -p artifacts

# --- datasets (deterministic; gitignored scenes) ---
[ -f data/synth_big/img_000.jpg ] || \
  python tools/make_synth_dataset.py --out data/synth_big --n 128 --n_eval 16 --seed 7
[ -f data/synth_shift/img_000.jpg ] || \
  python tools/make_synth_dataset.py --out data/synth_shift --n 16 --n_eval 16 --seed 11 --domain_shift
[ -f data/synth_shift_train/img_000.jpg ] || \
  python tools/make_synth_dataset.py --out data/synth_shift_train --n 112 --n_eval 0 --seed 21 --domain_shift
# (data/synth_mix_train.txt = synth_big_train.txt + the 112 shift-train
# scenes, committed; synth_cross_train seed 31 --crossed for the
# step-33500 continuation, list data/synth_mix2_train.txt)

# --- the BEFORE leg: step-20001 on the shifted eval ---
python -m fots.cli.eval_e2e -model "$BASE" \
  -images_list data/synth_shift_eval.txt \
  -out_json artifacts/synthbig_domainshift_metrics.json \
  -dump_json artifacts/synthbig_domainshift_detections.json
python -m fots.cli.eval_e2e -model "$BASE" -serve_hw 704x1280 \
  -images_list data/synth_shift_eval.txt \
  -out_json artifacts/synthbig_domainshift_metrics_serve704.json

# --- mixed-domain fine-tune -> the SHIPPED snapshot (step 24500) ---
python -m fots.cli.train_joint -train_list data/synth_mix_train.txt \
  -batch_size 8 -input_size 512 -base_lr 3e-4 -max_iters 24500 \
  -model "$BASE" -save_path /tmp/shift_ft -checkpoint_every 1500 \
  -num_readers 3 -disp_interval 100
python tools/export_serving_params.py /tmp/shift_ft artifacts/serving_params.npz

# --- the AFTER legs ---
python -m fots.cli.eval_e2e -model artifacts/serving_params.npz \
  -images_list data/synth_shift_eval.txt \
  -out_json artifacts/synthbig_domainshift_finetuned_metrics.json
python -m fots.cli.eval_e2e -model artifacts/serving_params.npz -serve_hw 704x1280 \
  -images_list data/synth_shift_eval.txt \
  -out_json artifacts/synthbig_domainshift_finetuned_metrics_serve704.json
python -m fots.cli.eval_e2e -model artifacts/serving_params.npz \
  -images_list data/synth_big_eval.txt \
  -out_json artifacts/synthbig_heldout_metrics_step24500.json

# --- real-photo demo (no GT; overlays + per-image JSON) ---
python tools/make_realphoto_demo.py

# --- serving sweep (throughput x accuracy) + stage/roofline profile ---
python tools/sweep_serving.py --ckpt artifacts/serving_params.npz
python tools/profile_serving.py --batches 3 > artifacts/serving_profile_trained.json

# --- real-pipeline training throughput ---
python tools/profile_train_pipeline.py --steps 100 > artifacts/train_pipeline_profile.json
