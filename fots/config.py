"""Single dataclass config with per-workload presets.

Replaces the reference's scattered argparse defaults + module constants
(train.py:146-160, src/ocr_process.py:39-45, absolute paths in
train_crnn.py:103-104).  Presets mirror the five BASELINE.json workloads.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple


@dataclass
class Config:
    # model
    nclass: int = 87                  # len(ICDAR15 alphabet)+1 (train.py:33)
    attention: bool = True
    multi_scale: bool = True

    # training (reference train.py:146-160)
    train_list: str = "./data/ICDAR2015.txt"
    batch_size: int = 2
    input_size: int = 512
    base_lr: float = 1e-3
    max_iters: int = 300_000
    num_readers: int = 4
    disp_interval: int = 5
    checkpoint_every: int = 10_000
    save_path: str = "backup"
    resume: Optional[str] = None
    import_h5: Optional[str] = None   # warm start from reference weights
    import_skip: Tuple[str, ...] = ("conv11", "rnn")  # train.py:50
    seed: int = 0
    use_predicted_rois: bool = True
    ohem: bool = False                # FOTS-paper OHEM score loss (opt-in)
    geo_type: int = 0                 # 0=edge-distance, 1=row/col-scan targets

    # recognition-only training (reference tools/train_ocr.py)
    ocr_feed_list: str = "sample_train_data/MLT_CROPS/gt.txt"
    ocr_batch_size: int = 8
    norm_height: int = 32

    # inference / eval (reference test.py:44-56)
    model_path: Optional[str] = None
    segm_thresh: float = 0.5
    iou_th1: float = 0.4
    iou_th2: float = 0.2
    test_folder: str = "./data/example_image/"
    output: str = "./out"
    scale_up: bool = False
    eval_text_length: int = 3
    mixed_precision: bool = False     # bf16 backbone/recognizer at inference
    max_candidates: int = 8192        # on-device NMS candidate cap per image

    # mesh
    n_data: Optional[int] = None
    n_model: int = 1


PRESETS = {
    # BASELINE.json configs 1..5
    "roirotate_unit": Config(),
    "crnn_crops": Config(ocr_batch_size=8, norm_height=32),
    "detect_only": Config(segm_thresh=0.5),
    "e2e_inference": Config(),
    "joint_train": Config(batch_size=2, input_size=512),
}


def get_config(preset: str = "joint_train", **overrides) -> Config:
    cfg = PRESETS.get(preset, Config())
    return replace(cfg, **overrides)
