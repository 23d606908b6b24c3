"""Ground-truth annotation parsing (host side, NumPy).

Supports the two formats the reference consumes:
- MLT format (reference tools/data_gen.py:39-87): space-separated
  ``cls cx cy w h angle text`` with center/size normalized by image
  diagonal, decoded through cv2.boxPoints;
- ICDAR-style (reference tools/data_gen.py:91-139): comma-separated 8
  absolute corner coords (+ optional class column) + transcription; for
  ICDAR2015 files the corner order is rolled by one point.

Ignore tags: text '*' or starting with '###'.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence, Tuple

import cv2
import numpy as np


def parse_mlt_lines(lines: Sequence[str], im_shape) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    polys, tags, labels = [], [], []
    norm = math.sqrt(im_shape[0] ** 2 + im_shape[1] ** 2)
    for line in lines:
        line = line.replace("﻿", "").strip()
        if not line:
            continue
        s = line.split(" ")
        cls, x, y, w, h, angle = map(float, s[:6])
        del cls
        if angle < -50:  # parity: reference clamps wild angles (data_gen.py:61-63)
            angle = 0.0
        rect = ((x * im_shape[1], y * im_shape[0]), (w * norm, h * norm), angle * 180 / math.pi)
        pts = cv2.boxPoints(rect).reshape(4, 2)
        text = " ".join(s[6:]).strip()
        polys.append(pts)
        labels.append(text)
        tags.append(text == "*" or text.startswith("###"))
    return _pack(polys, tags, labels)


def parse_icdar_lines(lines: Sequence[str], roll_icdar: bool) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    polys, tags, labels = [], [], []
    for line in lines:
        line = line.replace("﻿", "").strip()
        if not line:
            continue
        s = line.split(",")
        # icdar: 8 coords then text; MLT-done: 8 coords, class, text
        rs = 8 if roll_icdar else 9
        text = ",".join(s[rs:]).strip()
        pts = np.asarray(list(map(float, s[:8])))
        if roll_icdar:
            pts = np.roll(pts, 2)
        polys.append(pts.reshape(4, 2))
        labels.append(text)
        tags.append(text == "*" or text.startswith("###"))
    return _pack(polys, tags, labels)


def _pack(polys, tags, labels):
    if polys:
        return (
            np.asarray(polys, dtype=np.float64),
            np.asarray(tags, dtype=bool),
            labels,
        )
    return np.zeros((0, 4, 2), np.float64), np.zeros((0,), bool), []


def gt_path_for_image(im_name: str) -> Tuple[str, str]:
    """Candidate annotation paths (reference data_gen.py:613-615):
    ``<img>.txt`` next to the image and ``gt_<img>.txt``."""
    base, _ext = os.path.splitext(im_name)
    txt_fn = base + ".txt"
    txt_fn_gt = os.path.join(os.path.dirname(im_name), "gt_" + os.path.basename(txt_fn))
    return txt_fn, txt_fn_gt


def load_annotation(im_name: str, im_shape) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Load GT for an image, auto-detecting format like the reference
    generator (data_gen.py:621-634): gt_-prefixed comma files (with the
    ICDAR2015 corner roll for icdar-2015 paths), else space-separated MLT."""
    txt_fn, txt_fn_gt = gt_path_for_image(im_name)
    if os.path.exists(txt_fn_gt):
        with open(txt_fn_gt, "r", encoding="utf-8") as f:
            lines = f.readlines()
        is_icdar = "icdar-2015" in txt_fn_gt.lower()
        return parse_icdar_lines(lines, roll_icdar=is_icdar)
    if os.path.exists(txt_fn):
        with open(txt_fn, "r", encoding="utf-8") as f:
            lines = f.readlines()
        first = lines[0] if lines else ""
        if "," in first.split(" ")[0]:
            return parse_icdar_lines(lines, roll_icdar=False)
        return parse_mlt_lines(lines, im_shape)
    return _pack([], [], [])


def load_image_list(list_path: str) -> List[str]:
    """Image list file -> absolute paths (reference data_gen.py:24-37)."""
    base_dir = os.path.dirname(list_path)
    out = []
    with open(list_path) as f:
        for x in f.readlines():
            x = x.strip()
            if not x:
                continue
            if not x.startswith("/"):
                x = os.path.join(base_dir, x)
            out.append(x)
    return out
