"""Shared test fixtures: synthetic text images with ICDAR-format GT."""

import os

import cv2
import numpy as np


def make_text_image(path, words, size=(256, 256)):
    """Render words on an image; returns [N,4,2] quads (p0=tl, p1=bl, p2=br,
    p3=tr order matching the reference's rolled ICDAR convention)."""
    im = np.full((size[0], size[1], 3), 32, np.uint8)
    quads = []
    for i, w in enumerate(words):
        x, y = 20, 40 + i * 50
        cv2.putText(im, w, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2)
        (tw, th), _ = cv2.getTextSize(w, cv2.FONT_HERSHEY_SIMPLEX, 1.0, 2)
        # corner order: the reference rolls icdar (tl,tr,br,bl) by 2 ->
        # (br,bl,tl,tr)... empirically generate_rbox expects
        # [p0,p1,p2,p3] with p0->p1 the left short edge
        quads.append([[x, y - th], [x, y + 5], [x + tw, y + 5], [x + tw, y - th]])
    cv2.imwrite(path, im)
    return np.asarray(quads, np.float64)


def write_icdar_dataset(tmpdir, n_images=2, words=("HELLO", "WORLD")):
    """Create images + gt files + list file; returns list path."""
    paths = []
    for i in range(n_images):
        img_path = os.path.join(tmpdir, f"img_{i}.jpg")
        quads = make_text_image(img_path, words)
        gt_path = os.path.join(tmpdir, f"gt_img_{i}.txt")
        # MLT-'done' format: 8 coords, class column, text (no corner roll)
        with open(gt_path, "w") as f:
            for q, w in zip(quads, words):
                flat = ",".join(str(int(v)) for v in q.reshape(-1))
                f.write(f"{flat},1,{w}\n")
        paths.append(img_path)
    list_path = os.path.join(tmpdir, "list.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(paths))
    return list_path
