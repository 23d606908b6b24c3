"""Seeded synthetic annotated scene generator for train/held-out eval.

The container has exactly two annotated scene images
(/root/reference/sample_train_data/MLT: img_784 ICDAR-format, img_5407
MLT-format) — too few for a train/eval split.  This renders additional
scenes with EXACT ground truth in the MLT-done comma format the loader
auto-detects (fots/data/annotations.py:parse_icdar_lines, rs=9):
``x1,y1,...,y4,1,TEXT`` in a ``gt_<img>.txt`` sidecar.

Scenes: textured background (gradient + noise + clutter rectangles),
3-7 words of ICDAR-alphabet uppercase text, random scale and rotation in
[-25, 25] degrees, light blur.  Deterministic per (seed, index).

Usage:
  python tools/make_synth_dataset.py --out data/synth --n 16 [--seed 0]
writes img_000.jpg ... plus gt_img_000.txt and two list files:
  train.txt  (first  n - n_eval images)
  eval.txt   (last   n_eval images, default 4)
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = [
    "COFFEE", "EXIT", "OPEN", "MARKET", "STATION", "HOTEL", "TICKETS",
    "MUSEUM", "BAKERY", "PARKING", "CINEMA", "LIBRARY", "AIRPORT", "TAXI",
    "SALE", "BOOKS", "PIZZA", "GARDEN", "BRIDGE", "CENTRAL", "NORTH",
    "SOUTH", "RIVER", "TOWER", "PLAZA", "METRO", "BANK", "SCHOOL",
]


def render_word(rng, text, max_scale=2.2, font=cv2.FONT_HERSHEY_SIMPLEX):
    """Render one word on a tight canvas; returns (bgr, alpha) patches."""
    scale = float(rng.uniform(0.9, max_scale))
    thick = int(rng.integers(1, 3)) + (scale > 1.5)
    (tw, th), base = cv2.getTextSize(text, font, scale, thick)
    pad = 6
    canvas = np.zeros((th + base + 2 * pad, tw + 2 * pad), np.uint8)
    cv2.putText(canvas, text, (pad, pad + th), font,
                scale, 255, thick, cv2.LINE_AA)
    color = rng.integers(0, 255, 3)
    # keep strong contrast vs mid-gray backgrounds
    if np.abs(color.astype(int) - 128).sum() < 150:
        color = np.array([240, 240, 240]) if rng.uniform() < 0.5 else \
            np.array([15, 15, 15])
    bgr = np.zeros(canvas.shape + (3,), np.uint8)
    bgr[:] = color
    return bgr, canvas


def paste_rotated(rng, scene, bgr, alpha, angle_deg, cx, cy):
    """Rotate a word patch and alpha-blend it at (cx, cy); returns the GT
    quad [4,2] (clockwise from top-left of the unrotated patch)."""
    h, w = alpha.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, 1.0)
    cos, sin = abs(M[0, 0]), abs(M[0, 1])
    nw, nh = int(w * cos + h * sin) + 2, int(w * sin + h * cos) + 2
    M[0, 2] += nw / 2 - w / 2
    M[1, 2] += nh / 2 - h / 2
    bgr_r = cv2.warpAffine(bgr, M, (nw, nh))
    a_r = cv2.warpAffine(alpha, M, (nw, nh))
    x0, y0 = int(cx - nw / 2), int(cy - nh / 2)
    H, W = scene.shape[:2]
    if x0 < 0 or y0 < 0 or x0 + nw > W or y0 + nh > H:
        return None
    roi = scene[y0:y0 + nh, x0:x0 + nw]
    a = (a_r.astype(np.float32) / 255.0)[..., None]
    scene[y0:y0 + nh, x0:x0 + nw] = (
        roi * (1 - a) + bgr_r.astype(np.float32) * a).astype(np.uint8)
    # tight text quad in patch coords (inside the pad border), rotated
    pad = 6
    corners = np.array([[pad, pad], [w - pad, pad],
                        [w - pad, h - pad], [pad, h - pad]], np.float64)
    ones = np.hstack([corners, np.ones((4, 1))])
    quad = (M @ ones.T).T + np.array([x0, y0])
    # done-format corner convention: p0->p1 must be the SHORT edge (the
    # reference np.roll(pts,2)s ICDAR corners to get this, data_gen.py:135;
    # generate_rbox filters quads where |p1-p0| > |p2-p1| as vertical text)
    return np.roll(quad, 1, axis=0)


def photo_background(rng, size_hw, bg_images):
    """Random crop of a real photograph, resampled to the scene size.

    The crop is 0.5x down-up resampled + lightly blurred so pre-existing
    real-world text in the source photo degrades below the detector's
    min-height filter while the photographic texture (lighting, edges,
    clutter statistics the synthetic gradient background lacks) survives.
    Large storefront signage can still survive this; the domain-shift
    precision number is therefore a *lower bound* (unannotated real text
    found by the detector counts as a false positive).
    """
    H, W = size_hw
    im = bg_images[int(rng.integers(0, len(bg_images)))]
    h0, w0 = im.shape[:2]
    ch = int(rng.uniform(0.5, 1.0) * h0)
    cw = min(w0, max(int(ch * W / H), 32))
    y0 = int(rng.integers(0, h0 - ch + 1))
    x0 = int(rng.integers(0, w0 - cw + 1))
    crop = im[y0:y0 + ch, x0:x0 + cw]
    crop = cv2.resize(crop, (W // 2, H // 2), interpolation=cv2.INTER_AREA)
    crop = cv2.resize(crop, (W, H), interpolation=cv2.INTER_LINEAR)
    return cv2.GaussianBlur(crop, (3, 3), 0).astype(np.uint8)


def make_scene(seed, idx, size_hw=(640, 960), fonts=(cv2.FONT_HERSHEY_SIMPLEX,),
               bg_images=None, bg_mix=False):
    """bg_mix: with bg_images given, each scene flips a coin between the
    photo background and the synthetic gradient one (training-diversity
    mode; plain bg_images = always photo, the eval-set convention)."""
    rng = np.random.default_rng((seed, idx))
    H, W = size_hw
    use_photo = bool(bg_images) and (not bg_mix or rng.uniform() < 0.5)
    if use_photo:
        scene = photo_background(rng, size_hw, bg_images)
    else:
        # background: smooth gradient + noise + clutter
        gx = np.linspace(0, 1, W)[None, :]
        gy = np.linspace(0, 1, H)[:, None]
        c0 = rng.integers(40, 216, 3).astype(np.float32)
        c1 = rng.integers(40, 216, 3).astype(np.float32)
        scene = (c0[None, None] * (1 - (gx + gy) / 2)[..., None]
                 + c1[None, None] * ((gx + gy) / 2)[..., None])
        scene += rng.normal(0, 6, scene.shape)
        scene = np.clip(scene, 0, 255).astype(np.uint8)
        for _ in range(int(rng.integers(2, 6))):  # textureless clutter
            x0, y0 = int(rng.integers(0, W - 60)), int(rng.integers(0, H - 60))
            ww, hh = int(rng.integers(30, 200)), int(rng.integers(30, 200))
            col = tuple(int(v) for v in rng.integers(0, 255, 3))
            cv2.rectangle(scene, (x0, y0),
                          (min(x0 + ww, W - 1), min(y0 + hh, H - 1)), col, -1)
            scene[y0:y0 + 2] = np.clip(scene[y0:y0 + 2] * 0.7, 0, 255)

    quads, texts = [], []
    small = min(H, W) < 400
    n_words = int(rng.integers(2, 4)) if small else int(rng.integers(3, 8))
    max_scale = 1.1 if small else 2.2
    tries = 0
    while len(quads) < n_words and tries < 60:
        tries += 1
        text = WORDS[int(rng.integers(0, len(WORDS)))]
        font = fonts[int(rng.integers(0, len(fonts)))]
        bgr, alpha = render_word(rng, text, max_scale=max_scale, font=font)
        angle = float(rng.uniform(-25, 25))
        cx = float(rng.uniform(0.18 * W, 0.82 * W))
        cy = float(rng.uniform(0.12 * H, 0.88 * H))
        q = paste_rotated(rng, scene, bgr, alpha, angle, cx, cy)
        if q is None:
            continue
        # reject overlaps with prior words (axis-aligned test)
        x0, y0 = q[:, 0].min(), q[:, 1].min()
        x1, y1 = q[:, 0].max(), q[:, 1].max()
        clash = False
        for p in quads:
            px0, py0 = p[:, 0].min(), p[:, 1].min()
            px1, py1 = p[:, 0].max(), p[:, 1].max()
            if x0 < px1 and px0 < x1 and y0 < py1 and py0 < y1:
                clash = True
                break
        if clash:
            # word already drawn into the scene; mark it ignore ('###') so
            # targets stay consistent with the pixels
            quads.append(q)
            texts.append("###")
            continue
        quads.append(q)
        texts.append(text)
    if rng.uniform() < 0.5:
        scene = cv2.GaussianBlur(scene, (3, 3), 0)
    return scene, quads, texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/synth")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--n_eval", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 960),
                    metavar=("H", "W"))
    ap.add_argument("--domain_shift", action="store_true",
                    help="render an appearance-shifted EVAL set: Hershey "
                         "fonts the synth_big training set never used "
                         "(DUPLEX/TRIPLEX/COMPLEX/PLAIN vs its SIMPLEX) on "
                         "photographic backgrounds cropped from the "
                         "reference's 11 real ICDAR2015 example images — "
                         "turns the in-distribution caveat of "
                         "docs/ACCURACY.md into a measurement")
    ap.add_argument("--bg_dir", default="/root/reference/data/example_image",
                    help="photo source for --domain_shift backgrounds")
    ap.add_argument("--crossed", action="store_true",
                    help="training-diversity mode: ALL five Hershey font "
                         "families, and each scene flips between photo and "
                         "gradient backgrounds — the full cross of the "
                         "base and --domain_shift appearance axes")
    args = ap.parse_args()

    fonts = (cv2.FONT_HERSHEY_SIMPLEX,)
    bg_images = None
    if args.domain_shift or args.crossed:
        fonts = (cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_TRIPLEX,
                 cv2.FONT_HERSHEY_COMPLEX, cv2.FONT_HERSHEY_PLAIN)
        if args.crossed:
            fonts = fonts + (cv2.FONT_HERSHEY_SIMPLEX,)
        import glob

        bg_images = [cv2.imread(p) for p in
                     sorted(glob.glob(os.path.join(args.bg_dir, "*.jpg")))]
        bg_images = [im for im in bg_images if im is not None]
        if not bg_images:
            raise SystemExit(f"no background photos under {args.bg_dir}")

    os.makedirs(args.out, exist_ok=True)
    names = []
    for i in range(args.n):
        scene, quads, texts = make_scene(args.seed, i, tuple(args.size),
                                         fonts=fonts, bg_images=bg_images,
                                         bg_mix=args.crossed)
        name = f"img_{i:03d}"
        cv2.imwrite(os.path.join(args.out, name + ".jpg"), scene,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        with open(os.path.join(args.out, f"gt_{name}.txt"), "w") as f:
            for q, t in zip(quads, texts):
                coords = ",".join(str(int(round(v))) for v in q.reshape(8))
                f.write(f"{coords},1,{t}\n")
        names.append(name + ".jpg")
    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.write("\n".join(names[: args.n - args.n_eval]) + "\n")
    with open(os.path.join(args.out, "eval.txt"), "w") as f:
        f.write("\n".join(names[args.n - args.n_eval:]) + "\n")
    print(f"wrote {args.n} scenes to {args.out} "
          f"({args.n - args.n_eval} train / {args.n_eval} eval)")


if __name__ == "__main__":
    main()
