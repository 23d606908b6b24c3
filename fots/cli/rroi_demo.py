"""RRoIAlign demo: crop visualization + input-image gradient heatmap.

Analog of the reference's gradient-visualization demo
(rroi_align/test2.py:73-103): build rotated rois from GT quads, pool
crops with :func:`fots.ops.rroi_align.rroi_align`, differentiate the
pooled energy ``sum(crops**2)`` back to the input image with ``jax.grad``
(the reference calls ``res.backward()`` on its CUDA kernel), and write
the crops, the raw gradient image, and a gradient overlay.

Usage:
  python -m fots.cli.rroi_demo -image img.jpg [-gt gt_img.txt] \
      [-out_dir /tmp/rroi_demo] [-pooled_height 44]

Without ``-gt`` the gt file is looked up next to the image
(``gt_<name>.txt``, ICDAR comma format).
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-image", required=True)
    parser.add_argument("-gt", default=None, help="ICDAR gt txt (default: gt_<image>.txt)")
    parser.add_argument("-out_dir", default="rroi_demo_out")
    parser.add_argument("-pooled_height", type=int, default=44)
    parser.add_argument("-max_rois", type=int, default=8)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fots.data.annotations import load_annotation
    from fots.geometry import quads_to_rrois
    from fots.ops.rroi_align import pooled_width_for, rroi_align

    im = cv2.imread(args.image)
    if im is None:
        raise SystemExit(f"cannot read {args.image}")
    if args.gt:
        from fots.data.annotations import parse_icdar_lines

        with open(args.gt, encoding="utf-8") as f:
            lines = f.readlines()
        polys, tags, _ = parse_icdar_lines(
            lines, roll_icdar="icdar-2015" in args.gt.lower())
    else:
        polys, tags, _ = load_annotation(args.image, im.shape)
    keep = [i for i, t in enumerate(tags) if not t]
    if not keep:
        raise SystemExit("no usable (non-###) GT quads")
    quads = np.asarray(polys)[keep][: args.max_rois]
    rois = quads_to_rrois(quads)

    ph = args.pooled_height
    pw = pooled_width_for(rois, ph)
    images = jnp.asarray(im[None].astype(np.float32))

    def pooled_energy(images):
        crops = rroi_align(images, jnp.asarray(rois), ph, pw, 1.0)
        return jnp.sum(crops * crops), crops

    (energy, crops), grad = jax.value_and_grad(pooled_energy, has_aux=True)(images)
    crops = np.asarray(crops)
    grad = np.asarray(grad[0])

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(crops.shape[0]):
        cv2.imwrite(os.path.join(args.out_dir, f"crop{i}.jpg"),
                    np.clip(crops[i], 0, 255).astype(np.uint8))
    # the energy gradient is 2*x at sampled taps; normalize for display
    g = np.abs(grad).sum(-1)
    # percentile scaling: the energy gradient is 2*x at sampled taps, so a
    # handful of bright pixels would wash out a max-normalized map
    hi = max(float(np.percentile(g[g > 0], 95)) if (g > 0).any() else 0.0, 1e-6)
    g = np.clip(255.0 * g / hi, 0, 255).astype(np.uint8)
    heat = cv2.applyColorMap(g, cv2.COLORMAP_JET)
    cv2.imwrite(os.path.join(args.out_dir, "grad.jpg"), heat)
    overlay = cv2.addWeighted(im, 0.6, heat, 0.4, 0)
    cv2.imwrite(os.path.join(args.out_dir, "grad_overlay.jpg"), overlay)
    print(f"energy {float(energy):.3e}; wrote {crops.shape[0]} crops + "
          f"grad.jpg + grad_overlay.jpg to {args.out_dir} "
          f"(pooled {ph}x{pw})")


if __name__ == "__main__":
    main()
