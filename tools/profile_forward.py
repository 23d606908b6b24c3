"""Per-stage device timings of the serving forward on the real chip.

Times each pipeline stage as its own jitted program (sync via device_get
of a reduction — jax.block_until_ready does not reliably block over the
axon tunnel) and prints a table.  Stage sums exceed the fused forward
because XLA fuses across stage boundaries in the full program; use the
numbers for *relative* cost, i.e. where to spend optimization effort.

Usage:  python tools/profile_forward.py [--batch 16] [--hw 704,1280]
"""

import argparse
import time

import numpy as np


def _sync(x):
    import jax
    import jax.numpy as jnp

    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="704,1280")
    ap.add_argument("--boxes", type=int, default=20, help="rois per image")
    ap.add_argument("--strip_w", type=int, default=128)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="also time cumulative backbone prefixes "
                         "(stem, +layer1..4, +FPN/heads); marginal cost of "
                         "a stage = difference of successive rows")
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    B = args.batch

    import jax
    import jax.numpy as jnp

    from fots.codec import LabelCodec
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector
    from fots.ops.nms import extract_candidates
    from fots.ops.rroi_align import rroi_align
    from fots.pipeline import cast_params_bf16
    from fots.roirotate import POOLED_HEIGHT

    codec = LabelCodec()
    model = FOTSDetector(nclass=codec.num_classes)
    variables = init_detector(model, jax.random.PRNGKey(0))
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    if not args.f32:
        variables = cast_params_bf16(dict(variables))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))

    # RTT floor
    tiny = jnp.zeros((), jnp.float32)
    rtt = best_of(lambda: float(jax.device_get(tiny + 1.0)), 7)

    rows = []

    def timeit(name, fn, *a):
        jfn = jax.jit(fn)
        out = jfn(*a)          # compile
        _sync(out if not isinstance(out, (tuple, list)) else out[0])
        t = best_of(lambda: _sync(
            (lambda o: o[0] if isinstance(o, (tuple, list)) else o)(jfn(*a))))
        rows.append((name, (t - rtt) * 1e3))
        return jfn(*a)

    # --- stage programs (each includes the prior stages' recompute cost;
    # subtract successive rows for marginal cost) ---
    def stem_only(images):
        return model.apply(variables, images.astype(dt),
                           method=FOTSDetector.forward_features)

    focr = timeit("stem (forward_features)", stem_only, images)

    def full_fwd(images):
        out = model.apply(variables, images.astype(dt), train=False)
        return out["segm"][0], out["focr"]

    timeit("full detection forward", full_fwd, images)

    if args.stages:
        # cumulative backbone prefixes: each row re-runs all prior stages,
        # so the MARGINAL cost of a stage is the difference of successive
        # rows (the recompute cancels; XLA cross-stage fusion makes the
        # residual error a few percent)
        def upto(depth):
            def fn(m, images):
                x = m.stem(images)
                for name in ("layer1", "layer2", "layer3", "layer4")[:depth]:
                    for blk in getattr(m, name):
                        x = blk(x, train=False)
                return x
            return fn

        for d in range(1, 5):
            timeit(f"stem + layer1..{d}",
                   lambda images, d=d: model.apply(
                       variables, images.astype(dt), method=upto(d)), images)

    def fwd_plus_cand(images):
        out = model.apply(variables, images.astype(dt), train=False)
        return extract_candidates(
            out["segm"][0][..., 0].astype(jnp.float32),
            out["rbox"][0].astype(jnp.float32),
            out["angle"][0].astype(jnp.float32), 2048, 0.5)

    timeit("forward + candidate extraction", fwd_plus_cand, images)

    # --- recognition decomposition on a held focr ---
    n = B * args.boxes
    rois_np = np.zeros((n, 6), np.float32)
    rois_np[:, 0] = np.repeat(np.arange(B), args.boxes)
    mx, my = min(100, W // 4), min(100, H // 4)
    rois_np[:, 1] = rng.uniform(mx, W - mx, n)
    rois_np[:, 2] = rng.uniform(my, H - my, n)
    rois_np[:, 3] = rng.uniform(12, min(30, H // 4), n)
    rois_np[:, 4] = rng.uniform(min(60, W // 4), min(250, W // 2), n)
    rois_np[:, 5] = rng.uniform(-20, 20, n)
    rois = jnp.asarray(rois_np)

    def rroi_only(focr, rois):
        return rroi_align(focr, rois, POOLED_HEIGHT, args.strip_w, 0.25)

    strips = timeit(f"rroi_align {n}x11x{args.strip_w}", rroi_only, focr, rois)

    def rec_stack(strips):
        return model.apply(variables, strips, train=False,
                           method=FOTSDetector.recognize)

    timeit("recognition conv stack", rec_stack, strips)

    def rec_full(focr, rois):
        s = rroi_align(focr, rois, POOLED_HEIGHT, args.strip_w, 0.25)
        lp = model.apply(variables, s, train=False,
                         method=FOTSDetector.recognize)
        return jnp.argmax(lp, axis=-1)

    timeit("rroi + conv stack + argmax (fused)", rec_full, focr, rois)

    print(f"\nbatch {B} @ {H}x{W} {'f32' if args.f32 else 'bf16'}; "
          f"link RTT {rtt*1e3:.1f} ms (subtracted)")
    for name, ms in rows:
        print(f"  {name:40s} {ms:8.2f} ms")

    # XLA-reported FLOPs for the full forward -> MFU.  Two numbers:
    # "executed" counts the FLOPs of the program as compiled — the S2D stem
    # trades redundant MXU FLOPs for HBM bandwidth (fots/ops/s2d.py), so
    # this flatters the chip; "model" counts the canonical (non-S2D)
    # formulation's FLOPs — the honest the-model-needed-this-many number.
    full_ms = dict(rows)["full detection forward"]

    def _flops_of(jitted, *a):
        cost = jitted.lower(*a).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    try:
        flops = _flops_of(jax.jit(full_fwd), images)
        print(f"  executed FLOPs {flops/1e9:.1f} G -> "
              f"MFU {100*flops/(full_ms/1e3)/197e12:.1f}% of v5e bf16 peak")
    except Exception as e:
        print("  cost analysis failed:", repr(e))
    try:
        # canonical count via a CPU-backend lowering of the non-S2D model
        # (cheap: never executed, CPU compile is local)
        cpu = jax.devices("cpu")[0]
        model_c = FOTSDetector(nclass=codec.num_classes, stem_s2d=False)

        def canon_fwd(images):
            out = model_c.apply(variables, images.astype(dt), train=False)
            return out["segm"][0], out["focr"]

        cflops = _flops_of(jax.jit(canon_fwd, device=cpu),
                           jax.ShapeDtypeStruct(images.shape, images.dtype))
        print(f"  model FLOPs {cflops/1e9:.1f} G (canonical formulation) -> "
              f"honest MFU {100*cflops/(full_ms/1e3)/197e12:.1f}%")
    except Exception as e:
        print("  canonical cost analysis failed:", repr(e))


if __name__ == "__main__":
    main()
