"""Measure the fused conv3x3+IN+add+relu Pallas kernel vs the XLA
composition on the REAL chip, at the widest 1/4-scale stage's serve shape.

This is VERDICT r3 item 7: the HBM-wall memo rules out residual-block
fusion — this makes that a measurement instead of a claim.  Target
shape: layer2 BasicBlockIn tail at the bench serve config
(16 x 88 x 160 x 128 bf16, fots/models/detector.py layer2 — the 1/8-scale
stage; the 1/4-scale stage's C=64 violates Mosaic's 128-lane HBM DMA
alignment, see fots/ops/fused_block.py docstring, and layer2 moves more
total bytes anyway: 4 blocks at the same 57.7 MB/activation).

Each variant is timed as K chained iterations inside ONE jitted program
(output fed back as input), so tunnel dispatch latency (~30 ms RTT)
amortizes away and XLA cannot dead-code the loop.  Prints one JSON dict
with ms/iter, achieved GB/s (bytes counted per variant's HBM model:
6 activation tensors for the XLA composition, 4 for the kernel), and the
throughput ratio.

Usage: python tools/profile_fused_block.py [--iters K] [--shape N,H,W,C]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import fots.cli  # noqa: F401  (platform env + compile cache)
    import jax
    import jax.numpy as jnp

    from fots.ops.fused_block import (conv_in_act_reference,
                                      fused_conv3x3_in_act)

    iters = 10
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    shape = (16, 88, 160, 128)
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(","))
    n, h, w, c = shape
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dt)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.standard_normal(c) * 0.3 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    r = jnp.asarray(rng.standard_normal(shape), dt)

    def chain(f):
        def run(x):
            def body(xc, _):
                return f(xc), None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(run)

    ref = chain(lambda xc: conv_in_act_reference(xc, wk, g, b, r))
    fus = chain(lambda xc: fused_conv3x3_in_act(xc, wk, g, b, r))

    # numeric check first (one step, f32 compare)
    y_ref = conv_in_act_reference(x, wk, g, b, r)
    y_fus = fused_conv3x3_in_act(x, wk, g, b, r)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_fus.astype(jnp.float32))))

    out = {"shape": list(shape), "iters_per_program": iters,
           "max_abs_err_vs_xla": err}
    a_bytes = n * h * w * c * np.dtype(np.float16).itemsize  # bf16 = 2 B
    for name, prog, n_tensors in (("xla_composition", ref, 6),
                                  ("pallas_fused", fus, 4)):
        float(prog(x))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(prog(x))  # device_get of the sum = true sync
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        ms_per_iter = best / iters * 1e3
        out[name] = {
            "ms_per_iter": round(ms_per_iter, 3),
            "model_bytes_per_iter_mb": round(n_tensors * a_bytes / 1e6, 1),
            "achieved_gbps_on_model_bytes": round(
                n_tensors * a_bytes / (ms_per_iter / 1e3) / 1e9, 1),
        }
    out["fused_speedup"] = round(
        out["xla_composition"]["ms_per_iter"]
        / out["pallas_fused"]["ms_per_iter"], 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
