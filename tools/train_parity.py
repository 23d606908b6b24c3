"""Cross-framework TRAINING-DYNAMICS parity: torch reference vs fots.

Round-2 parity proved forward/loss equality on identical inputs
(tests/test_torch_parity.py).  This harness converts that into "the two
frameworks *optimize* identically": both train from the SAME imported
init, on the SAME fixed batch, with the SAME optimizer
(Adam lr=1e-3, betas=(0.5, 0.999) — reference train.py:40), and the loss
curves are recorded side by side.

Scope: the detection objective (dice + angle MSE + IoU loss,
reference models.py:459-505).  The reference's joint-CTC branch cannot
execute on CPU at all — process_boxes requires the CUDA RRoIAlign
(src/ocr_process.py:259-267) and train.py wraps loss.backward() in the
same try block (train.py:108-123), so the CPU reference would never even
step.  Dropout is disabled on both sides (torch net.eval(); fots apply
train=False) so the objective is deterministic; the detection path has no
batchnorm, so eval-mode changes nothing else.

Writes artifacts/train_parity.json with per-step loss components for both
frameworks + summary deltas.

Usage:  python tools/train_parity.py [--steps 300] [--batch 4]
"""

import argparse
import json
import os
import sys

import numpy as np

# numeric comparability: run the fots side on XLA:CPU like the torch side
# (TPU f32 convs default to bf16-ish matmul precision; this harness is
# about optimization dynamics, not speed)
# NOT setdefault: the container pre-sets JAX_PLATFORMS=axon,cpu.  The env
# var alone is also not enough — sitecustomize force-sets the jax_platforms
# CONFIG before user code runs, so re-apply it at config level too (same
# fix fots/cli/__init__.py applies for the CLIs).
os.environ["JAX_PLATFORMS"] = "cpu"


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


_force_cpu()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REF_TOOLS = "/root/reference/tools"


def build_fixed_batch(batch_size, input_size):
    """One deterministic no-augment batch of small synthetic annotated
    scenes (tools/make_synth_dataset --size 256 256): scenes are exactly
    input_size so the no-aug top-left crop is the full image and every GT
    word stays in frame."""
    from fots.data.detection import detection_generator

    synth_dir = os.path.join(os.path.dirname(__file__), "..", "data",
                             "synth_small")
    if not os.path.exists(os.path.join(synth_dir, "train.txt")):
        import subprocess

        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "make_synth_dataset.py"),
                        "--out", synth_dir, "--n", "6", "--n_eval", "0",
                        "--size", str(input_size), str(input_size)],
                       check=True)
    lst = os.path.join(synth_dir, "train.txt")
    gen = detection_generator(lst, input_size=input_size,
                              batch_size=batch_size,
                              seed=0, augment=False, allow_empty_frac=1.0)
    return next(gen)


def torch_side(batch, steps, lr, perturb=0.0):
    """perturb > 0: add N(0, perturb) noise to every parameter before
    training — the chaos-floor CONTROL.  Training is a chaotic dynamical
    system; the torch-vs-perturbed-torch divergence bounds from below what
    ANY numerically-inequivalent-but-correct reimplementation can achieve,
    so the fots-vs-torch delta should be judged against it, not against 0."""
    import torch

    if REF_TOOLS not in sys.path:
        sys.path.insert(0, REF_TOOLS)
    import models as ref_models

    # reference loss() calls .cuda(); make it a no-op clone on CPU (the
    # clone keeps the in-place += in iou_loss autograd-legal, the same
    # shim tests/test_torch_parity.py uses)
    torch.Tensor.cuda = lambda self, *a, **k: self.clone()

    torch.manual_seed(0)
    net = ref_models.ModelResNetSep2(attention=True, multi_scale=True,
                                     nclass=87)
    net.eval()  # deterministic: dropout off; detection path has no BN
    if perturb:
        g = torch.Generator().manual_seed(123)
        with torch.no_grad():
            for p in net.parameters():
                p.add_(torch.randn(p.shape, generator=g) * perturb)
    # .copy() is load-bearing: on CPU .cpu() is identity and .numpy() is a
    # VIEW of the parameter storage, which opt.step() mutates in place —
    # without the copy the fots side would import the post-training weights
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in net.state_dict().items()}
    opt = torch.optim.Adam(net.parameters(), lr=lr, betas=(0.5, 0.999))

    im = torch.from_numpy(
        np.ascontiguousarray(batch.images.transpose(0, 3, 1, 2)))
    smaps = torch.from_numpy(batch.score_maps)
    mask = torch.from_numpy(batch.training_masks.astype(np.float32))
    angle_gt = torch.from_numpy(np.ascontiguousarray(batch.geo_maps[..., 4]))
    geo_gt = torch.from_numpy(np.ascontiguousarray(batch.geo_maps[..., :4]))

    curve = []
    for _ in range(steps):
        seg, rbox, ang, _feat = net(im)
        loss = net.loss(seg, smaps, mask, ang, angle_gt, rbox, geo_gt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        curve.append({
            "total": float(loss.item()),
            "segm": float(net.segm_loss_value),
            "angle": float(net.angle_loss_value),
            "iou": float(net.box_loss_value),
        })
    return sd, curve


def fots_side(batch, sd, steps, lr):
    import jax
    import jax.numpy as jnp
    import optax

    from fots.checkpoint import import_torch_state_dict
    from fots.losses import detection_loss
    from fots.models import FOTSDetector
    from fots.models.detector import init_detector

    model = FOTSDetector(nclass=87)
    variables = init_detector(model, jax.random.PRNGKey(0),
                              image_shape=(1, 64, 64, 3))
    variables, imported, _ = import_torch_state_dict(sd, dict(variables))
    params = variables["params"]
    tx = optax.adam(lr, b1=0.5, b2=0.999)
    opt_state = tx.init(params)

    images = jnp.asarray(batch.images)
    score = jnp.asarray(batch.score_maps)
    mask = jnp.asarray(batch.training_masks.astype(np.float32))
    geo = jnp.asarray(batch.geo_maps[..., :4])
    angle_gt = jnp.asarray(batch.geo_maps[..., 4])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                images, train=False)
            det = detection_loss(out, score, mask, geo, angle_gt,
                                 multi_scale=True)
            return det["total"], det
        (_, det), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        vec = jnp.stack([det["total"], det["segm"], det["angle"], det["iou"]])
        return params, opt_state, vec

    curve = []
    for _ in range(steps):
        params, opt_state, vec = step(params, opt_state)
        v = np.asarray(vec)
        curve.append({"total": float(v[0]), "segm": float(v[1]),
                      "angle": float(v[2]), "iou": float(v[3])})
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="artifacts/train_parity.json")
    args = ap.parse_args()

    batch = build_fixed_batch(args.batch, args.size)
    print(f"fixed batch: {batch.images.shape}, "
          f"{[len(q) for q in batch.gt_quads]} gt words", flush=True)

    sd, torch_curve = torch_side(batch, args.steps, args.lr)
    print(f"torch done: step0 {torch_curve[0]['total']:.4f} -> "
          f"step{args.steps - 1} {torch_curve[-1]['total']:.4f}", flush=True)
    _, control_curve = torch_side(batch, args.steps, args.lr, perturb=1e-6)
    print(f"ctrl  done: step0 {control_curve[0]['total']:.4f} -> "
          f"step{args.steps - 1} {control_curve[-1]['total']:.4f}", flush=True)
    fots_curve = fots_side(batch, sd, args.steps, args.lr)
    print(f"fots  done: step0 {fots_curve[0]['total']:.4f} -> "
          f"step{args.steps - 1} {fots_curve[-1]['total']:.4f}", flush=True)

    # summary deltas at checkpoints along the curve; the control column is
    # torch-vs-torch with a 1e-6 init perturbation (the chaos floor)
    idxs = sorted({0, 1, 4, 9, 24, 49, 99, args.steps - 1} &
                  set(range(args.steps)))
    deltas = {str(i): round(abs(torch_curve[i]["total"]
                                - fots_curve[i]["total"]), 6) for i in idxs}
    control = {str(i): round(abs(torch_curve[i]["total"]
                                 - control_curve[i]["total"]), 6) for i in idxs}
    out = {
        "config": {"steps": args.steps, "batch": args.batch, "lr": args.lr,
                   "optimizer": "adam(b1=0.5,b2=0.999)",
                   "objective": "detection (dice+angle+iou, multi-scale)",
                   "note": "identical imported init, identical fixed batch, "
                           "dropout off both sides; control = torch vs "
                           "torch with 1e-6 init noise (chaos floor)"},
        "torch": torch_curve,
        "fots": fots_curve,
        "torch_perturbed_control": control_curve,
        "abs_total_delta_at_step": deltas,
        "control_abs_delta_at_step": control,
        "final_rel_delta": abs(torch_curve[-1]["total"] - fots_curve[-1]["total"])
        / max(abs(torch_curve[-1]["total"]), 1e-9),
        "control_final_rel_delta": abs(
            torch_curve[-1]["total"] - control_curve[-1]["total"])
        / max(abs(torch_curve[-1]["total"]), 1e-9),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"deltas": deltas, "control": control,
                      "final_rel_delta": out["final_rel_delta"],
                      "control_final_rel_delta":
                      out["control_final_rel_delta"]}, indent=1))


if __name__ == "__main__":
    main()
