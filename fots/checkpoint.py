"""Checkpointing (orbax) + PyTorch .h5 weight import.

Replaces the reference's ``torch.save({'step','learning_rate',
'state_dict','optimizer'})`` / ``net_utils.load_net`` flow
(train.py:132-140, tools/net_utils.py:16-43) with orbax checkpoints
carrying params / batch_stats / opt_state / step, plus an importer that
maps a reference-format torch state_dict onto the flax parameter tree
(for warm-starting from E2E-MLT/FOTS .h5 files, reference train.py:43-52).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: int):
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(step),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def save_serving_params(path: str, variables: Dict[str, Any],
                        step: Optional[int] = None,
                        config: Optional[Dict[str, Any]] = None) -> str:
    """Save a serving-only weight snapshot ({params, batch_stats}) as one
    compressed .npz — small enough (~19 MB f32 for the 4.8M-param FOTS
    detector) to commit, unlike a full orbax TrainState (3x with Adam
    moments).  Used to ship the trained bench checkpoint in-repo so
    ``bench.py`` measures real recognition load (VERDICT r3 item 2) —
    the reference's equivalent is the published .h5 weights its README
    points test.py:59-67 at.
    """
    flat = {}
    for group in ("params", "batch_stats"):
        leaves = jax.tree_util.tree_flatten_with_path(variables[group])[0]
        for keypath, leaf in leaves:
            key = group + "/" + "/".join(
                str(getattr(k, "key", k)) for k in keypath)
            flat[key] = np.asarray(leaf)
    if step is not None:
        flat["__step__"] = np.asarray(step)
    if config is not None:
        import json

        # serving-relevant train config (e.g. masked_norm), the snapshot's
        # analog of the train_config.json sidecar next to orbax checkpoints
        flat["__config__"] = np.asarray(json.dumps(config))
    with open(path, "wb") as f:
        np.savez_compressed(f, **flat)
    return path


def load_serving_config(path: str) -> Dict[str, Any]:
    """Read the embedded serving config of a snapshot written by
    :func:`save_serving_params` ({} for snapshots without one)."""
    import json

    with np.load(path) as z:
        if "__config__" not in z.files:
            return {}
        return json.loads(str(z["__config__"]))


def load_serving_params(path: str, variables: Dict[str, Any],
                        with_config: bool = False):
    """Inverse of :func:`save_serving_params`: returns (variables with
    every leaf replaced from the .npz, step-or-None) — plus the embedded
    config dict as a third element when ``with_config`` is set (same
    single read of the archive; cheaper than a follow-up
    :func:`load_serving_config` on the ~25 MB compressed file).  Every
    template leaf must be present in the file and vice versa (same
    every-key-accounted policy as the torch importer)."""
    import json

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("__step__")) if "__step__" in flat else None
    cfg_arr = flat.pop("__config__", None)
    config = json.loads(str(cfg_arr)) if cfg_arr is not None else {}
    used = set()

    def _replace(group):
        def fn(keypath, leaf):
            key = group + "/" + "/".join(
                str(getattr(k, "key", k)) for k in keypath)
            used.add(key)
            arr = flat[key]
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            return jnp.asarray(arr, dtype=leaf.dtype)
        return fn

    out = dict(variables)
    for group in ("params", "batch_stats"):
        out[group] = jax.tree_util.tree_map_with_path(
            _replace(group), variables[group])
    unused = set(flat) - used
    assert not unused, f"checkpoint keys not in model: {sorted(unused)[:8]}"
    if with_config:
        return out, step, config
    return out, step


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            try:
                steps.append((int(d.split("_")[1]), d))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_checkpoint(path: str, state) -> Tuple[Any, int]:
    """Restore into a template TrainState; returns (state, step)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(0),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        # land the global step in the TrainState itself so a resumed
        # Trainer.train() continues the global step numbering
        step=jnp.asarray(int(restored["step"]), dtype=jnp.int32),
    )
    return new_state, int(restored["step"])


# ---------------- torch .h5 import ----------------

def _conv_kernel(t: np.ndarray) -> np.ndarray:
    """torch [O,I,kh,kw] -> flax [kh,kw,I,O]."""
    return np.transpose(t, (2, 3, 1, 0))


def _dw_kernel(t: np.ndarray) -> np.ndarray:
    """torch depthwise [C,1,kh,kw] -> flax grouped [kh,kw,1,C]."""
    return np.transpose(t, (2, 3, 1, 0))


def _torch_block_map(prefix_t: str, prefix_f: str, sep: bool,
                     downsample: bool = False) -> Dict[str, Tuple[str, str]]:
    """state_dict key -> (flax param path, kind) for one residual block."""
    m: Dict[str, Tuple[str, str]] = {}
    if not sep:  # BasicBlockIn (reference models.py:140-168)
        m[f"{prefix_t}.conv1.weight"] = (f"{prefix_f}/conv1/kernel", "conv")
        m[f"{prefix_t}.bn1.weight"] = (f"{prefix_f}/in1/scale", "vec")
        m[f"{prefix_t}.bn1.bias"] = (f"{prefix_f}/in1/bias", "vec")
        m[f"{prefix_t}.conv2.weight"] = (f"{prefix_f}/conv2/kernel", "conv")
        m[f"{prefix_t}.bn2.weight"] = (f"{prefix_f}/in2/scale", "vec")
        m[f"{prefix_t}.bn2.bias"] = (f"{prefix_f}/in2/bias", "vec")
    else:  # BasicBlockSepIn (models.py:170-195)
        m[f"{prefix_t}.conv_sep1.0.weight"] = (f"{prefix_f}/sep1/dw/kernel", "dw")
        m[f"{prefix_t}.conv_sep1.1.weight"] = (f"{prefix_f}/sep1/pw/kernel", "conv")
        # conv_sep1.2 is a no-affine InstanceNorm: no params
        m[f"{prefix_t}.conv2.0.weight"] = (f"{prefix_f}/conv2/dw/kernel", "dw")
        m[f"{prefix_t}.conv2.1.weight"] = (f"{prefix_f}/conv2/in1/scale", "vec")
        m[f"{prefix_t}.conv2.1.bias"] = (f"{prefix_f}/conv2/in1/bias", "vec")
        m[f"{prefix_t}.conv2.3.weight"] = (f"{prefix_f}/conv2/pw/kernel", "conv")
        m[f"{prefix_t}.conv2.4.weight"] = (f"{prefix_f}/conv2/in2/scale", "vec")
        m[f"{prefix_t}.conv2.4.bias"] = (f"{prefix_f}/conv2/in2/bias", "vec")
    if downsample:
        # conv1x1 + BatchNorm, only on stage-entry blocks (models.py:315-324)
        m[f"{prefix_t}.downsample.0.weight"] = (f"{prefix_f}/down_conv/kernel", "conv")
        m[f"{prefix_t}.downsample.1.weight"] = (f"{prefix_f}/down_bn/bn/scale", "vec")
        m[f"{prefix_t}.downsample.1.bias"] = (f"{prefix_f}/down_bn/bn/bias", "vec")
        m[f"{prefix_t}.downsample.1.running_mean"] = (f"{prefix_f}/down_bn/bn/mean", "stat")
        m[f"{prefix_t}.downsample.1.running_var"] = (f"{prefix_f}/down_bn/bn/var", "stat")
    return m


def reference_key_map() -> Dict[str, Tuple[str, str]]:
    """Full torch state_dict -> flax path mapping for ModelResNetSep2."""
    m: Dict[str, Tuple[str, str]] = {}
    # stem (models.py:250-264)
    m["layer0.0.weight"] = ("stem/conv0a/kernel", "conv")
    m["layer0.1.bn.weight"] = ("stem/crelu0a/in/scale", "vec")
    m["layer0.1.bn.bias"] = ("stem/crelu0a/in/bias", "vec")
    m["layer0.2.weight"] = ("stem/conv0b/kernel", "conv")
    m["layer0.3.bn.weight"] = ("stem/crelu0b/in/scale", "vec")
    m["layer0.3.bn.bias"] = ("stem/crelu0b/in/bias", "vec")
    m["layer0_1.0.weight"] = ("stem/conv1a/kernel", "conv")
    m["layer0_1.2.weight"] = ("stem/conv1b/kernel", "conv")
    # residual stages; only the first block of stages 2-4 downsamples
    for i in range(3):
        m.update(_torch_block_map(f"layer1.{i}", f"layer1_{i}", sep=False))
    for i in range(4):
        m.update(_torch_block_map(f"layer2.{i}", f"layer2_{i}", sep=False,
                                  downsample=(i == 0)))
    for i in range(6):
        m.update(_torch_block_map(f"layer3.{i}", f"layer3_{i}", sep=True,
                                  downsample=(i == 0)))
    for i in range(4):
        m.update(_torch_block_map(f"layer4.{i}", f"layer4_{i}", sep=True,
                                  downsample=(i == 0)))
    # FPN laterals + smoothing + attention + heads
    for name in ("feature1", "feature2", "feature3", "feature4"):
        m[f"{name}.weight"] = (f"{name}/kernel", "conv")
    for name in ("upconv1", "upconv2"):
        m[f"{name}.0.weight"] = (f"{name}/dw/kernel", "dw")
        m[f"{name}.1.weight"] = (f"{name}/pw/kernel", "conv")
    m["conv_attenton.weight"] = ("conv_attention/kernel", "conv")
    m["conv_attenton.bias"] = ("conv_attention/bias", "vec")
    for name in ("act", "rbox", "angle"):
        m[f"{name}.weight"] = (f"{name}/kernel", "conv")
        m[f"{name}.bias"] = (f"{name}/bias", "vec")
    # recognition head (models.py:266-279, 334-379)
    for idx in (5, 6, 7, 8, 9):
        m[f"conv{idx}.weight"] = (f"ocr/conv{idx}/kernel", "conv")
    m["conv10_s.weight"] = ("ocr/conv10_s/kernel", "conv")
    m["conv11.weight"] = ("ocr/conv11/kernel", "conv")
    m["conv11.bias"] = ("ocr/conv11/bias", "vec")
    for idx in (5, 7):
        m[f"batch{idx}.weight"] = (f"ocr/batch{idx}/scale", "vec")
        m[f"batch{idx}.bias"] = (f"ocr/batch{idx}/bias", "vec")
    m["batch10_s.weight"] = ("ocr/batch10_s/scale", "vec")
    m["batch10_s.bias"] = ("ocr/batch10_s/bias", "vec")
    return m


def _set_path(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def import_torch_state_dict(state_dict: Dict[str, Any], variables,
                            skip_substrings: Tuple[str, ...] = ()) -> Tuple[Any, list, list]:
    """Map a reference torch state_dict onto a flax variables tree.

    Returns (new_variables, imported_keys, skipped_keys).  ``skip_substrings``
    mirrors the reference's partial warm start (train.py:50 skips
    'conv11'/'rnn' when the vocab differs).
    """
    import copy

    key_map = reference_key_map()
    new_vars = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    new_vars = copy.deepcopy(
        {"params": new_vars["params"], "batch_stats": new_vars.get("batch_stats", {})}
    )
    imported, skipped = [], []
    for tk, tv in state_dict.items():
        if any(s in tk for s in skip_substrings):
            skipped.append(tk)
            continue
        if tk not in key_map:
            if not tk.endswith("num_batches_tracked"):
                skipped.append(tk)
            continue
        fpath, kind = key_map[tk]
        arr = np.asarray(tv)
        if kind == "conv":
            arr = _conv_kernel(arr)
        elif kind == "dw":
            arr = _dw_kernel(arr)
        coll = "batch_stats" if kind == "stat" else "params"
        try:
            _set_path(new_vars[coll], fpath, arr.astype(np.float32))
            imported.append(tk)
        except (KeyError, TypeError):
            skipped.append(tk)
    return new_vars, imported, skipped


def load_torch_h5(path: str):
    """Load a reference .h5 (torch.save dict with 'state_dict')."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
