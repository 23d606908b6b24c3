"""Device mesh + sharding layout for multi-chip training/inference.

The reference is strictly single-GPU (SURVEY.md §2.3: no DDP/NCCL
anywhere); here scaling is first-class and TPU-native: a 2-axis
``jax.sharding.Mesh`` ('data', 'model') where

- the batch is sharded over 'data' (the pjit analog of DDP; XLA inserts
  psum over ICI for gradients);
- the recognition vocabulary head (conv11 / CRNN embedding, which at
  nclass≈7500 multilingual vocab dominates head FLOPs) can shard its
  output channels over 'model' (tensor parallelism); everything else is
  replicated — at <50M params, fully-replicated weights + DP is the
  bandwidth-optimal layout, so 'model' defaults to 1.

All helpers work identically on the real TPU mesh and on the virtual
8-device CPU mesh used by tests/the driver's dry-run.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(1, len(devices) // n_model)
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# parameter paths whose *last* axis shards over 'model' (vocab heads)
_VOCAB_SHARDED_SUFFIXES = ("conv11/kernel", "conv11/bias", "embedding/kernel", "embedding/bias")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_shardings(params, mesh: Mesh, shard_vocab: bool = True):
    """Per-leaf NamedShardings: vocab-head output channels over 'model',
    everything else replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def leaf_sharding(path, leaf):
        if shard_vocab and model_size > 1:
            p = _path_str(path)
            if any(p.endswith(suf) for suf in _VOCAB_SHARDED_SUFFIXES):
                if leaf.ndim >= 1 and leaf.shape[-1] % model_size == 0:
                    spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_init(variables, mesh: Mesh, shard_vocab: bool = True):
    """Place an initialized variable tree on the mesh per param_shardings."""
    shardings = param_shardings(variables, mesh, shard_vocab)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
