"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.9: no torch.distributed
anywhere; `CUDA_VISIBLE_DEVICES=$1` pinning). Parallelism here is *new
TPU-native surface*: a (dp, tp) mesh over ICI where

* **dp** shards the batch — calibration batches, CFG serving batches, and
  the embarrassingly-parallel sensitivity sweeps;
* **tp** shards weight matrices over their output-channel axis (Dense
  ``[in, out]`` / Conv HWIO ``[...,out]``) — Megatron-style column
  parallelism whose collectives XLA inserts automatically under jit.

All rules are data-driven over the params pytree, so they apply to every
model family without per-layer annotations.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              devices=None) -> Mesh:
    """Create a (dp, tp) mesh. tp defaults to 2 when device count is even,
    else 1 (single-chip -> (1, 1))."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_spec(path: Tuple, leaf, tp_size: int) -> P:
    """Sharding rule for one param leaf: shard the output-channel (last)
    axis over 'tp' when divisible; replicate otherwise. Biases/scales with
    divisible last dim shard too (they follow the out-channel)."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 0:
        return P()
    if shape[-1] % tp_size == 0 and shape[-1] >= tp_size:
        return P(*([None] * (len(shape) - 1) + ["tp"]))
    return P(*([None] * len(shape)))


def make_param_shardings(mesh: Mesh, params) -> Any:
    """NamedShardings for a params (or qparams) pytree under column-parallel
    tp. Works on any pytree of arrays."""
    tp_size = mesh.shape["tp"]

    def rule(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, tp_size))

    return jax.tree_util.tree_map_with_path(rule, params)


def make_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def make_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, tree):
    """Device_put a batch pytree with the leading axis sharded over dp."""
    def rule(leaf):
        if getattr(leaf, "ndim", 0) >= 1:
            spec = P(*(["dp"] + [None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(rule, tree)
