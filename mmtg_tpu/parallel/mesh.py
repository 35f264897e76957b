"""Device mesh + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
replica scatter/gather (``train.py:112-114``; SURVEY.md §2b). The
TPU-native equivalent is a named ``Mesh`` with a ``data`` axis (gradient
all-reduce rides ICI, emitted by XLA from sharded jit) plus a ``model``
axis for Megatron-style tensor parallelism over the GPT-2 blocks:
column-parallel QKV/fc (shard the output feature dim), row-parallel
attn-proj/mlp-proj (shard the input feature dim), embeddings sharded over
the vocab/feature dim. Everything else (the small encoder/attention/
projector params) is replicated — they are <8M params.

No collective is written by hand anywhere: annotate shardings, jit, and
let the GSPMD partitioner insert all-reduce / all-gather where needed
(the scaling-book recipe).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh. Default: all devices on ``data``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if mesh_shape is None:
        mesh_shape = (n, 1)
    d, m = mesh_shape
    if d * m > n:
        raise ValueError(f"mesh {mesh_shape} needs {d * m} devices, have {n}")
    # a smaller mesh uses the first d*m devices (e.g. (1,1) = single-chip
    # runs on a multi-device host)
    return Mesh(devices.ravel()[: d * m].reshape(d, m), (DATA_AXIS, MODEL_AXIS))


# GPT-2 stacked-layer tensor-parallel layout ([L, ...] leading layer axis).
_GPT2_TP_SPECS = {
    "wte": P(None, MODEL_AXIS),
    "wpe": P(None, MODEL_AXIS),
    "h": {
        "ln1_g": P(),
        "ln1_b": P(),
        "attn_w": P(None, None, MODEL_AXIS),  # column-parallel QKV
        "attn_b": P(None, MODEL_AXIS),
        "attn_proj_w": P(None, MODEL_AXIS, None),  # row-parallel
        "attn_proj_b": P(),
        "ln2_g": P(),
        "ln2_b": P(),
        "mlp_fc_w": P(None, None, MODEL_AXIS),  # column-parallel
        "mlp_fc_b": P(None, MODEL_AXIS),
        "mlp_proj_w": P(None, MODEL_AXIS, None),  # row-parallel
        "mlp_proj_b": P(),
    },
    "lnf_g": P(),
    "lnf_b": P(),
}


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """PartitionSpec tree for the MMTG param pytree: GPT-2 gets the TP
    layout above; everything else is replicated."""

    def spec_for(path, leaf):
        spec = _GPT2_TP_SPECS
        if path and path[0] == "gpt2":
            for key in path[1:]:
                if isinstance(spec, dict) and key in spec:
                    spec = spec[key]
                else:
                    spec = P()
                    break
            if isinstance(spec, dict):
                spec = P()
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, path + (str(i),)) for i, v in enumerate(tree)]
            return type(tree)(t)
        return spec_for(path, tree)

    return walk(params)


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
