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


def param_pspecs(params: Dict) -> Dict:
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
        return spec

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, path + (str(i),)) for i, v in enumerate(tree)]
            return type(tree)(t)
        return spec_for(path, tree)

    return walk(params)


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    return jax.device_put(params, param_shardings(params, mesh))


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------
# The AdamW moments are 2x the param bytes and, under plain DP, fully
# replicated on every device — the largest redundant state in the job.
# ZeRO-1 shards them over the data axis: each device stores (and updates)
# 1/dp of every moment tensor; GSPMD inserts the reduce-scatter /
# all-gather around the update from the sharding annotations alone (the
# scaling-book recipe — no hand-written collectives). The reference has
# nothing comparable (its only parallelism is nn.DataParallel replica
# scatter/gather, reference train.py:112-114).


def _with_data_axis(spec: P, shape, dp: int, tp: int = 1) -> P:
    """Extend a param's TP spec with DATA_AXIS sharding on the first
    unsharded dim divisible by dp (moments keep the param's TP layout so
    no resharding is needed against the TP-sharded gradients). When the
    only divisible dim is already MODEL-sharded (e.g. the column-parallel
    biases), shard it over both axes — ``(MODEL, DATA)``."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    if dp > 1:
        # largest divisible unsharded dim (not the first): sharding a tiny
        # leading layer axis forces GSPMD into full-rematerialization
        # reshards against the gradients' layout
        cands = [
            (s, i)
            for i, (p, s) in enumerate(zip(parts, shape))
            if p is None and s % dp == 0 and s >= dp
        ]
        if cands:
            parts[max(cands)[1]] = DATA_AXIS
            return P(*parts)
        for i, (p, s) in enumerate(zip(parts, shape)):
            if p == MODEL_AXIS and s % (dp * tp) == 0:
                parts[i] = (MODEL_AXIS, DATA_AXIS)
                return P(*parts)
    return P(*parts)


def zero1_opt_shardings(opt_state, params: Dict, mesh: Mesh):
    """NamedSharding tree for an optax state: every params-shaped subtree
    (AdamW mu/nu) gets the param's TP spec plus data-axis sharding on its
    first divisible dim; scalars (step counts) and empty states stay
    replicated. Structure-matching keeps this generic over optax chains."""
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape.get(MODEL_AXIS, 1)
    pstruct = jax.tree_util.tree_structure(params)
    pspecs = param_pspecs(params)

    def matches(x):
        try:
            return jax.tree_util.tree_structure(x) == pstruct
        except Exception:
            return False

    def shard_node(x):
        if matches(x):
            return jax.tree.map(
                lambda spec, leaf: NamedSharding(
                    mesh, _with_data_axis(spec, leaf.shape, dp, tp)
                ),
                pspecs,
                x,
                is_leaf=lambda t: isinstance(t, P),
            )
        return NamedSharding(mesh, P())

    return jax.tree.map(shard_node, opt_state, is_leaf=matches)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel DECODE layout (explicit shard_map path)
# ---------------------------------------------------------------------------
# Training TP goes through GSPMD (annotate + jit, above). The decode loop
# instead runs under shard_map with per-device param shards, so the fused
# QKV projection must be HEAD-ALIGNED: a plain last-dim split of the
# [.., D, 3D] = [Q | K | V] column block would give shard 0 "all of Q plus
# half of K" instead of "its heads' q, k and v".


def regroup_qkv_for_tp(attn_w, attn_b, n_head: int, head_dim: int, n_shards: int):
    """Reorder fused-QKV columns from [Q|K|V] (head-major within each) to
    shard-major [q_s0|k_s0|v_s0 | q_s1|k_s1|v_s1 | ...], so a contiguous
    last-dim split hands each TP shard exactly its heads' q/k/v columns."""
    if n_head % n_shards:
        raise ValueError(f"n_head {n_head} not divisible by tp={n_shards}")
    L, D, threeD = attn_w.shape
    chunk = (n_head // n_shards) * head_dim  # per-shard width of q (= k = v)
    w = attn_w.reshape(L, D, 3, n_shards, chunk)
    w = w.transpose(0, 1, 3, 2, 4).reshape(L, D, threeD)
    b = attn_b.reshape(L, 3, n_shards, chunk)
    b = b.transpose(0, 2, 1, 3).reshape(L, threeD)
    return w, b


def tp_decode_params(params: Dict, n_head: int, head_dim: int, n_shards: int) -> Dict:
    """Copy of the MMTG param tree with the GPT-2 fused QKV regrouped for
    an ``n_shards``-way TP decode (everything else unchanged)."""
    out = dict(params)
    gpt2 = dict(params["gpt2"])
    h = dict(gpt2["h"])
    h["attn_w"], h["attn_b"] = regroup_qkv_for_tp(
        h["attn_w"], h["attn_b"], n_head, head_dim, n_shards
    )
    gpt2["h"] = h
    out["gpt2"] = gpt2
    return out


def decode_param_pspecs(params: Dict) -> Dict:
    """PartitionSpec tree for shard_map TP decode: column-parallel QKV /
    MLP-fc (+ their biases), row-parallel attn-proj / MLP-proj; embeddings,
    LNs, projection biases and all non-GPT-2 params replicated (the lm
    head is computed redundantly per shard — one [B,D]x[D,V] matmul is
    noise next to the cache traffic, and it saves an all-gather over the
    vocab axis every step)."""
    tp = {
        "wte": P(),
        "wpe": P(),
        "h": {
            "ln1_g": P(), "ln1_b": P(),
            "attn_w": P(None, None, MODEL_AXIS),
            "attn_b": P(None, MODEL_AXIS),
            "attn_proj_w": P(None, MODEL_AXIS, None),
            "attn_proj_b": P(),
            "ln2_g": P(), "ln2_b": P(),
            "mlp_fc_w": P(None, None, MODEL_AXIS),
            "mlp_fc_b": P(None, MODEL_AXIS),
            "mlp_proj_w": P(None, MODEL_AXIS, None),
            "mlp_proj_b": P(),
        },
        "lnf_g": P(), "lnf_b": P(),
    }

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(
                walk(v, path + (str(i),)) for i, v in enumerate(tree)
            )
        if path and path[0] == "gpt2":
            spec = tp
            for key in path[1:]:
                if isinstance(spec, dict) and key in spec:
                    spec = spec[key]
                else:
                    return P()
            return spec if isinstance(spec, P) else P()
        return P()

    return walk(params)
