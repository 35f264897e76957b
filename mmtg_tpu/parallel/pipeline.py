"""GPipe-style pipeline parallelism for the GPT-2 block stack.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference ``train.py:112-114``); the TPU-native rebuild already runs
DP (GSPMD batch sharding) and Megatron TP (``parallel.mesh``). This
module adds the third classic axis: the stacked ``[L, ...]`` layer
params are sharded over a ``pipe`` mesh axis, the batch is split into
microbatches, and activations stream stage-to-stage over ICI via
``lax.ppermute`` inside ``shard_map``. Differentiating straight through
the shard_map yields the reverse pipeline (the transpose of ``ppermute``
is the reversed permutation; the transpose of the masked ``psum``
broadcast is the masked cotangent) — no hand-written backward schedule.

Schedule: plain GPipe. With S stages and M microbatches the loop runs
``M + S - 1`` ticks; stage s processes microbatch ``t - s`` at tick t
(bubble ticks compute on garbage and are masked out at collection).
Bubble fraction is ``(S-1)/(M+S-1)`` — pick ``n_micro >= n_stages``.

Composes with data parallelism on a ``("data", "pipe")`` mesh: the
pipeline only communicates over ``pipe``; GSPMD shards the batch over
``data`` and inserts the gradient all-reduce as usual. (TP composes on
paper as a third axis but is not wired here — at MMTG's 117M params one
of TP or PP is already more than enough; the decode path keeps its
dedicated shard_map TP.)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtg_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_dp_pp_mesh(
    dp: int, pp: int, devices=None
) -> Mesh:
    """``(data, pipe)`` mesh: gradient all-reduce rides the data axis
    (GSPMD-inserted), activations ride the pipe axis (ppermute)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp * pp > devices.size:
        raise ValueError(f"mesh ({dp},{pp}) needs {dp * pp} devices, "
                         f"have {devices.size}")
    return Mesh(
        devices.ravel()[: dp * pp].reshape(dp, pp), (DATA_AXIS, PIPE_AXIS)
    )


def pp_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """PartitionSpec tree for pipeline training: the GPT-2 stacked layer
    leaves shard their leading ``[L]`` axis over ``pipe``; everything
    else (embeddings, final LN, encoder/attention/projector) is
    replicated. L must divide by the pipe size."""
    pp = mesh.shape[PIPE_AXIS]

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if len(path) >= 2 and path[0] == "gpt2" and path[1] == "h":
            if tree.shape[0] % pp:
                raise ValueError(
                    f"n_layer {tree.shape[0]} not divisible by pipe={pp}"
                )
            return NamedSharding(mesh, P(PIPE_AXIS))
        return NamedSharding(mesh, P())

    return walk(params)


def shard_params_pp(params: Dict, mesh: Mesh) -> Dict:
    return jax.device_put(params, pp_param_shardings(params, mesh))


def _aux_spec(leaf, batch: int):
    """Batch-leading aux tensors (attention biases) shard over data;
    everything else (rng keys, scalars) is replicated."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == batch:
        return P(DATA_AXIS)
    return P()


def pipeline_stack(
    make_block: Callable,
    stacked_params: Dict,
    h: jnp.ndarray,
    aux,
    mesh: Mesh,
    n_micro: int,
) -> jnp.ndarray:
    """Run ``h`` through the full stacked-layer block sequence, pipelined
    over the mesh's ``pipe`` axis.

    Args:
      make_block: ``aux -> block_fn`` builder. ``block_fn`` has the layer
        scan signature ``((h, layer_idx), layer_params) ->
        ((h, layer_idx + 1), None)`` — i.e. exactly the (possibly
        rematted) body ``gpt2_forward`` scans in the single-program path,
        rebuilt per call so batch-dependent captures (attention biases,
        dropout rng) arrive as shard_map operands, not closures.
      stacked_params: pytree of ``[L, ...]`` leaves (``params["h"]``).
      h: ``[B, T, D]`` activations (B sharded over ``data`` by GSPMD).
      aux: pytree of extra arrays the block needs (additive bias /
        key bias / dropout rng); leaves with leading dim B are treated
        as data-sharded, the rest replicated. ``None`` entries are fine.
      mesh: a mesh with a ``pipe`` axis (e.g. ``make_dp_pp_mesh``).
      n_micro: microbatch count M; the per-device batch must divide by it.

    Returns ``[B, T, D]`` activations after all L layers — equal (up to
    dropout-mask draws, see below) to ``lax.scan(block_fn, (h, 0),
    stacked)``. With dropout active, the per-microbatch rng is folded
    with the microbatch index so microbatches draw independent masks
    (a single full-batch draw and M microbatch draws can't be bit-equal
    either way — shapes differ).
    """
    S = mesh.shape[PIPE_AXIS]
    B, T, D = h.shape
    M = int(n_micro)

    stacked_specs = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    aux_specs = jax.tree.map(lambda l: _aux_spec(l, B), aux)
    # Per-sample aux (attention biases) must be sliced per microbatch —
    # passing the whole [b, ...] tensor into a [mb, ...] block broadcasts
    # the batch dim back up. Mark batch-leading leaves once, outside.
    aux_batched = jax.tree.map(
        lambda l: hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == B,
        aux,
    )

    def fn(h_local, stacked_local, aux_local):
        stage = jax.lax.axis_index(PIPE_AXIS)
        Lp = jax.tree.leaves(stacked_local)[0].shape[0]
        b = h_local.shape[0]
        if b % M:
            raise ValueError(
                f"per-device batch {b} not divisible by n_micro={M}"
            )
        mb = b // M
        h_m = h_local.reshape(M, mb, T, D)
        # stage s's first global layer index is s * Lp (drives the
        # per-layer dropout rng fold, matching the single-program scan)
        first_layer = stage * Lp

        perm = [(i, (i + 1) % S) for i in range(S)]

        def slice_aux(m):
            return jax.tree.map(
                lambda l, isb: (
                    jax.lax.dynamic_index_in_dim(
                        l.reshape((M, mb) + l.shape[1:]), m, 0, keepdims=False
                    )
                    if isb
                    else l
                ),
                aux_local,
                aux_batched,
            )

        def tick(carry, t):
            recv, outs = carry
            m_in = jnp.clip(t, 0, M - 1)
            x = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(h_m, m_in, 0, keepdims=False),
                recv,
            )
            # microbatch index flowing through this stage at tick t —
            # folded into the dropout rng so microbatches draw
            # independent masks
            m_here = jnp.clip(t - stage, 0, M - 1)
            block = make_block(slice_aux(m_here), m_here)
            (y, _), _ = jax.lax.scan(block, (x, first_layer), stacked_local)
            o_t = t - (S - 1)
            oidx = jnp.clip(o_t, 0, M - 1)
            valid = (
                (o_t >= 0) & (o_t < M) & (stage == S - 1)
            )
            cur = jax.lax.dynamic_index_in_dim(outs, oidx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), oidx, 0
            )
            recv = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (recv, outs), None

        carry0 = (
            jnp.zeros((mb, T, D), h_local.dtype),
            jnp.zeros((M, mb, T, D), h_local.dtype),
        )
        (_, outs), _ = jax.lax.scan(
            tick, carry0, jnp.arange(M + S - 1, dtype=jnp.int32)
        )
        # only the last stage holds real outputs — broadcast over pipe
        outs = jax.lax.psum(
            jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)), PIPE_AXIS
        )
        return outs.reshape(b, T, D)

    # per-device results differ over pipe (only the last stage computes
    # the real outputs before the psum broadcast) → varying-manual-axes /
    # replication checking must be off. jax >= 0.8 spells it check_vma.
    try:
        sm = shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), stacked_specs, aux_specs),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        sm = shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), stacked_specs, aux_specs),
            out_specs=P(DATA_AXIS),
            check_rep=False,
        )
    return sm(h, stacked_params, aux)
