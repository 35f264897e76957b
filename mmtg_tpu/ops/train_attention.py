"""Pallas TPU kernel: fused causal self-attention for the TRAIN forward,
with a custom-VJP backward — the probability matrix never touches HBM.

Why this exists (measured on a v5e chip, batch 256 × 236 tokens):
the XLA train path materializes per-layer ``[B, H, T, T]`` score/prob
tensors (3.8 GB each) plus a threefry dropout mask of the same shape —
together they dominate the 689 ms train step (probe: dropout alone is
197 ms; the no-dropout forward is still ~50% attention HBM traffic).
At T ≤ ~512 the ``[bB, T, T]`` score tile of a block of batch rows for
one head fits comfortably in VMEM, so "flash" here means: one program
per (batch block, head) computes scores → bias/causal mask → f32
softmax → (hardware-PRNG) dropout → context entirely on-chip. The
backward kernel recomputes the same probabilities tile-wise
(regenerating the identical dropout bits from the same seed) and emits
the fused d(qkv) — no residuals beyond the layer inputs.

Layout contract (Mosaic-driven, see ``ops/decode_attention.py`` notes):
  * q/k/v arrive FUSED and HEAD-MAJOR: ``[B, T, H*384]`` where head
    ``h`` owns lanes ``[h*384, (h+1)*384)`` as ``[q_h | k_h | v_h]``,
    each padded from ``hd`` to 128 lanes. The padding and the
    head-major column order are folded into the *weights* of the QKV
    projection by the caller (``pad_qkv_weights``), so no activation
    split/transpose/re-tiling ever happens; one 384-lane block per
    (batch block, head) program is a single 128-aligned slice, and the
    backward writes d(qkv) back into the SAME fused layout — the
    jnp.split/concatenate copies of a per-tensor API (measured ~68
    ms/step at b256: 22 fwd split + 22 remat split + 24 bwd concat)
    simply never exist.
  * T must be a multiple of 128 (the caller pads the sequence once for
    the whole layer stack; padded keys carry a -inf bias, padded query
    rows are sliced off afterwards).
  * the key-padding mask is a per-row ``[B, T]`` f32 additive bias —
    the [B, H, T, T] broadcast the stock path needs simply never exists.

Numerics: scores and softmax in float32 (the XLA path softmaxes in
bf16 — the kernel is strictly more accurate); the prob·V and gradient
matmuls run in the input dtype on the MXU with f32 accumulation.

Faithfulness: replaces reference ``modeling_gpt2`` attention semantics
(HF GPT2Attention: causal mask + additive key-padding bias + softmax +
dropout) for training; reference drives it via ``model.py:282-288``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128  # padded per-head width
SLAB = 3 * LANES  # per-head fused q|k|v lane count

# Test hook: force interpret-mode lowering (CPU CI) without threading an
# extra argument through gpt2_forward.
INTERPRET = False


def _batch_block(B: int) -> int:
    """Rows per program. One (batch row, head) per program is ~0.3 µs of
    MXU work — per-program setup dominates (measured: slower than the XLA
    path). Blocks of 16 rows turn the grid from B·H programs into
    (B/16)·H fat ones whose [bB, T, T] f32 scratch still fits VMEM at
    T ≤ 512."""
    bB = 16
    while B % bB:
        bB //= 2
    return bB


def _causal_bias(T: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    return jnp.where(col <= row, 0.0, NEG_INF).astype(jnp.float32)


def _probs(q, k, bias_ref, scale):
    """[bB, T, T] f32 post-softmax probabilities for bB rows of one head.

    Single-batch-dim ``dot_general`` — the layout Mosaic lowers well
    (two batch dims don't lower at all; see ops/decode_attention.py)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    T = s.shape[-1]
    # bias_ref: [bB, 1, T] key-padding rows; causal [T, T] broadcasts.
    s = s * scale + bias_ref[...] + _causal_bias(T)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=2, keepdims=True)


def _dropout_keep(seed_ref, shape, rate: float):
    """Deterministic per-program keep mask from the on-core PRNG.

    Seeded with (step seed, flat program id): the backward kernel runs
    the SAME (head, batch-block) grid and reseeds identically, so the
    mask is regenerated bit-exactly and never stored. (Mosaic accepts at
    most 2 seed words.)"""
    flat_pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    thr = jnp.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))
    if INTERPRET:
        # interpret mode (CI CPU) can't lower the Mosaic hardware PRNG;
        # substitute a threefry stream keyed identically on
        # (step seed, program id) — same structure, so the fwd/bwd
        # regeneration invariant is exercised in CI. On hardware the
        # rbg path below runs (~an order of magnitude cheaper).
        key = jax.random.fold_in(
            jax.random.key(seed_ref[0].astype(jnp.uint32)), flat_pid
        )
        bits = jax.random.bits(key, shape, jnp.uint32)
        return bits >= thr
    pltpu.prng_seed(seed_ref[0], flat_pid)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= thr


def _fwd_kernel(seed_ref, qkv_ref, qb_ref, bias_ref, o_ref,
                *, scale: float, rate: float):
    q = qkv_ref[:, :, 0 * LANES:1 * LANES] + qb_ref[0, 0 * LANES:1 * LANES]
    k = qkv_ref[:, :, 1 * LANES:2 * LANES] + qb_ref[0, 1 * LANES:2 * LANES]
    p = _probs(q, k, bias_ref, scale)
    if rate > 0.0:
        keep = _dropout_keep(seed_ref, p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    v = qkv_ref[:, :, 2 * LANES:3 * LANES] + qb_ref[0, 2 * LANES:3 * LANES]
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, qb_ref, bias_ref, do_ref,
                dqkv_ref, dqb_ref, *, scale: float, rate: float):
    q = qkv_ref[:, :, 0 * LANES:1 * LANES] + qb_ref[0, 0 * LANES:1 * LANES]
    k = qkv_ref[:, :, 1 * LANES:2 * LANES] + qb_ref[0, 1 * LANES:2 * LANES]
    v = qkv_ref[:, :, 2 * LANES:3 * LANES] + qb_ref[0, 2 * LANES:3 * LANES]
    p = _probs(q, k, bias_ref, scale)  # recomputed, f32
    if rate > 0.0:
        keep = _dropout_keep(seed_ref, p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p * inv, 0.0)  # post-dropout probs
    else:
        pd = p
    do = do_ref[...]
    # dqkv's dtype, NOT v's: an f32 projection bias promotes v to f32
    # even when the slab (and the output ref) are bf16
    dt = dqkv_ref.dtype
    # dv[b, j, d] = sum_i pd[b, i, j] * do[b, i, d]
    dv = jax.lax.dot_general(
        pd.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqkv_ref[:, :, 2 * LANES:3 * LANES] = dv.astype(dt)
    # d(post-dropout p)[b, i, j] = sum_d do[b, i, d] * v[b, j, d]
    dpd = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
    # softmax VJP (pre-dropout p): ds = p * (dp - sum_j dp*p)
    ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
    ds = (ds * scale).astype(dt)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqkv_ref[:, :, 0 * LANES:1 * LANES] = dq.astype(dt)
    # dk[b, j, d] = sum_i ds[b, i, j] * q[b, i, d]
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqkv_ref[:, :, 1 * LANES:2 * LANES] = dk.astype(dt)
    # Accumulated bias grad: d(qkv bias) column-sums while the tiles are
    # still on-chip (an XLA [B·T, H·384] → [H·384] reduce of the dqkv
    # output runs at ~62 GB/s — 9.6 ms/step at b256). The batch-block
    # grid dim is inner + "arbitrary", so the (8, SLAB) block is
    # revisited consecutively and lives in VMEM for the whole head.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dqb_ref[...] = jnp.zeros_like(dqb_ref)

    acc = dqb_ref[0, :]
    dqb_ref[0, 0 * LANES:1 * LANES] = (
        acc[0 * LANES:1 * LANES] + jnp.sum(dq, axis=(0, 1))
    )
    dqb_ref[0, 1 * LANES:2 * LANES] = (
        acc[1 * LANES:2 * LANES] + jnp.sum(dk, axis=(0, 1))
    )
    dqb_ref[0, 2 * LANES:3 * LANES] = (
        acc[2 * LANES:3 * LANES] + jnp.sum(dv, axis=(0, 1))
    )


def _specs(T: int, bB: int):
    # Grid is (head, batch-block) — batch INNER so the accumulated
    # d(bias) output block is revisited on consecutive programs.
    # Index maps get (grid indices..., scalar-prefetch ref) — ignore the
    # ref.
    slab_block = pl.BlockSpec(
        (bB, T, SLAB), lambda h, b, s: (b, 0, h), memory_space=pltpu.VMEM
    )
    head_block = pl.BlockSpec(
        (bB, T, LANES), lambda h, b, s: (b, 0, h), memory_space=pltpu.VMEM
    )
    # bias rides as [B, 1, T]: a (bB, T) block would violate the sublane
    # rule (2nd-to-last dim must divide 8 or equal the array dim)
    bias_block = pl.BlockSpec(
        (bB, 1, T), lambda h, b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # qkv projection bias [8, H·384] (row 0 live; 8 rows for the sublane
    # rule); per-program slab slice
    qb_block = pl.BlockSpec(
        (8, SLAB), lambda h, b, s: (0, h), memory_space=pltpu.VMEM
    )
    return slab_block, head_block, bias_block, qb_block


_COMPILER_PARAMS_FWD = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=128 * 1024 * 1024,
)
# the bwd accumulates d(bias) across the batch-block grid dim
_COMPILER_PARAMS_BWD = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=128 * 1024 * 1024,
)


def _pad8(qkv_bias):
    """[H·384] → [8, H·384] (row 0 live) for the sublane rule."""
    return jnp.pad(qkv_bias[None, :], ((0, 7), (0, 0)))


def _fwd_call(qkv, qkv_bias, bias, seed, n_head, rate, scale, interpret):
    B, T, _ = qkv.shape
    bB = _batch_block(B)
    slab_block, head_block, bias_block, qb_block = _specs(T, bB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_head, B // bB),
        in_specs=[slab_block, qb_block, bias_block],
        out_specs=head_block,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, n_head * LANES), qkv.dtype),
        compiler_params=_COMPILER_PARAMS_FWD,
        interpret=interpret or INTERPRET,
    )(seed, qkv, _pad8(qkv_bias), bias[:, None, :])


def _bwd_call(qkv, qkv_bias, bias, seed, do, n_head, rate, scale, interpret):
    B, T, HS = qkv.shape
    bB = _batch_block(B)
    slab_block, head_block, bias_block, qb_block = _specs(T, bB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_head, B // bB),
        in_specs=[slab_block, qb_block, bias_block, head_block],
        out_specs=(slab_block, qb_block),
    )
    dqkv, dqb8 = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, HS), qkv.dtype),
            jax.ShapeDtypeStruct((8, HS), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS_BWD,
        interpret=interpret or INTERPRET,
    )(seed, qkv, _pad8(qkv_bias), bias[:, None, :], do)
    return dqkv, dqb8[0].astype(qkv_bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def mha_train(qkv, qkv_bias, bias, seed, n_head, dropout_rate=0.0,
              scale=1.0, interpret=False):
    """Fused causal multi-head attention over a head-major qkv slab.

    Args:
      qkv: ``[B, T, n_head*384]`` — per head ``h``, lanes
        ``[h*384, (h+1)*384)`` hold ``[q_h | k_h | v_h]``, each padded
        from the true head_dim to 128 lanes (zero pad columns; fold the
        padding + column order into the QKV weights via
        ``pad_qkv_weights``). T must be a multiple of 128. The QKV
        projection BIAS is not pre-added: pass it separately so its
        gradient comes from in-kernel partial sums (XLA's standalone
        [B·T, H·384] → [H·384] reduce of dqkv costs 9.6 ms/step at b256).
      qkv_bias: ``[n_head*384]`` head-major padded projection bias
        (second output of ``pad_qkv_weights``), added on-chip.
      bias: ``[B, T]`` f32 additive key bias (0 live / NEG_INF padded).
        CONTRACT: treated as non-differentiable data — the custom VJP
        returns a ZERO cotangent for it (the true softmax gradient wrt
        an additive bias is nonzero). Callers pass a mask-derived,
        non-trainable bias; do NOT reuse ``mha_train`` with a learned
        bias, it would silently train on zero gradients.
      seed: ``[1]`` int32 dropout seed (ignored when dropout_rate == 0).
      n_head: head count (static).
      dropout_rate: attention-prob dropout (static; 0 disables).
      scale: score scale, normally ``1/sqrt(true_head_dim)`` (static).
    Returns:
      context ``[B, T, n_head*128]`` in qkv's dtype; pad lanes are zero
      whenever v's pad lanes are zero.
    """
    return _fwd_call(qkv, qkv_bias, bias, seed, n_head, dropout_rate,
                     scale, interpret)


def _mha_fwd(qkv, qkv_bias, bias, seed, n_head, dropout_rate, scale,
             interpret):
    out = _fwd_call(qkv, qkv_bias, bias, seed, n_head, dropout_rate,
                    scale, interpret)
    return out, (qkv, qkv_bias, bias, seed)


def _mha_bwd(n_head, dropout_rate, scale, interpret, res, g):
    qkv, qkv_bias, bias, seed = res
    dqkv, dqb = _bwd_call(qkv, qkv_bias, bias, seed, g, n_head,
                          dropout_rate, scale, interpret)
    # bias is data (key-padding), seed is an int — no cotangents.
    return dqkv, dqb, jnp.zeros_like(bias), None


mha_train.defvjp(_mha_fwd, _mha_bwd)


# ---------------------------------------------------------------------------
# Packed (unpadded) variant — standard c_attn slab, no head-dim padding
# ---------------------------------------------------------------------------
#
# The padded slab above costs 2x FLOPs on every matmul that touches it:
# the QKV projection runs [D, H·384] instead of [D, 3·H·hd] (fwd + remat
# recompute + dW + dX all doubled) and the output projection consumes a
# [H·128, D] context instead of [H·hd, D]. Round-5 trace attribution
# (tools/trace_train.py, b256): qkv fwd 30.4 ms at its PADDED floor of
# ~31 — i.e. at 2x the real work's floor of ~15.5. The packed kernel
# removes the padding entirely: q|k|v arrive in the STANDARD GPT-2
# c_attn order ``[B, T, 3·H·hd]`` (q all heads | k all heads | v all
# heads — exactly what ``a @ attn_w`` emits, no weight munging), the
# grid runs over batch blocks only, and an unrolled in-kernel head loop
# takes static 64-lane slices per head (Mosaic accepts static lane
# slices of 16/32/64 within a 128 block — CLAUDE.md rule 6; only
# DYNAMIC lane slices must be 128-aligned). The attention dots run with
# 64-wide contraction/output dims — the same MXU cycles as the padded
# 128 dims (half-occupancy on a 128x128 array), so in-kernel time is
# unchanged while every projection around the kernel halves.


def _head_slices(qkv_ref, qb_ref, h: int, n_head: int, hd: int):
    """Static per-head q/k/v 64-lane slices from the standard slab."""
    H = n_head * hd
    q = qkv_ref[:, :, h * hd:(h + 1) * hd] + qb_ref[0, h * hd:(h + 1) * hd]
    k = (qkv_ref[:, :, H + h * hd:H + (h + 1) * hd]
         + qb_ref[0, H + h * hd:H + (h + 1) * hd])
    v = (qkv_ref[:, :, 2 * H + h * hd:2 * H + (h + 1) * hd]
         + qb_ref[0, 2 * H + h * hd:2 * H + (h + 1) * hd])
    return q, k, v


def _fwd_kernel_packed(seed_ref, qkv_ref, qb_ref, bias_ref, o_ref,
                       *, scale: float, rate: float, n_head: int, hd: int):
    for h in range(n_head):
        q, k, v = _head_slices(qkv_ref, qb_ref, h, n_head, hd)
        p = _probs(q, k, bias_ref, scale)
        if rate > 0.0:
            keep = _dropout_keep_at(seed_ref, h, n_head, p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o_ref[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _dropout_keep_at(seed_ref, h: int, n_head: int, shape, rate: float):
    """Per-(program, head) keep mask; fwd and bwd reseed identically."""
    idx = pl.program_id(0) * n_head + h
    thr = jnp.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))
    if INTERPRET:
        key = jax.random.fold_in(
            jax.random.key(seed_ref[0].astype(jnp.uint32)), idx
        )
        bits = jax.random.bits(key, shape, jnp.uint32)
        return bits >= thr
    pltpu.prng_seed(seed_ref[0], idx)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= thr


def _bwd_kernel_packed(seed_ref, qkv_ref, qb_ref, bias_ref, do_ref,
                       dqkv_ref, dqb_ref, *, scale: float, rate: float,
                       n_head: int, hd: int):
    H = n_head * hd

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqb_ref[...] = jnp.zeros_like(dqb_ref)

    for h in range(n_head):
        q, k, v = _head_slices(qkv_ref, qb_ref, h, n_head, hd)
        p = _probs(q, k, bias_ref, scale)  # recomputed, f32
        if rate > 0.0:
            keep = _dropout_keep_at(seed_ref, h, n_head, p.shape, rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        # dqkv's dtype, NOT v's: the f32 bias row promotes v to f32 even
        # when the slab (and the output ref) are bf16
        dt = dqkv_ref.dtype
        dv = jax.lax.dot_general(
            pd.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, 2 * H + h * hd:2 * H + (h + 1) * hd] = dv.astype(dt)
        dpd = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
        ds = (ds * scale).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dt)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, H + h * hd:H + (h + 1) * hd] = dk.astype(dt)
        # bias grad partials accumulated in VMEM across the batch grid
        acc = dqb_ref[0, :]
        dqb_ref[0, h * hd:(h + 1) * hd] = (
            acc[h * hd:(h + 1) * hd] + jnp.sum(dq, axis=(0, 1))
        )
        dqb_ref[0, H + h * hd:H + (h + 1) * hd] = (
            acc[H + h * hd:H + (h + 1) * hd] + jnp.sum(dk, axis=(0, 1))
        )
        dqb_ref[0, 2 * H + h * hd:2 * H + (h + 1) * hd] = (
            acc[2 * H + h * hd:2 * H + (h + 1) * hd] + jnp.sum(dv, axis=(0, 1))
        )


def _batch_block_packed(B: int, T: int = 256) -> int:
    """Rows per program. The whole [bB, T, 3·H·hd] slab + [bB, T, T] f32
    score scratch must fit VMEM with Mosaic's 2-level window buffering:
    8 rows fits at T ≤ 384 (measured); the bwd at bB=8, T=512 needs
    151.9 M of 128 M (measured overflow, r05 packing bench), so bB
    halves as T grows — bB·T ≤ 3072."""
    bB = 8
    while bB > 1 and bB * T > 3072:
        bB //= 2
    while B % bB:
        bB //= 2
    return bB


def _specs_packed(T: int, bB: int, S: int, H: int):
    slab_block = pl.BlockSpec(
        (bB, T, S), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    ctx_block = pl.BlockSpec(
        (bB, T, H), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    bias_block = pl.BlockSpec(
        (bB, 1, T), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    qb_block = pl.BlockSpec(
        (8, S), lambda b, s: (0, 0), memory_space=pltpu.VMEM
    )
    return slab_block, ctx_block, bias_block, qb_block


def _fwd_call_packed(qkv, qkv_bias, bias, seed, n_head, rate, scale,
                     interpret):
    B, T, S = qkv.shape
    hd = S // (3 * n_head)
    bB = _batch_block_packed(B, T)
    slab_block, ctx_block, bias_block, qb_block = _specs_packed(
        T, bB, S, n_head * hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bB,),
        in_specs=[slab_block, qb_block, bias_block],
        out_specs=ctx_block,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, rate=rate,
                          n_head=n_head, hd=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, n_head * hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or INTERPRET,
    )(seed, qkv, _pad8(qkv_bias), bias[:, None, :])


def _bwd_call_packed(qkv, qkv_bias, bias, seed, do, n_head, rate, scale,
                     interpret):
    B, T, S = qkv.shape
    hd = S // (3 * n_head)
    bB = _batch_block_packed(B, T)
    slab_block, ctx_block, bias_block, qb_block = _specs_packed(
        T, bB, S, n_head * hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bB,),
        in_specs=[slab_block, qb_block, bias_block, ctx_block],
        out_specs=(slab_block, qb_block),
    )
    dqkv, dqb8 = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, rate=rate,
                          n_head=n_head, hd=hd),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S), qkv.dtype),
            jax.ShapeDtypeStruct((8, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or INTERPRET,
    )(seed, qkv, _pad8(qkv_bias), bias[:, None, :], do)
    return dqkv, dqb8[0].astype(qkv_bias.dtype)


# -- segment-masked variant (sequence packing, mmtg_tpu/pack.py) ------------
#
# Same packed slab; the [B, T] additive key bias is replaced by [B, T]
# int32 SEGMENT ids: token i may attend token j iff seg[i] == seg[j] and
# j <= i. Packed rows hold several samples; pad slots share one dedicated
# segment (max_slots) so their softmax rows still see themselves (never
# all -inf) while never mixing with real tokens. The combined
# causal+segment bias matrix is built ONCE per program and reused by all
# unrolled heads.


def _seg_bias(seg_ref, T: int):
    seg = seg_ref[:, 0, :]
    eq = seg[:, :, None] == seg[:, None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    ok = eq & (col <= row)[None, :, :]
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


def _probs_mat(q, k, bias_mat, scale):
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias_mat
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=2, keepdims=True)


def _fwd_kernel_packed_seg(seed_ref, qkv_ref, qb_ref, seg_ref, o_ref,
                           *, scale: float, rate: float, n_head: int,
                           hd: int):
    bias_mat = _seg_bias(seg_ref, o_ref.shape[1])
    for h in range(n_head):
        q, k, v = _head_slices(qkv_ref, qb_ref, h, n_head, hd)
        p = _probs_mat(q, k, bias_mat, scale)
        if rate > 0.0:
            keep = _dropout_keep_at(seed_ref, h, n_head, p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o_ref[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(o_ref.dtype), v.astype(o_ref.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel_packed_seg(seed_ref, qkv_ref, qb_ref, seg_ref, do_ref,
                           dqkv_ref, dqb_ref, *, scale: float, rate: float,
                           n_head: int, hd: int):
    H = n_head * hd
    T = do_ref.shape[1]
    bias_mat = _seg_bias(seg_ref, T)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqb_ref[...] = jnp.zeros_like(dqb_ref)

    for h in range(n_head):
        q, k, v = _head_slices(qkv_ref, qb_ref, h, n_head, hd)
        p = _probs_mat(q, k, bias_mat, scale)
        if rate > 0.0:
            keep = _dropout_keep_at(seed_ref, h, n_head, p.shape, rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        dt = dqkv_ref.dtype
        dv = jax.lax.dot_general(
            pd.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, 2 * H + h * hd:2 * H + (h + 1) * hd] = dv.astype(dt)
        dpd = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
        ds = (ds * scale).astype(dt)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dt)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, H + h * hd:H + (h + 1) * hd] = dk.astype(dt)
        acc = dqb_ref[0, :]
        dqb_ref[0, h * hd:(h + 1) * hd] = (
            acc[h * hd:(h + 1) * hd] + jnp.sum(dq, axis=(0, 1))
        )
        dqb_ref[0, H + h * hd:H + (h + 1) * hd] = (
            acc[H + h * hd:H + (h + 1) * hd] + jnp.sum(dk, axis=(0, 1))
        )
        dqb_ref[0, 2 * H + h * hd:2 * H + (h + 1) * hd] = (
            acc[2 * H + h * hd:2 * H + (h + 1) * hd] + jnp.sum(dv, axis=(0, 1))
        )


def _seg_call_packed(kernel, qkv, qkv_bias, seg, seed, n_head, rate, scale,
                     interpret, bwd_do=None):
    B, T, S = qkv.shape
    hd = S // (3 * n_head)
    bB = _batch_block_packed(B, T)
    slab_block, ctx_block, _, qb_block = _specs_packed(T, bB, S, n_head * hd)
    seg_block = pl.BlockSpec(
        (bB, 1, T), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    if bwd_do is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // bB,),
            in_specs=[slab_block, qb_block, seg_block],
            out_specs=ctx_block,
        )
        return pl.pallas_call(
            functools.partial(kernel, scale=scale, rate=rate,
                              n_head=n_head, hd=hd),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, n_head * hd), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret or INTERPRET,
        )(seed, qkv, _pad8(qkv_bias), seg[:, None, :])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bB,),
        in_specs=[slab_block, qb_block, seg_block, ctx_block],
        out_specs=(slab_block, qb_block),
    )
    dqkv, dqb8 = pl.pallas_call(
        functools.partial(kernel, scale=scale, rate=rate,
                          n_head=n_head, hd=hd),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S), qkv.dtype),
            jax.ShapeDtypeStruct((8, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or INTERPRET,
    )(seed, qkv, _pad8(qkv_bias), seg[:, None, :], bwd_do)
    return dqkv, dqb8[0].astype(qkv_bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def mha_train_packed_seg(qkv, qkv_bias, seg, seed, n_head, dropout_rate=0.0,
                         scale=1.0, interpret=False):
    """:func:`mha_train_packed` with SEGMENT masking instead of a key
    bias: ``seg`` is ``[B, T]`` int32; attention is causal within equal
    segment ids and blocked across them (sequence packing,
    :mod:`mmtg_tpu.pack`). ``seg`` is non-differentiable data."""
    return _seg_call_packed(_fwd_kernel_packed_seg, qkv, qkv_bias, seg,
                            seed, n_head, dropout_rate, scale, interpret)


def _mha_seg_fwd(qkv, qkv_bias, seg, seed, n_head, dropout_rate, scale,
                 interpret):
    out = _seg_call_packed(_fwd_kernel_packed_seg, qkv, qkv_bias, seg,
                           seed, n_head, dropout_rate, scale, interpret)
    return out, (qkv, qkv_bias, seg, seed)


def _mha_seg_bwd(n_head, dropout_rate, scale, interpret, res, g):
    qkv, qkv_bias, seg, seed = res
    dqkv, dqb = _seg_call_packed(_bwd_kernel_packed_seg, qkv, qkv_bias, seg,
                                 seed, n_head, dropout_rate, scale,
                                 interpret, bwd_do=g)
    return dqkv, dqb, None, None


mha_train_packed_seg.defvjp(_mha_seg_fwd, _mha_seg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def mha_train_packed(qkv, qkv_bias, bias, seed, n_head, dropout_rate=0.0,
                     scale=1.0, interpret=False):
    """Fused causal multi-head attention over a STANDARD-order qkv slab.

    Same semantics/contract as :func:`mha_train` (causal + additive key
    bias + f32 softmax + on-core dropout; ``bias`` is non-differentiable
    data; the projection bias gradient comes from in-kernel partial
    sums) — but the slab is the plain ``a @ attn_w + 0`` layout
    ``[B, T, 3·H·hd]`` (q all heads | k | v) with NO per-head padding,
    and the context comes back as ``[B, T, H·hd]``. Every matmul feeding
    or consuming the kernel therefore runs at its true size: at b256
    this halves qkv fwd/remat/dW/dX and the output-projection family
    (~75 ms/step of padding FLOPs — tools/trace_train.py round-5 table).
    T must still be a multiple of 128.
    """
    return _fwd_call_packed(qkv, qkv_bias, bias, seed, n_head,
                            dropout_rate, scale, interpret)


def _mha_packed_fwd(qkv, qkv_bias, bias, seed, n_head, dropout_rate, scale,
                    interpret):
    out = _fwd_call_packed(qkv, qkv_bias, bias, seed, n_head, dropout_rate,
                           scale, interpret)
    return out, (qkv, qkv_bias, bias, seed)


def _mha_packed_bwd(n_head, dropout_rate, scale, interpret, res, g):
    qkv, qkv_bias, bias, seed = res
    dqkv, dqb = _bwd_call_packed(qkv, qkv_bias, bias, seed, g, n_head,
                                 dropout_rate, scale, interpret)
    return dqkv, dqb, jnp.zeros_like(bias), None


mha_train_packed.defvjp(_mha_packed_fwd, _mha_packed_bwd)


# ---------------------------------------------------------------------------
# Weight-side padding helpers (used by models/gpt2.py)
# ---------------------------------------------------------------------------


def pad_qkv_weights(attn_w, attn_b, n_head: int, head_dim: int):
    """``[D, 3·H·hd]`` QKV weight/bias → ``[D, H·384]`` head-major with
    zero pad columns per head (``[q_h|k_h|v_h]`` slabs), so the
    projection directly emits the kernel's fused layout (the pad is a
    ~7 MB weight copy per layer, not a [B,T,·] activation relayout)."""
    D = attn_w.shape[0]
    w = attn_w.reshape(D, 3, n_head, head_dim)
    b = attn_b.reshape(3, n_head, head_dim)
    pad = LANES - head_dim
    w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad)))
    b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    # [D, 3, H, 128] → [D, H, 3, 128] → [D, H*384]
    w = w.transpose(0, 2, 1, 3).reshape(D, n_head * SLAB)
    b = b.transpose(1, 0, 2).reshape(n_head * SLAB)
    return w, b


def pad_proj_weights(proj_w, n_head: int, head_dim: int):
    """``[H·hd, D]`` attention output projection → ``[H·128, D]`` with
    zero pad rows, consuming the kernel's padded context directly."""
    D = proj_w.shape[1]
    w = proj_w.reshape(n_head, head_dim, D)
    w = jnp.pad(w, ((0, 0), (0, LANES - head_dim), (0, 0)))
    return w.reshape(n_head * LANES, D)
