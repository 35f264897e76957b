"""Pallas TPU kernel: single-token decode attention with dynamic-length
cache reads.

The XLA decode path must attend over the cache's full static capacity
every step — at step t only t+1 slots are live, so a large share of the
HBM traffic (the decode bottleneck) streams dead slots. This kernel takes
the current ``position`` and layer index as scalar-prefetch arguments and
DMAs only ``ceil((position+1)/TILE)`` cache tiles, flash-accumulating
across tiles with double-buffered loads.

Layout and lowering notes (each learned from a Mosaic rejection or a
bandwidth measurement):
  * the cache is ``[L, B, T, D]`` with the head dim merged into lanes
    (D = H·hd = 768): a time-tile slice ``[bB, TS, 768]`` is a single
    96KB-contiguous DMA run per row — ``[.., hd, T]`` layouts degrade to
    256-byte runs (~6× bandwidth loss), and ``[.., T, hd=64]`` layouts
    get lane-padded to 128 and rejected for slicing;
  * per-head score/weighted-sum separation uses an on-the-fly segment
    matrix (``SEG[i, h] = i//hd == h``) on the MXU: scores =
    ``(q·K_tile) @ SEG`` and the probability expansion is ``p @ SEGᵀ`` —
    no lane-group reshapes (Mosaic relayouts) anywhere;
  * two-batch-dim dot_generals don't lower; everything here is a single
    batch dim or elementwise;
  * the pad mask is DMA'd per tile as an additive f32 bias (dynamic
    lane-dim vector slices must be 128-aligned; DMA takes any stride);
  * the whole stacked cache is passed in and the layer picked inside the
    DMA index — an XLA-side ``cache[l]`` would copy a full layer per call.

Numerics: scores/softmax accumulate in float32; output in the query dtype.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    scalar_ref,  # scalar prefetch: [2] int32 (position, layer)
    q_ref,  # [bB, D] VMEM (already merged heads, pre-scaled)
    k_hbm,  # [L, B, T, D] HBM
    v_hbm,  # [L, B, T, D] HBM
    bias_hbm,  # [B, T] f32 HBM: 0 live, NEG_INF on PAD slots
    ctx_ref,  # [bB, D] VMEM out (merged heads)
    k_tile,  # [2, bB, TS, D] VMEM scratch (double buffer)
    v_tile,
    bias_tile,  # [2, bB, TS] f32 VMEM scratch
    sems,  # DMA semaphores [2, 3]
    *,
    bB: int,
    TS: int,
    n_head: int,
):
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    b0 = pl.program_id(0) * bB
    num_tiles = pos // TS + 1
    D = q_ref.shape[1]
    hd = D // n_head

    def copy(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TS, TS), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds(t * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 2],
        )

    k_copy = lambda t, s: copy(k_hbm, k_tile, t, s, 0)
    v_copy = lambda t, s: copy(v_hbm, v_tile, t, s, 1)

    # warm up buffer 0
    k_copy(0, 0).start()
    v_copy(0, 0).start()
    bias_copy(0, 0).start()

    q = q_ref[:].astype(jnp.float32)  # [bB, D]
    # Head-segment matrix SEG[i, h] = (i // hd == h), built from iota.
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    seg = (lane // hd == head).astype(jnp.float32)  # [D, H]

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            k_copy(t + 1, nxt).start()
            v_copy(t + 1, nxt).start()
            bias_copy(t + 1, nxt).start()

        k_copy(t, slot).wait()
        v_copy(t, slot).wait()
        bias_copy(t, slot).wait()
        k = k_tile[slot].astype(jnp.float32)  # [bB, TS, D]
        v = v_tile[slot].astype(jnp.float32)

        prod = q[:, None, :] * k  # [bB, TS, D]
        s = jax.lax.dot_general(
            prod, seg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, H]
        s = s + bias_tile[slot][:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TS
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))  # [bB,1,H]
        corr = jnp.exp(m - m_new)  # [bB, 1, H]
        p = jnp.exp(s - m_new)  # [bB, TS, H]
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pe = jax.lax.dot_general(
            p, seg.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, D]
        corr_lanes = jax.lax.dot_general(
            corr[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, D]
        acc_new = acc * corr_lanes + jnp.sum(pe * v, axis=1)
        return m_new, l_new, acc_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, a0))
    l_lanes = jax.lax.dot_general(
        l[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bB, D]
    ctx_ref[:] = (acc / l_lanes).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "block_b", "tile_t", "interpret")
)
def decode_attention(
    q: jnp.ndarray,  # [B, D] merged heads
    k_cache: jnp.ndarray,  # [L, B, T, D]
    v_cache: jnp.ndarray,  # [L, B, T, D]
    key_mask: jnp.ndarray,  # [B, T] int32
    position: jnp.ndarray,  # scalar int32
    layer: jnp.ndarray,  # scalar int32
    n_head: int = 12,
    block_b: int = 16,
    # 128: dynamic lane-dim DMA slices (the bias tile) must be 128-aligned
    tile_t: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention of one query token over layer ``layer``'s live cache
    prefix; returns the merged-head context ``[B, D]``.

    Slots with index > ``position`` or ``key_mask == 0`` are ignored;
    tiles beyond ``position // tile_t`` are never read from HBM.
    """
    L, B, T, D = k_cache.shape
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    scale = 1.0 / math.sqrt(hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # k cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # pad bias stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t, D), k_cache.dtype),
            pltpu.VMEM((2, block_b, tile_t, D), v_cache.dtype),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(_kernel, bB=block_b, TS=tile_t, n_head=n_head)
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    scalars = jnp.stack([position.astype(jnp.int32), layer.astype(jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        # larger batch blocks = fewer sequential programs per call (the
        # per-program setup overhead is measurable); allow the double
        # buffers to use more VMEM than the conservative default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype), k_cache, v_cache, pad_bias)


def _kernel_int8(
    scalar_ref,  # [2] int32 (position, layer)
    q_ref,  # [bB, D] VMEM (merged heads, pre-scaled)
    k_hbm,  # [L, B, T, D] int8 HBM
    v_hbm,  # [L, B, T, D] int8 HBM
    ks_hbm,  # [L, B, T] f32 per-row k scales
    vs_hbm,  # [L, B, T] f32 per-row v scales
    bias_hbm,  # [B, T] f32
    ctx_ref,  # [bB, D] VMEM out
    k_tile,  # [2, bB, TS, D] int8 scratch
    v_tile,
    ks_tile,  # [2, bB, TS] f32 scratch
    vs_tile,
    bias_tile,  # [2, bB, TS] f32 scratch
    sems,  # DMA semaphores [2, 5]
    *,
    bB: int,
    TS: int,
    n_head: int,
):
    """int8 variant: scales fold in *after* the per-head reduction
    (``s = ks·Σ q·k_int8``) and into the expanded probabilities
    (``pe·vs``), so dequantization costs two broadcasts, not a cast of
    the whole tile."""
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    b0 = pl.program_id(0) * bB
    num_tiles = pos // TS + 1
    D = q_ref.shape[1]
    hd = D // n_head

    def copy4(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TS, TS), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def copy3(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TS, TS)],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds(t * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 4],
        )

    def start_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).start()
        copy4(v_hbm, v_tile, t, slot, 1).start()
        copy3(ks_hbm, ks_tile, t, slot, 2).start()
        copy3(vs_hbm, vs_tile, t, slot, 3).start()
        bias_copy(t, slot).start()

    def wait_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).wait()
        copy4(v_hbm, v_tile, t, slot, 1).wait()
        copy3(ks_hbm, ks_tile, t, slot, 2).wait()
        copy3(vs_hbm, vs_tile, t, slot, 3).wait()
        bias_copy(t, slot).wait()

    start_all(0, 0)

    q = q_ref[:].astype(jnp.float32)  # [bB, D]
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    seg = (lane // hd == head).astype(jnp.float32)  # [D, H]

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            start_all(t + 1, nxt)

        wait_all(t, slot)
        k = k_tile[slot].astype(jnp.float32)  # [bB, TS, D]
        v = v_tile[slot].astype(jnp.float32)

        prod = q[:, None, :] * k
        s = jax.lax.dot_general(
            prod, seg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, H]
        s = s * ks_tile[slot][:, :, None]  # fold k dequant scale
        s = s + bias_tile[slot][:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TS
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pe = jax.lax.dot_general(
            p, seg.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, D]
        pe = pe * vs_tile[slot][:, :, None]  # fold v dequant scale
        corr_lanes = jax.lax.dot_general(
            corr[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr_lanes + jnp.sum(pe * v, axis=1)
        return m_new, l_new, acc_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, a0))
    l_lanes = jax.lax.dot_general(
        l[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ctx_ref[:] = (acc / l_lanes).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "block_b", "tile_t", "interpret")
)
def decode_attention_int8(
    q: jnp.ndarray,  # [B, D]
    k_cache: jnp.ndarray,  # [L, B, T, D] int8
    v_cache: jnp.ndarray,  # [L, B, T, D] int8
    k_scale: jnp.ndarray,  # [L, B, T] f32
    v_scale: jnp.ndarray,  # [L, B, T] f32
    key_mask: jnp.ndarray,  # [B, T] int32
    position: jnp.ndarray,
    layer: jnp.ndarray,
    n_head: int = 12,
    block_b: int = 16,
    tile_t: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-cache decode attention (see :func:`decode_attention`): half the
    dominant HBM traffic, per-row abs-max dequant folded into scores."""
    L, B, T, D = k_cache.shape
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    scale = 1.0 / math.sqrt(hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t, D), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t, D), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    kernel = functools.partial(
        _kernel_int8, bB=block_b, TS=tile_t, n_head=n_head
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    scalars = jnp.stack([position.astype(jnp.int32), layer.astype(jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype), k_cache, v_cache,
      k_scale, v_scale, pad_bias)


def _kernel_int4(
    scalar_ref,  # [2] int32 (position, layer)
    q_ref,  # [bB, D] VMEM (merged heads, pre-scaled)
    k_hbm,  # [L, B, T, D/2] int8 HBM — packed nibbles (gpt2.quantize_rows_int4)
    v_hbm,  # [L, B, T, D/2] int8 HBM
    ks_hbm,  # [L, B, T] f32 per-row k scales
    vs_hbm,  # [L, B, T] f32 per-row v scales
    bias_hbm,  # [B, T] f32
    ctx_ref,  # [bB, D] VMEM out
    k_tile,  # [2, bB, TS, D/2] int8 scratch
    v_tile,
    ks_tile,  # [2, bB, TS] f32 scratch
    vs_tile,
    bias_tile,  # [2, bB, TS] f32 scratch
    sems,  # DMA semaphores [2, 5]
    *,
    bB: int,
    TS: int,
    n_head: int,
):
    """int4 variant: packed byte j of a cache row holds original lane j
    (low nibble) and lane j + D/2 (high nibble). Unpacking is two int32
    shifts per half; the per-head score reduction runs as two half-lane
    MXU dots against split segment matrices, so no lane interleaving or
    concat relayouts exist anywhere. Scales fold exactly as in the int8
    kernel. Cache traffic is 1/4 of bf16, 1/2 of int8."""
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    b0 = pl.program_id(0) * bB
    num_tiles = pos // TS + 1
    D = q_ref.shape[1]
    D2 = D // 2
    hd = D // n_head

    def copy4(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TS, TS), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def copy3(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TS, TS)],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds(t * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 4],
        )

    def start_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).start()
        copy4(v_hbm, v_tile, t, slot, 1).start()
        copy3(ks_hbm, ks_tile, t, slot, 2).start()
        copy3(vs_hbm, vs_tile, t, slot, 3).start()
        bias_copy(t, slot).start()

    def wait_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).wait()
        copy4(v_hbm, v_tile, t, slot, 1).wait()
        copy3(ks_hbm, ks_tile, t, slot, 2).wait()
        copy3(vs_hbm, vs_tile, t, slot, 3).wait()
        bias_copy(t, slot).wait()

    start_all(0, 0)

    q = q_ref[:].astype(jnp.float32)  # [bB, D]
    q_lo = q[:, :D2]  # lanes 0..D/2 (128-aligned static slices)
    q_hi = q[:, D2:]
    # Split head-segment matrices for each packed half: lane j of the low
    # half belongs to head j // hd; lane j of the high half to
    # (j + D2) // hd.
    lane = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 1)
    seg_lo = (lane // hd == head).astype(jnp.float32)  # [D2, H]
    seg_hi = ((lane + D2) // hd == head).astype(jnp.float32)

    def unpack(p):
        p32 = p.astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28
        ).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
        return lo, hi

    def body(t, carry):
        m, l, acc_lo, acc_hi = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            start_all(t + 1, nxt)

        wait_all(t, slot)
        k_lo, k_hi = unpack(k_tile[slot])  # each [bB, TS, D2]
        v_lo, v_hi = unpack(v_tile[slot])

        s = jax.lax.dot_general(
            q_lo[:, None, :] * k_lo, seg_lo, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_hi[:, None, :] * k_hi, seg_hi, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, H]
        s = s * ks_tile[slot][:, :, None]  # fold k dequant scale
        s = s + bias_tile[slot][:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TS
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vs_tile[slot][:, :, None]  # fold v dequant scale per row
        pe_lo = jax.lax.dot_general(
            pv, seg_lo.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, TS, D2]
        pe_hi = jax.lax.dot_general(
            pv, seg_hi.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr_lo = jax.lax.dot_general(
            corr[:, 0, :], seg_lo.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bB, D2]
        corr_hi = jax.lax.dot_general(
            corr[:, 0, :], seg_hi.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_lo_new = acc_lo * corr_lo + jnp.sum(pe_lo * v_lo, axis=1)
        acc_hi_new = acc_hi * corr_hi + jnp.sum(pe_hi * v_hi, axis=1)
        return m_new, l_new, acc_lo_new, acc_hi_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D2), jnp.float32)
    m, l, acc_lo, acc_hi = jax.lax.fori_loop(
        0, num_tiles, body, (m0, l0, a0, a0)
    )
    l_lo = jax.lax.dot_general(
        l[:, 0, :], seg_lo.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bB, D2]
    l_hi = jax.lax.dot_general(
        l[:, 0, :], seg_hi.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ctx_ref[:, :D2] = (acc_lo / l_lo).astype(ctx_ref.dtype)
    ctx_ref[:, D2:] = (acc_hi / l_hi).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "block_b", "tile_t", "interpret")
)
def decode_attention_int4(
    q: jnp.ndarray,  # [B, D]
    k_cache: jnp.ndarray,  # [L, B, T, D/2] int8 (packed nibbles)
    v_cache: jnp.ndarray,  # [L, B, T, D/2] int8
    k_scale: jnp.ndarray,  # [L, B, T] f32
    v_scale: jnp.ndarray,  # [L, B, T] f32
    key_mask: jnp.ndarray,  # [B, T] int32
    position: jnp.ndarray,
    layer: jnp.ndarray,
    n_head: int = 12,
    block_b: int = 16,
    tile_t: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """int4-packed-cache decode attention (see :func:`decode_attention`):
    one quarter of the bf16 cache HBM traffic; per-row abs-max dequant
    folded into scores/probabilities exactly like the int8 kernel."""
    L, B, T, D2 = k_cache.shape
    D = D2 * 2
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    scale = 1.0 / math.sqrt(hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t, D2), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t, D2), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    kernel = functools.partial(
        _kernel_int4, bB=block_b, TS=tile_t, n_head=n_head
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    scalars = jnp.stack([position.astype(jnp.int32), layer.astype(jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype), k_cache, v_cache,
      k_scale, v_scale, pad_bias)

def _kernel_int8_append(
    scalar_ref,  # [4] int32 (position, layer, pos//8, pos//128)
    q_ref,  # [bB, D] VMEM (merged heads, pre-scaled)
    knew_ref,  # [bB, D] VMEM — this step's raw k row (model dtype)
    vnew_ref,  # [bB, D] VMEM
    bias_hbm,  # [B, T] f32
    _k_in, _v_in, _ks_in, _vs_in,  # aliased cache inputs (same memory as outs)
    ctx_ref,  # [bB, D] VMEM out
    k_hbm,  # [L, B, T, D] int8 — aliased in/out cache
    v_hbm,
    ks_hbm,  # [L, B, T] f32 — aliased in/out
    vs_hbm,
    k_tile,  # [2, bB, TS, D] int8 scratch
    v_tile,
    ks_tile,  # [2, bB, TS] f32 scratch
    vs_tile,
    bias_tile,
    kblk,  # [bB, 8, D] int8 scratch — RMW row block
    vblk,
    ksblk,  # [bB, 128] f32 scratch — RMW scale lane-block
    vsblk,
    sems,  # tile DMA semaphores [2, 5]
    row_sems,  # RMW semaphores [4]
    *,
    bB: int,
    TS: int,
    n_head: int,
    SUB: int,
    SCORE_DT=jnp.float32,
):
    """Fused append+attend (int8): quantizes this step's k/v row, inserts
    it into the in-place (input_output_aliased) cache via an aligned
    read-modify-write (Mosaic rejects 1-row DMA slices: sublane tiling 8,
    lane tiling 128 — so k/v RMW an 8-row block and the scales RMW a
    128-lane block), then runs the int8 flash loop. Folds what XLA
    otherwise runs as per-layer quantize reduce-fusions (~0.36 ms/step at
    b512) and cache dynamic_update_slices (~1.17 ms/step, ~25x the bytes
    actually written) into the kernel."""
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    # block indices arrive pre-divided and are re-multiplied by the
    # constant here so Mosaic can PROVE slice-offset divisibility by the
    # tiling (a raw aligned scalar fails the divisibility check)
    pos_al = scalar_ref[2] * 8
    s_al = scalar_ref[3] * 128  # scale lane-block offset
    b0 = pl.program_id(0) * bB
    # k/v stream in SUB-divided tiles (TSH = TS/SUB rows): the only dead
    # reads are the <TSH tail rows of the last sub-tile (measured: 64-row
    # tiles took b512 int8 78.5k -> 93.9k tok/s — less dead traffic AND
    # faster pipeline ramp). bias/scales stay at TS-lane granularity
    # (lane-dim DMA offsets must be 128-aligned) and the live TSH-lane
    # part is a static lane slice selected by tile index mod SUB.
    TSH = TS // SUB
    num_tiles = pos // TSH + 1
    D = q_ref.shape[1]
    hd = D // n_head

    def copy4(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TSH, TSH), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def copy3(ref, dst, t, slot, sem_idx):
        # lane-dim offsets need 128 alignment: fetch the full TS
        # superblock containing sub-tile t (refetched per sub-tile — a
        # few % of the k/v bytes; no conditional DMA bookkeeping)
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds((t // SUB) * TS, TS)],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds((t // SUB) * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 4],
        )

    def start_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).start()
        copy4(v_hbm, v_tile, t, slot, 1).start()
        copy3(ks_hbm, ks_tile, t, slot, 2).start()
        copy3(vs_hbm, vs_tile, t, slot, 3).start()
        bias_copy(t, slot).start()

    def wait_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).wait()
        copy4(v_hbm, v_tile, t, slot, 1).wait()
        copy3(ks_hbm, ks_tile, t, slot, 2).wait()
        copy3(vs_hbm, vs_tile, t, slot, 3).wait()
        bias_copy(t, slot).wait()

    # ---- start streaming IMMEDIATELY ------------------------------------
    # The appended row lands in the LAST tile only (pos_al = pos//8*8 ≥
    # (pos//TSH)*TSH because TSH is a multiple of 8), so every earlier
    # tile can stream while the RMW append is still in flight — the
    # per-program serial [RMW-read → insert → write-back] chain otherwise
    # sits in front of the pipeline as pure ramp latency (~4 programs ×
    # the DMA round trips per call).
    @pl.when(num_tiles > 1)
    def _():
        start_all(0, 0)

    # ---- read the RMW blocks -------------------------------------------
    k_rd = pltpu.make_async_copy(
        k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], kblk, row_sems.at[0]
    )
    v_rd = pltpu.make_async_copy(
        v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], vblk, row_sems.at[1]
    )
    ks_rd = pltpu.make_async_copy(
        ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], ksblk, row_sems.at[2]
    )
    vs_rd = pltpu.make_async_copy(
        vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], vsblk, row_sems.at[3]
    )
    k_rd.start(); v_rd.start(); ks_rd.start(); vs_rd.start()

    # ---- quantize this step's row (identical math to gpt2.quantize_rows
    # so prefill- and decode-written slots agree) ------------------------
    k_raw = knew_ref[:].astype(jnp.float32)
    v_raw = vnew_ref[:].astype(jnp.float32)
    ks_new = jnp.maximum(jnp.max(jnp.abs(k_raw), axis=1, keepdims=True), 1e-6) / 127.0
    vs_new = jnp.maximum(jnp.max(jnp.abs(v_raw), axis=1, keepdims=True), 1e-6) / 127.0
    kq_new = jnp.clip(jnp.round(k_raw / ks_new), -127, 127).astype(jnp.int8)
    vq_new = jnp.clip(jnp.round(v_raw / vs_new), -127, 127).astype(jnp.int8)

    # ---- insert via iota-select (no dynamic sublane/lane slicing) ------
    k_rd.wait(); v_rd.wait(); ks_rd.wait(); vs_rd.wait()
    sub = jax.lax.broadcasted_iota(jnp.int32, (bB, 8, D), 1)
    kblk[...] = jnp.where(sub == pos - pos_al, kq_new[:, None, :], kblk[...])
    vblk[...] = jnp.where(sub == pos - pos_al, vq_new[:, None, :], vblk[...])
    lanei = jax.lax.broadcasted_iota(jnp.int32, (bB, 128), 1)
    ksblk[...] = jnp.where(lanei == pos - s_al, ks_new, ksblk[...])
    vsblk[...] = jnp.where(lanei == pos - s_al, vs_new, vsblk[...])

    # ---- write back ----------------------------------------------------
    k_wr = pltpu.make_async_copy(
        kblk, k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], row_sems.at[0]
    )
    v_wr = pltpu.make_async_copy(
        vblk, v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], row_sems.at[1]
    )
    ks_wr = pltpu.make_async_copy(
        ksblk, ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], row_sems.at[2]
    )
    vs_wr = pltpu.make_async_copy(
        vsblk, vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], row_sems.at[3]
    )
    k_wr.start(); v_wr.start(); ks_wr.start(); vs_wr.start()

    def wait_rmw_writes():
        k_wr.wait(); v_wr.wait(); ks_wr.wait(); vs_wr.wait()

    # single-tile case (earliest steps): tile 0 IS the last tile and reads
    # the appended row — it could not be started early above
    @pl.when(num_tiles == 1)
    def _():
        wait_rmw_writes()
        start_all(0, 0)

    # SCORE_DT: element type of the N-padded score dot. Measured r03 on
    # hardware: bfloat16 REGRESSES (110.1k vs 117.6k tok/s b512 int8,
    # same session) — the TPU already runs these f32 dots with bf16
    # internals, so the explicit cast only adds VPU passes. f32 default;
    # the parameter stays for reproducibility of that measurement.
    q = q_ref[:].astype(SCORE_DT)
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    seg = (lane // hd == head).astype(jnp.float32)  # [D, H]
    seg_s = seg.astype(SCORE_DT)

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            # the LAST tile reads the appended row + scale lane — its
            # fetch orders after the RMW write-backs (fires exactly once:
            # t runs 0..num_tiles-1 and num_tiles >= 2 on this path; the
            # num_tiles == 1 case waits at kernel entry instead)
            @pl.when(t + 1 == num_tiles - 1)
            def _():
                wait_rmw_writes()

            start_all(t + 1, nxt)

        wait_all(t, slot)
        k = k_tile[slot].astype(SCORE_DT)
        v = v_tile[slot].astype(jnp.float32)
        sub = jax.lax.rem(t, SUB)

        def pick(meta):  # live TSH lanes of the TS superblock
            out = meta[:, :TSH]
            for i in range(1, SUB):
                out = jnp.where(sub == i, meta[:, i * TSH:(i + 1) * TSH], out)
            return out

        bias64 = pick(bias_tile[slot][:])
        ks64 = pick(ks_tile[slot][:])
        vs64 = pick(vs_tile[slot][:])

        prod = q[:, None, :] * k
        s = jax.lax.dot_general(
            prod, seg_s, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * ks64[:, :, None]
        s = s + bias64[:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TSH
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pe = jax.lax.dot_general(
            p, seg.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pe = pe * vs64[:, :, None]
        corr_lanes = jax.lax.dot_general(
            corr[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr_lanes + jnp.sum(pe * v, axis=1)
        return m_new, l_new, acc_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, a0))
    l_lanes = jax.lax.dot_general(
        l[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ctx_ref[:] = (acc / l_lanes).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "block_b", "tile_t", "sub_tiles", "interpret", "score_dtype"
    ),
    donate_argnums=(3, 4, 5, 6),
)
def decode_attention_int8_append(
    q: jnp.ndarray,  # [B, D] merged heads
    k_new: jnp.ndarray,  # [B, D] raw k for this position (model dtype)
    v_new: jnp.ndarray,  # [B, D]
    k_cache: jnp.ndarray,  # [L, B, T, D] int8 (updated in place)
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, B, T] f32 (updated in place)
    v_scale: jnp.ndarray,
    key_mask: jnp.ndarray,  # [B, T] int32
    position: jnp.ndarray,
    layer: jnp.ndarray,
    n_head: int = 12,
    block_b: int = 128,
    tile_t: int = 128,
    sub_tiles: int = 4,
    interpret: bool = False,
    score_dtype: str = "float32",
):
    """Fused quantize-append + int8 decode attention. Returns
    ``(ctx [B, D], k_cache, v_cache, k_scale, v_scale)`` with the caches
    updated in place (input_output_aliased) — replaces the XLA
    quantize + dynamic_update_slice + attention sequence with one kernel.
    """
    L, B, T, D = k_cache.shape
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    scale = 1.0 / math.sqrt(hd)

    row_spec = pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            row_spec,  # q
            row_spec,  # k_new
            row_spec,  # v_new
            pl.BlockSpec(memory_space=pl.ANY),  # bias
            pl.BlockSpec(memory_space=pl.ANY),  # k cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # v cache
            pl.BlockSpec(memory_space=pl.ANY),  # k scale
            pl.BlockSpec(memory_space=pl.ANY),  # v scale
        ],
        out_specs=[
            pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D), jnp.int8),  # k sub-tiles
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((block_b, 8, D), jnp.int8),
            pltpu.VMEM((block_b, 8, D), jnp.int8),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(
        _kernel_int8_append, bB=block_b, TS=tile_t, n_head=n_head,
        SUB=sub_tiles, SCORE_DT=jnp.dtype(score_dtype).type,
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    pos = position.astype(jnp.int32)
    scalars = jnp.stack([pos, layer.astype(jnp.int32), pos // 8, pos // 128])
    # operand indices include the scalar-prefetch arg: scalars=0, q=1,
    # k_new=2, v_new=3, bias=4, caches=5..8 → outputs ctx=0, caches=1..4
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype), k_new, v_new, pad_bias,
      k_cache, v_cache, k_scale, v_scale)


def _kernel_fp_append(
    scalar_ref,  # [4] int32 (position, layer, pos//ROWB, unused)
    q_ref,  # [bB, D] VMEM (merged heads, pre-scaled)
    knew_ref,  # [bB, D] VMEM — this step's k row (cache dtype)
    vnew_ref,  # [bB, D] VMEM
    bias_hbm,  # [B, T] f32
    _k_in, _v_in,  # aliased cache inputs
    ctx_ref,  # [bB, D] VMEM out
    k_hbm,  # [L, B, T, D] — aliased in/out cache (model dtype)
    v_hbm,
    k_tile,  # [2, bB, TS, D] scratch (cache dtype)
    v_tile,
    bias_tile,
    kblk,  # [bB, ROWB, D] scratch — RMW row block
    vblk,
    sems,  # [2, 3]
    row_sems,  # [2]
    *,
    bB: int,
    TS: int,
    n_head: int,
    ROWB: int,
    SUB: int,
):
    """Full-precision fused append+attend: same RMW append as the int8
    variant (no quantization), then the plain flash loop — replaces XLA's
    slow cache dynamic_update_slice (see _kernel_int8_append notes)."""
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    pos_al = scalar_ref[2] * ROWB  # provably tiling-aligned
    b0 = pl.program_id(0) * bB
    TSH = TS // SUB  # sub-tile k/v streaming (see _kernel_int8_append)
    num_tiles = pos // TSH + 1
    D = q_ref.shape[1]
    hd = D // n_head

    k_rd = pltpu.make_async_copy(
        k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :], kblk, row_sems.at[0]
    )
    v_rd = pltpu.make_async_copy(
        v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :], vblk, row_sems.at[1]
    )
    k_rd.start(); v_rd.start(); k_rd.wait(); v_rd.wait()
    sub = jax.lax.broadcasted_iota(jnp.int32, (bB, ROWB, D), 1)
    kblk[...] = jnp.where(sub == pos - pos_al, knew_ref[:][:, None, :], kblk[...])
    vblk[...] = jnp.where(sub == pos - pos_al, vnew_ref[:][:, None, :], vblk[...])
    k_wr = pltpu.make_async_copy(
        kblk, k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :], row_sems.at[0]
    )
    v_wr = pltpu.make_async_copy(
        vblk, v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :], row_sems.at[1]
    )
    k_wr.start(); v_wr.start()

    def copy(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TSH, TSH), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds((t // SUB) * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 2],
        )

    def start_all(t, slot):
        copy(k_hbm, k_tile, t, slot, 0).start()
        copy(v_hbm, v_tile, t, slot, 1).start()
        bias_copy(t, slot).start()

    def wait_all(t, slot):
        copy(k_hbm, k_tile, t, slot, 0).wait()
        copy(v_hbm, v_tile, t, slot, 1).wait()
        bias_copy(t, slot).wait()

    k_wr.wait(); v_wr.wait()
    start_all(0, 0)

    q = q_ref[:].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    seg = (lane // hd == head).astype(jnp.float32)

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            start_all(t + 1, nxt)

        wait_all(t, slot)
        k = k_tile[slot].astype(jnp.float32)
        v = v_tile[slot].astype(jnp.float32)
        sub = jax.lax.rem(t, SUB)
        meta_b = bias_tile[slot][:]
        bias_t = meta_b[:, :TSH]
        for i in range(1, SUB):
            bias_t = jnp.where(sub == i, meta_b[:, i * TSH:(i + 1) * TSH], bias_t)

        prod = q[:, None, :] * k
        s = jax.lax.dot_general(
            prod, seg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_t[:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TSH
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pe = jax.lax.dot_general(
            p, seg.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr_lanes = jax.lax.dot_general(
            corr[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr_lanes + jnp.sum(pe * v, axis=1)
        return m_new, l_new, acc_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, a0))
    l_lanes = jax.lax.dot_general(
        l[:, 0, :], seg.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ctx_ref[:] = (acc / l_lanes).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "block_b", "tile_t", "sub_tiles", "interpret"),
    donate_argnums=(3, 4),
)
def decode_attention_fp_append(
    q: jnp.ndarray,  # [B, D]
    k_new: jnp.ndarray,  # [B, D]
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # [L, B, T, D] model dtype (updated in place)
    v_cache: jnp.ndarray,
    key_mask: jnp.ndarray,
    position: jnp.ndarray,
    layer: jnp.ndarray,
    n_head: int = 12,
    block_b: int = 128,
    tile_t: int = 128,
    sub_tiles: int = 4,
    interpret: bool = False,
):
    """Fused append + full-precision decode attention; caches updated in
    place. Returns ``(ctx, k_cache, v_cache)``."""
    L, B, T, D = k_cache.shape
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    # 32 rows: a multiple of every HBM sublane tiling (s8:8, bf16:16, f32:8)
    ROWB = 32
    scale = 1.0 / math.sqrt(hd)

    row_spec = pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # bias
            pl.BlockSpec(memory_space=pl.ANY),  # k cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # v cache
        ],
        out_specs=[
            pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D), k_cache.dtype),
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D), v_cache.dtype),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((block_b, 32, D), k_cache.dtype),
            pltpu.VMEM((block_b, 32, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_fp_append, bB=block_b, TS=tile_t, n_head=n_head, ROWB=ROWB,
        SUB=sub_tiles,
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    pos = position.astype(jnp.int32)
    scalars = jnp.stack([pos, layer.astype(jnp.int32), pos // ROWB, pos])
    # operands: scalars=0, q=1, k_new=2, v_new=3, bias=4, caches=5,6
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype),
      k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype), pad_bias,
      k_cache, v_cache)


def _kernel_int4_append(
    scalar_ref,  # [4] int32 (position, layer, pos//8, pos//128)
    q_ref,  # [bB, D] VMEM (merged heads, pre-scaled)
    knew_ref,  # [bB, D] VMEM — raw k row (model dtype)
    vnew_ref,
    bias_hbm,  # [B, T] f32
    _k_in, _v_in, _ks_in, _vs_in,  # aliased cache inputs
    ctx_ref,  # [bB, D] VMEM out
    k_hbm,  # [L, B, T, D/2] int8 packed — aliased in/out
    v_hbm,
    ks_hbm,  # [L, B, T] f32 — aliased in/out
    vs_hbm,
    k_tile,  # [2, bB, TS, D/2] int8 scratch
    v_tile,
    ks_tile,  # [2, bB, TS] f32 scratch
    vs_tile,
    bias_tile,
    kblk,  # [bB, 8, D/2] int8 scratch — RMW row block
    vblk,
    ksblk,  # [bB, 128] f32 scratch — RMW scale lane-block
    vsblk,
    sems,  # [2, 5]
    row_sems,  # [4]
    *,
    bB: int,
    TS: int,
    n_head: int,
    SUB: int,
):
    """int4 fused append+attend: quantize+pack this step's row in-kernel
    (identical math to gpt2.quantize_rows_int4), RMW it into the aliased
    packed cache, then the split-segment int4 flash loop
    (see _kernel_int4 / _kernel_int8_append for the technique notes)."""
    pos = scalar_ref[0]
    layer = scalar_ref[1]
    pos_al = scalar_ref[2] * 8
    s_al = scalar_ref[3] * 128
    b0 = pl.program_id(0) * bB
    TSH = TS // SUB  # sub-tile k/v streaming (see _kernel_int8_append)
    num_tiles = pos // TSH + 1
    D = q_ref.shape[1]
    D2 = D // 2
    hd = D // n_head

    k_rd = pltpu.make_async_copy(
        k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], kblk, row_sems.at[0]
    )
    v_rd = pltpu.make_async_copy(
        v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], vblk, row_sems.at[1]
    )
    ks_rd = pltpu.make_async_copy(
        ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], ksblk, row_sems.at[2]
    )
    vs_rd = pltpu.make_async_copy(
        vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], vsblk, row_sems.at[3]
    )
    k_rd.start(); v_rd.start(); ks_rd.start(); vs_rd.start()

    def quant_pack(x_ref):
        raw = x_ref[:].astype(jnp.float32)  # [bB, D]
        sc = jnp.maximum(jnp.max(jnp.abs(raw), axis=1, keepdims=True), 1e-6) / 7.0
        qv = jnp.clip(jnp.round(raw / sc), -7, 7).astype(jnp.int32)
        lo = qv[:, :D2]
        hi = qv[:, D2:]
        packed = jnp.bitwise_or(
            jax.lax.shift_left(hi, 4), jnp.bitwise_and(lo, 15)
        ).astype(jnp.int8)
        return packed, sc

    kq_new, ks_new = quant_pack(knew_ref)
    vq_new, vs_new = quant_pack(vnew_ref)

    k_rd.wait(); v_rd.wait(); ks_rd.wait(); vs_rd.wait()
    sub = jax.lax.broadcasted_iota(jnp.int32, (bB, 8, D2), 1)
    kblk[...] = jnp.where(sub == pos - pos_al, kq_new[:, None, :], kblk[...])
    vblk[...] = jnp.where(sub == pos - pos_al, vq_new[:, None, :], vblk[...])
    lanei = jax.lax.broadcasted_iota(jnp.int32, (bB, 128), 1)
    ksblk[...] = jnp.where(lanei == pos - s_al, ks_new, ksblk[...])
    vsblk[...] = jnp.where(lanei == pos - s_al, vs_new, vsblk[...])

    k_wr = pltpu.make_async_copy(
        kblk, k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], row_sems.at[0]
    )
    v_wr = pltpu.make_async_copy(
        vblk, v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, 8), :], row_sems.at[1]
    )
    ks_wr = pltpu.make_async_copy(
        ksblk, ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], row_sems.at[2]
    )
    vs_wr = pltpu.make_async_copy(
        vsblk, vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)], row_sems.at[3]
    )
    k_wr.start(); v_wr.start(); ks_wr.start(); vs_wr.start()

    def copy4(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * TSH, TSH), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def copy3(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds((t // SUB) * TS, TS)],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def bias_copy(t, slot):
        return pltpu.make_async_copy(
            bias_hbm.at[pl.ds(b0, bB), pl.ds((t // SUB) * TS, TS)],
            bias_tile.at[slot],
            sems.at[slot, 4],
        )

    def start_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).start()
        copy4(v_hbm, v_tile, t, slot, 1).start()
        copy3(ks_hbm, ks_tile, t, slot, 2).start()
        copy3(vs_hbm, vs_tile, t, slot, 3).start()
        bias_copy(t, slot).start()

    def wait_all(t, slot):
        copy4(k_hbm, k_tile, t, slot, 0).wait()
        copy4(v_hbm, v_tile, t, slot, 1).wait()
        copy3(ks_hbm, ks_tile, t, slot, 2).wait()
        copy3(vs_hbm, vs_tile, t, slot, 3).wait()
        bias_copy(t, slot).wait()

    k_wr.wait(); v_wr.wait(); ks_wr.wait(); vs_wr.wait()
    start_all(0, 0)

    q = q_ref[:].astype(jnp.float32)
    q_lo = q[:, :D2]
    q_hi = q[:, D2:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 1)
    seg_lo = (lane // hd == head).astype(jnp.float32)
    seg_hi = ((lane + D2) // hd == head).astype(jnp.float32)

    def unpack(p):
        p32 = p.astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28
        ).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
        return lo, hi

    def body(t, carry):
        m, l, acc_lo, acc_hi = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            start_all(t + 1, nxt)

        wait_all(t, slot)
        k_lo, k_hi = unpack(k_tile[slot])
        v_lo, v_hi = unpack(v_tile[slot])
        sub = jax.lax.rem(t, SUB)

        def pick(meta):  # live TSH lanes of the TS superblock
            out = meta[:, :TSH]
            for i in range(1, SUB):
                out = jnp.where(sub == i, meta[:, i * TSH:(i + 1) * TSH], out)
            return out

        ks_t = pick(ks_tile[slot][:])
        vs_t = pick(vs_tile[slot][:])
        bias_t = pick(bias_tile[slot][:])

        s = jax.lax.dot_general(
            q_lo[:, None, :] * k_lo, seg_lo, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_hi[:, None, :] * k_hi, seg_hi, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * ks_t[:, :, None]
        s = s + bias_t[:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * TSH
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vs_t[:, :, None]
        pe_lo = jax.lax.dot_general(
            pv, seg_lo.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pe_hi = jax.lax.dot_general(
            pv, seg_hi.T, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr_lo = jax.lax.dot_general(
            corr[:, 0, :], seg_lo.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        corr_hi = jax.lax.dot_general(
            corr[:, 0, :], seg_hi.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_lo_new = acc_lo * corr_lo + jnp.sum(pe_lo * v_lo, axis=1)
        acc_hi_new = acc_hi * corr_hi + jnp.sum(pe_hi * v_hi, axis=1)
        return m_new, l_new, acc_lo_new, acc_hi_new

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    a0 = jnp.zeros((bB, D2), jnp.float32)
    m, l, acc_lo, acc_hi = jax.lax.fori_loop(
        0, num_tiles, body, (m0, l0, a0, a0)
    )
    l_lo = jax.lax.dot_general(
        l[:, 0, :], seg_lo.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_hi = jax.lax.dot_general(
        l[:, 0, :], seg_hi.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ctx_ref[:, :D2] = (acc_lo / l_lo).astype(ctx_ref.dtype)
    ctx_ref[:, D2:] = (acc_hi / l_hi).astype(ctx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "block_b", "tile_t", "sub_tiles", "interpret"),
    donate_argnums=(3, 4, 5, 6),
)
def decode_attention_int4_append(
    q: jnp.ndarray,  # [B, D]
    k_new: jnp.ndarray,  # [B, D] raw (model dtype)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # [L, B, T, D/2] int8 packed (updated in place)
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, B, T] f32 (updated in place)
    v_scale: jnp.ndarray,
    key_mask: jnp.ndarray,
    position: jnp.ndarray,
    layer: jnp.ndarray,
    n_head: int = 12,
    block_b: int = 128,
    tile_t: int = 128,
    sub_tiles: int = 4,
    interpret: bool = False,
):
    """Fused quantize-pack-append + int4 decode attention; caches updated
    in place. Returns ``(ctx, k_cache, v_cache, k_scale, v_scale)``."""
    L, B, T, D2 = k_cache.shape
    D = D2 * 2
    hd = D // n_head
    if B % block_b != 0:
        block_b = math.gcd(B, block_b)
    if block_b % 8 != 0 and not interpret:
        # Mosaic sublane tiling is 8 rows: a non-multiple-of-8 batch block
        # makes the cache DMA slices unprovably aligned and fails deep in
        # Mosaic with a cryptic divisibility error. decoding.generate pads
        # ragged batches to 8; direct callers must do the same.
        raise ValueError(
            f"batch {B} resolves to block_b={block_b}, not a multiple of 8 "
            "(Mosaic sublane tiling) — pad the batch to a multiple of 8"
        )
    if T % tile_t != 0:
        raise ValueError(f"capacity {T} not divisible by tile {tile_t}")
    scale = 1.0 / math.sqrt(hd)

    row_spec = pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # bias
            pl.BlockSpec(memory_space=pl.ANY),  # k cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # v cache
            pl.BlockSpec(memory_space=pl.ANY),  # k scale
            pl.BlockSpec(memory_space=pl.ANY),  # v scale
        ],
        out_specs=[
            pl.BlockSpec((block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D2), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t // sub_tiles, D2), jnp.int8),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((2, block_b, tile_t), jnp.float32),
            pltpu.VMEM((block_b, 8, D2), jnp.int8),
            pltpu.VMEM((block_b, 8, D2), jnp.int8),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(
        _kernel_int4_append, bB=block_b, TS=tile_t, n_head=n_head,
        SUB=sub_tiles,
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    pos = position.astype(jnp.int32)
    scalars = jnp.stack([pos, layer.astype(jnp.int32), pos // 8, pos // 128])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, (q * scale).astype(q.dtype), k_new, v_new, pad_bias,
      k_cache, v_cache, k_scale, v_scale)
