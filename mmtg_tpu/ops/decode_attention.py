"""Pallas TPU kernels: single-token decode attention with dynamic-length
cache reads (fp/int8/int4 caches × plain/fused-append).

The XLA decode path must attend over the cache's full static capacity
every step — at step t only t+1 slots are live, so a large share of the
HBM traffic (the decode bottleneck) streams dead slots. These kernels
take the current ``position`` and layer index as scalar-prefetch
arguments and DMA only the live cache tiles, flash-accumulating across
tiles with double-buffered loads. The ``*_append`` variants additionally
quantize this step's k/v row on-core and insert it into the in-place
(input_output_aliased) cache via an aligned read-modify-write — folding
the XLA-side per-layer quantize reduce-fusions and cache
dynamic_update_slices (~25× the bytes actually written) into the kernel.

All six variants are ONE parameterized builder —
:mod:`mmtg_tpu.ops.decode_attention_unified` — with the cache kind and
append stage as build flags (the r02 file carried six ~70%-identical
copies; VERDICT r02 #8). The public wrappers below keep the r02
signatures, defaults and donation/aliasing behavior exactly; layout and
lowering rules (each learned from a Mosaic rejection or a bandwidth
measurement) are documented in the builder module and docs/PERF.md.

Numerics: scores/softmax accumulate in float32; output in the query dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mmtg_tpu.ops.decode_attention_unified import NEG_INF, build_call

__all__ = [
    "NEG_INF",
    "decode_attention",
    "decode_attention_int8",
    "decode_attention_int4",
    "decode_attention_fp_append",
    "decode_attention_int8_append",
    "decode_attention_int8_append_merged",
    "decode_attention_int4_append",
]


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
    return build_call(
        "fp", False, q, k_cache, v_cache, key_mask, position, layer,
        n_head=n_head, block_b=block_b, tile_t=tile_t, interpret=interpret,
    )


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
    dominant HBM traffic; per-row abs-max dequant scales fold in *after*
    the per-head reduction (``s·ks``) and into the expanded probabilities
    (``pe·vs``) — two broadcasts, not a tile cast."""
    return build_call(
        "int8", False, q, k_cache, v_cache, key_mask, position, layer,
        k_scale=k_scale, v_scale=v_scale,
        n_head=n_head, block_b=block_b, tile_t=tile_t, interpret=interpret,
    )


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
    """int4-packed-cache decode attention: packed byte j of a cache row
    holds original lane j (low nibble) and lane j + D/2 (high nibble);
    the per-head score reduction runs as two half-lane MXU dots against
    split segment matrices — no lane interleave or concat relayouts.
    One quarter of the bf16 cache HBM traffic."""
    return build_call(
        "int4", False, q, k_cache, v_cache, key_mask, position, layer,
        k_scale=k_scale, v_scale=v_scale,
        n_head=n_head, block_b=block_b, tile_t=tile_t, interpret=interpret,
    )


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
    return build_call(
        "fp", True, q, k_cache, v_cache, key_mask, position, layer,
        k_new=k_new, v_new=v_new,
        n_head=n_head, block_b=block_b, tile_t=tile_t, sub_tiles=sub_tiles,
        interpret=interpret,
    )


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

    ``score_dtype``: element type of the N-padded score dot. Measured r03
    on hardware: bfloat16 REGRESSES (110.1k vs 117.6k tok/s b512 int8,
    same session) — the TPU already runs these f32 dots with bf16
    internals, so the explicit cast only adds VPU passes. f32 default;
    the parameter stays for reproducibility of that measurement.
    """
    return build_call(
        "int8", True, q, k_cache, v_cache, key_mask, position, layer,
        k_scale=k_scale, v_scale=v_scale, k_new=k_new, v_new=v_new,
        n_head=n_head, block_b=block_b, tile_t=tile_t, sub_tiles=sub_tiles,
        interpret=interpret, score_dtype=score_dtype,
    )


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
    return build_call(
        "int4", True, q, k_cache, v_cache, key_mask, position, layer,
        k_scale=k_scale, v_scale=v_scale, k_new=k_new, v_new=v_new,
        n_head=n_head, block_b=block_b, tile_t=tile_t, sub_tiles=sub_tiles,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "block_b", "tile_t", "sub_tiles", "interpret"),
    donate_argnums=(3, 4, 5),
)
def decode_attention_int8_append_merged(
    q: jnp.ndarray,  # [B, D] merged heads
    k_new: jnp.ndarray,  # [B, D] raw k for this position (model dtype)
    v_new: jnp.ndarray,  # [B, D]
    kv_cache: jnp.ndarray,  # [L, B, T, 2D] int8: k||v on lanes (in place)
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
):
    """Merged-KV fused quantize-append + int8 decode attention: k and v
    share one ``[L, B, T, 2D]`` buffer (k in the low lane half), so every
    32-row sub-tile costs ONE DMA issue+wait instead of two — the same
    per-tile-fixed-cost lever as the r03 scales/bias hoist. Returns
    ``(ctx [B, D], kv_cache, k_scale, v_scale)``; ``decoding.generate``
    builds the merged buffer once per call after prefill
    (one concat, amortized over the 220-step scan)."""
    return build_call(
        "int8", True, q, kv_cache, None, key_mask, position, layer,
        k_scale=k_scale, v_scale=v_scale, k_new=k_new, v_new=v_new,
        n_head=n_head, block_b=block_b, tile_t=tile_t, sub_tiles=sub_tiles,
        interpret=interpret, merged=True,
    )
