"""Unified Pallas TPU decode-attention kernel builder.

ONE parameterized kernel replaces the six ~70%-identical variants that
grew during rounds 1-2 (fp/int8/int4 × plain/append): the cache kind and
the fused-append stage are now build parameters, so the next cache format
is a config entry, not a seventh copy (VERDICT r02 weak #5 / next #8).

Semantics, layouts and op ORDER are preserved variant-by-variant from the
measured originals — every numbered rule below came from a Mosaic
rejection or a bandwidth measurement (see docs/PERF.md):

  * cache layout ``[L, B, T, D]``, heads merged into lanes — a time-tile
    slice is a 24KB-contiguous DMA run per row; ``[.., hd, T]`` degrades
    to 256-byte runs, ``[.., T, 64]`` gets lane-padded and rejected;
  * per-head score/weighted-sum separation via segment matrices on the
    MXU (two-batch-dim dot_generals don't lower);
  * int8: per-row abs-max scales fold into scores (``s·ks``) and
    expanded probabilities (``pe·vs``) — dequant costs two broadcasts,
    not a tile cast;
  * int4: two nibbles per byte, split-segment half-lane dots (no lane
    interleave/concat relayouts); scales fold as ``s·ks`` and ``p·vs``;
  * append: quantize (if any) on-core, then an aligned read-modify-write
    into the input_output_aliased cache (1-row DMA writes are
    impossible: sublane tiling 8/16/32 — RMW an aligned row block via
    iota-select; block indices arrive PRE-DIVIDED so Mosaic can prove
    slice-offset divisibility);
  * append streams k/v in TS/SUB-row sub-tiles (fewer dead tail reads +
    faster pipeline ramp; 32 rows measured optimal) while scales/bias
    stay at 128-lane superblocks with the live slice picked by tile
    parity (dynamic lane-dim offsets must be 128-aligned);
  * DMA order (r03): tile streaming starts at KERNEL ENTRY; the RMW
    append runs concurrently and only the LAST tile (the only one that
    reads the appended row — ``pos_al ≥ last_tile_start`` because the
    row block is sublane-aligned) waits for the write-backs.

Numerics: scores/softmax accumulate in f32; output in the query dtype.
``score_dtype`` optionally runs the N-padded score dot in bf16 — measured
SLOWER on hardware (110.1k vs 117.6k tok/s; the TPU already runs f32
dots with bf16 internals), kept for reproducibility.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# RMW row-block height per cache kind: must be a multiple of the HBM
# sublane tiling of the stored dtype (int8 caches: 8 preserved from the
# measured r02 kernels; fp caches hold f32 OR bf16 → 32 covers every
# tiling: s8:8, bf16:16, f32:8).
_ROWB = {"fp": 32, "int8": 8, "int4": 8}


def _unified_kernel(*refs, bB, TS, n_head, SUB, CACHE, APPEND, SCORE_DT,
                    MERGED=False):
    quant = CACHE in ("int8", "int4")
    # MERGED: k and v live in ONE [L, B, T, 2*Ds] buffer (k in the low
    # lane half) so each sub-tile costs ONE DMA issue+wait instead of
    # two — the same per-tile-fixed-cost attack as the meta hoist.
    # int8+append only (the serving headline path).
    # ---- positional ref unpacking (mirrors the build below) -------------
    it = iter(refs)
    scalar_ref = next(it)
    q_ref = next(it)
    if APPEND:
        knew_ref = next(it)
        vnew_ref = next(it)
    bias_hbm = next(it)
    n_cache = (1 if MERGED else 2) + (2 if quant else 0)
    if APPEND:
        # aliased cache inputs (same memory as the outputs) — unused
        for _ in range(n_cache):
            next(it)
        ctx_ref = next(it)
        if MERGED:
            kv_hbm = next(it)
        else:
            k_hbm = next(it)
            v_hbm = next(it)
        if quant:
            ks_hbm = next(it)
            vs_hbm = next(it)
    else:
        assert not MERGED
        k_hbm = next(it)
        v_hbm = next(it)
        if quant:
            ks_hbm = next(it)
            vs_hbm = next(it)
        ctx_ref = next(it)
    if MERGED:
        kv_tile = next(it)
    else:
        k_tile = next(it)
        v_tile = next(it)
    if quant:
        ks_tile = next(it)
        vs_tile = next(it)
    bias_tile = next(it)
    if APPEND:
        if MERGED:
            kvblk = next(it)
        else:
            kblk = next(it)
            vblk = next(it)
        if quant:
            ksblk = next(it)
            vsblk = next(it)
    sems = next(it)
    meta_sems = next(it)
    if APPEND:
        row_sems = next(it)

    pos = scalar_ref[0]
    layer = scalar_ref[1]
    b0 = pl.program_id(0) * bB
    # tile granularity: append kernels stream TS/SUB-row sub-tiles; plain
    # kernels read full TS tiles (and fetch scales/bias per tile directly)
    G = TS // SUB if APPEND else TS
    num_tiles = pos // G + 1
    D = q_ref.shape[1]
    D2 = D // 2
    hd = D // n_head
    ROWB = _ROWB[CACHE]
    Dm = 2 * D if MERGED else D  # merged stores k||v on lanes

    # ---- per-tile DMA helpers ------------------------------------------
    # k/v stream in double-buffered G-row tiles; scales/bias are HOISTED:
    # one full-row [bB, T] fetch per PROGRAM (the rows are ~128KB f32 —
    # trivial VMEM) instead of one superblock DMA per sub-tile. Per-tile
    # fixed DMA cost dominates at 32-row sub-tiles (the 16-row collapse
    # in the r02 sweep), so cutting 3 of the 5 per-tile DMA issue+wait
    # pairs attacks exactly that. The append path PATCHES the new scale
    # lane into the hoisted VMEM copy, so fetch/write-back ordering with
    # the RMW append doesn't matter for scales (k/v keep the
    # wait-before-last-tile ordering).
    def copy_kv(ref, dst, t, slot, sem_idx):
        return pltpu.make_async_copy(
            ref.at[layer, pl.ds(b0, bB), pl.ds(t * G, G), :],
            dst.at[slot],
            sems.at[slot, sem_idx],
        )

    def meta_copy(ref, dst, sem_idx, three_d=True):
        src = (
            ref.at[layer, pl.ds(b0, bB), :]
            if three_d
            else ref.at[pl.ds(b0, bB), :]
        )
        return pltpu.make_async_copy(src, dst, meta_sems.at[sem_idx])

    def start_meta():
        if quant:
            meta_copy(ks_hbm, ks_tile, 0).start()
            meta_copy(vs_hbm, vs_tile, 1).start()
        meta_copy(bias_hbm, bias_tile, 2, three_d=False).start()

    def wait_meta():
        if quant:
            meta_copy(ks_hbm, ks_tile, 0).wait()
            meta_copy(vs_hbm, vs_tile, 1).wait()
        meta_copy(bias_hbm, bias_tile, 2, three_d=False).wait()

    def start_all(t, slot):
        if MERGED:
            copy_kv(kv_hbm, kv_tile, t, slot, 0).start()
        else:
            copy_kv(k_hbm, k_tile, t, slot, 0).start()
            copy_kv(v_hbm, v_tile, t, slot, 1).start()

    def wait_all(t, slot):
        if MERGED:
            copy_kv(kv_hbm, kv_tile, t, slot, 0).wait()
        else:
            copy_kv(k_hbm, k_tile, t, slot, 0).wait()
            copy_kv(v_hbm, v_tile, t, slot, 1).wait()

    T_cap = bias_tile.shape[-1]  # full cache capacity (hoisted meta rows)

    # ---- fused append (quantize + aligned RMW into the aliased cache) --
    start_meta()
    if APPEND:
        # start streaming IMMEDIATELY: the appended row lands only in the
        # LAST tile (pos_al = pos//ROWB*ROWB ≥ (pos//G)*G since G is a
        # multiple of ROWB for int8/int4 and of 32 for fp), so earlier
        # tiles stream while the RMW append is in flight
        @pl.when(num_tiles > 1)
        def _():
            start_all(0, 0)

        pos_al = scalar_ref[2] * ROWB
        s_al = scalar_ref[3] * 128  # scale lane-block offset (quant only)
        Ds = D2 if CACHE == "int4" else D

        if MERGED:
            kv_rd = pltpu.make_async_copy(
                kv_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                kvblk, row_sems.at[0],
            )
            kv_rd.start()
        else:
            k_rd = pltpu.make_async_copy(
                k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                kblk, row_sems.at[0],
            )
            v_rd = pltpu.make_async_copy(
                v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                vblk, row_sems.at[1],
            )
            k_rd.start(); v_rd.start()
        if quant:
            ks_rd = pltpu.make_async_copy(
                ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)],
                ksblk, row_sems.at[2],
            )
            vs_rd = pltpu.make_async_copy(
                vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)],
                vsblk, row_sems.at[3],
            )
            ks_rd.start(); vs_rd.start()

        if CACHE == "int8":
            # identical math to gpt2.quantize_rows so prefill- and
            # decode-written slots agree
            k_raw = knew_ref[:].astype(jnp.float32)
            v_raw = vnew_ref[:].astype(jnp.float32)
            ks_new = jnp.maximum(
                jnp.max(jnp.abs(k_raw), axis=1, keepdims=True), 1e-6
            ) / 127.0
            vs_new = jnp.maximum(
                jnp.max(jnp.abs(v_raw), axis=1, keepdims=True), 1e-6
            ) / 127.0
            kq_new = jnp.clip(jnp.round(k_raw / ks_new), -127, 127).astype(jnp.int8)
            vq_new = jnp.clip(jnp.round(v_raw / vs_new), -127, 127).astype(jnp.int8)
        elif CACHE == "int4":
            # identical math to gpt2.quantize_rows_int4
            def quant_pack(x_ref):
                raw = x_ref[:].astype(jnp.float32)
                sc = jnp.maximum(
                    jnp.max(jnp.abs(raw), axis=1, keepdims=True), 1e-6
                ) / 7.0
                qv = jnp.clip(jnp.round(raw / sc), -7, 7).astype(jnp.int32)
                packed = jnp.bitwise_or(
                    jax.lax.shift_left(qv[:, D2:], 4),
                    jnp.bitwise_and(qv[:, :D2], 15),
                ).astype(jnp.int8)
                return packed, sc

            kq_new, ks_new = quant_pack(knew_ref)
            vq_new, vs_new = quant_pack(vnew_ref)
        else:
            kq_new = knew_ref[:]
            vq_new = vnew_ref[:]

        if MERGED:
            kv_rd.wait()
            kv_new = jnp.concatenate([kq_new, vq_new], axis=-1)  # [bB, 2Ds]
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (bB, ROWB, 2 * Ds), 1)
            kvblk[...] = jnp.where(
                sub_i == pos - pos_al, kv_new[:, None, :], kvblk[...]
            )
        else:
            k_rd.wait(); v_rd.wait()
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (bB, ROWB, Ds), 1)
            kblk[...] = jnp.where(sub_i == pos - pos_al, kq_new[:, None, :], kblk[...])
            vblk[...] = jnp.where(sub_i == pos - pos_al, vq_new[:, None, :], vblk[...])
        if quant:
            ks_rd.wait(); vs_rd.wait()
            lanei = jax.lax.broadcasted_iota(jnp.int32, (bB, 128), 1)
            ksblk[...] = jnp.where(lanei == pos - s_al, ks_new, ksblk[...])
            vsblk[...] = jnp.where(lanei == pos - s_al, vs_new, vsblk[...])

        if MERGED:
            kv_wr = pltpu.make_async_copy(
                kvblk, kv_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                row_sems.at[0],
            )
            kv_wr.start()
        else:
            k_wr = pltpu.make_async_copy(
                kblk, k_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                row_sems.at[0],
            )
            v_wr = pltpu.make_async_copy(
                vblk, v_hbm.at[layer, pl.ds(b0, bB), pl.ds(pos_al, ROWB), :],
                row_sems.at[1],
            )
            k_wr.start(); v_wr.start()
        if quant:
            ks_wr = pltpu.make_async_copy(
                ksblk, ks_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)],
                row_sems.at[2],
            )
            vs_wr = pltpu.make_async_copy(
                vsblk, vs_hbm.at[layer, pl.ds(b0, bB), pl.ds(s_al, 128)],
                row_sems.at[3],
            )
            ks_wr.start(); vs_wr.start()

        def wait_rmw_writes():
            if MERGED:
                kv_wr.wait()
            else:
                k_wr.wait(); v_wr.wait()
            if quant:
                ks_wr.wait(); vs_wr.wait()

        # single-tile case (earliest steps): tile 0 IS the last tile
        @pl.when(num_tiles == 1)
        def _():
            wait_rmw_writes()
            start_all(0, 0)
    else:
        start_all(0, 0)

    # hoisted meta rows: one wait per program; the append path PATCHES
    # the freshly quantized scale lane into the VMEM copy, making the
    # hoisted fetch independent of the RMW write-back ordering
    wait_meta()
    if APPEND and quant:
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (bB, T_cap), 1)
        ks_tile[...] = jnp.where(lane_t == pos, ks_new, ks_tile[...])
        vs_tile[...] = jnp.where(lane_t == pos, vs_new, vs_tile[...])

    # ---- segment matrices ----------------------------------------------
    q = q_ref[:].astype(SCORE_DT if CACHE != "int4" else jnp.float32)
    if CACHE == "int4":
        q_lo, q_hi = q[:, :D2], q[:, D2:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 0)
        head = jax.lax.broadcasted_iota(jnp.int32, (D2, n_head), 1)
        seg_lo = (lane // hd == head).astype(jnp.float32)
        seg_hi = ((lane + D2) // hd == head).astype(jnp.float32)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
        head = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
        seg = (lane // hd == head).astype(jnp.float32)
        seg_s = seg.astype(SCORE_DT)

    def unpack(p):
        p32 = p.astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p32, 28), 28
        ).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
        return lo, hi

    def seg_dot(x, w):
        return jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def lane_dot(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- flash loop ------------------------------------------------------
    def body(t, carry):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < num_tiles)
        def _():
            if APPEND:
                # the LAST tile reads the appended row + scale lane — its
                # fetch orders after the RMW write-backs (fires exactly
                # once: num_tiles >= 2 on this path; num_tiles == 1
                # waited at kernel entry instead)
                @pl.when(t + 1 == num_tiles - 1)
                def _():
                    wait_rmw_writes()

            start_all(t + 1, nxt)

        wait_all(t, slot)

        def pick(meta):  # live G lanes of tile t from the hoisted [bB, T]
            # row (dynamic lane slices must be 128-aligned — static-slice
            # candidates selected by tile index instead)
            out = meta[:, :G]
            for i in range(1, T_cap // G):
                out = jnp.where(t == i, meta[:, i * G:(i + 1) * G], out)
            return out

        bias_t = pick(bias_tile[:])
        if quant:
            ks_t = pick(ks_tile[:])
            vs_t = pick(vs_tile[:])

        if CACHE == "int4":
            m, l, acc_lo, acc_hi = carry
            k_lo, k_hi = unpack(k_tile[slot])
            v_lo, v_hi = unpack(v_tile[slot])
            s = seg_dot(q_lo[:, None, :] * k_lo, seg_lo) + seg_dot(
                q_hi[:, None, :] * k_hi, seg_hi
            )
            s = s * ks_t[:, :, None]
            s = s + bias_t[:, :, None]
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * G
            s = jnp.where(row <= pos, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            pv = p * vs_t[:, :, None]  # fold v dequant scale per row
            pe_lo = seg_dot(pv, seg_lo.T)
            pe_hi = seg_dot(pv, seg_hi.T)
            corr_lo = lane_dot(corr[:, 0, :], seg_lo.T)
            corr_hi = lane_dot(corr[:, 0, :], seg_hi.T)
            return (
                m_new,
                l_new,
                acc_lo * corr_lo + jnp.sum(pe_lo * v_lo, axis=1),
                acc_hi * corr_hi + jnp.sum(pe_hi * v_hi, axis=1),
            )

        m, l, acc = carry
        if MERGED:
            kv = kv_tile[slot]
            k = kv[:, :, :D].astype(SCORE_DT)
            v = kv[:, :, D:].astype(jnp.float32)
        else:
            k = k_tile[slot].astype(SCORE_DT)
            v = v_tile[slot].astype(jnp.float32)
        prod = q[:, None, :] * k
        s = seg_dot(prod, seg_s)
        if quant:
            s = s * ks_t[:, :, None]  # fold k dequant scale
        s = s + bias_t[:, :, None]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * G
        s = jnp.where(row <= pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pe = seg_dot(p, seg.T)
        if quant:
            pe = pe * vs_t[:, :, None]  # fold v dequant scale
        corr_lanes = lane_dot(corr[:, 0, :], seg.T)
        return m_new, l_new, acc * corr_lanes + jnp.sum(pe * v, axis=1)

    H = n_head
    m0 = jnp.full((bB, 1, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bB, 1, H), jnp.float32)
    if CACHE == "int4":
        a0 = jnp.zeros((bB, D2), jnp.float32)
        m, l, acc_lo, acc_hi = jax.lax.fori_loop(
            0, num_tiles, body, (m0, l0, a0, a0)
        )
        l_lo = lane_dot(l[:, 0, :], seg_lo.T)
        l_hi = lane_dot(l[:, 0, :], seg_hi.T)
        ctx_ref[:, :D2] = (acc_lo / l_lo).astype(ctx_ref.dtype)
        ctx_ref[:, D2:] = (acc_hi / l_hi).astype(ctx_ref.dtype)
    else:
        a0 = jnp.zeros((bB, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, a0))
        l_lanes = lane_dot(l[:, 0, :], seg.T)
        ctx_ref[:] = (acc / l_lanes).astype(ctx_ref.dtype)


def build_call(
    cache: str,
    append: bool,
    q,
    k_cache,
    v_cache,
    key_mask,
    position,
    layer,
    k_scale=None,
    v_scale=None,
    k_new=None,
    v_new=None,
    n_head: int = 12,
    block_b: int = 128,
    tile_t: int = 128,
    sub_tiles: int = 4,
    interpret: bool = False,
    score_dtype: str = "float32",
    merged: bool = False,
):
    """Assemble and invoke the unified kernel for one (cache, append)
    variant. Thin public wrappers below keep the r02 signatures.

    ``merged``: ``k_cache`` holds k||v on lanes (``[L, B, T, 2*Ds]``,
    ``v_cache`` ignored/None) — one tile DMA per sub-tile instead of two.
    int8 append only."""
    quant = cache in ("int8", "int4")
    if merged:
        assert cache == "int8" and append, "merged kv: int8 append only"
        L, B, T, Dm = k_cache.shape
        Ds = Dm // 2
        D = Ds
    else:
        L, B, T, Ds = k_cache.shape
        D = Ds * 2 if cache == "int4" else Ds
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
    ROWB = _ROWB[cache]

    row_spec = pl.BlockSpec(
        (block_b, D), lambda b, s: (b, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    G = tile_t // sub_tiles if append else tile_t

    n_cache = (1 if merged else 2) + (2 if quant else 0)
    in_specs = [row_spec]
    if append:
        in_specs += [row_spec, row_spec]  # k_new, v_new
    in_specs += [any_spec]  # bias
    in_specs += [any_spec] * n_cache  # caches (+scales)

    if append:
        out_specs = [row_spec] + [any_spec] * n_cache
        out_shape = [jax.ShapeDtypeStruct((B, D), q.dtype),
                     jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype)]
        if not merged:
            out_shape += [jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)]
        if quant:
            out_shape += [jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                          jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
        # operand indices include the scalar-prefetch arg: scalars=0, q=1,
        # k_new=2, v_new=3, bias=4, caches=5.. → outputs ctx=0, caches=1..
        input_output_aliases = {5 + i: 1 + i for i in range(n_cache)}
    else:
        out_specs = row_spec
        out_shape = jax.ShapeDtypeStruct((B, D), q.dtype)
        input_output_aliases = {}

    if merged:
        scratch = [pltpu.VMEM((2, block_b, G, 2 * Ds), k_cache.dtype)]
    else:
        scratch = [
            pltpu.VMEM((2, block_b, G, Ds), k_cache.dtype),
            pltpu.VMEM((2, block_b, G, Ds), v_cache.dtype),
        ]
    # hoisted meta rows: full [bB, T] scales/bias, fetched once per program
    if quant:
        scratch += [pltpu.VMEM((block_b, T), jnp.float32)] * 2
    scratch += [pltpu.VMEM((block_b, T), jnp.float32)]  # bias
    if append:
        if merged:
            scratch += [pltpu.VMEM((block_b, ROWB, 2 * Ds), k_cache.dtype)]
        else:
            scratch += [
                pltpu.VMEM((block_b, ROWB, Ds), k_cache.dtype),
                pltpu.VMEM((block_b, ROWB, Ds), v_cache.dtype),
            ]
        if quant:
            scratch += [pltpu.VMEM((block_b, 128), jnp.float32)] * 2
    scratch += [
        pltpu.SemaphoreType.DMA((2, 2)),  # k/v tile double buffers
        pltpu.SemaphoreType.DMA((3,)),  # hoisted ks/vs/bias
    ]
    if append:
        scratch += [pltpu.SemaphoreType.DMA((4 if quant else 2,))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _unified_kernel,
        bB=block_b, TS=tile_t, n_head=n_head,
        SUB=sub_tiles if append else 1,
        CACHE=cache, APPEND=append,
        SCORE_DT=jnp.dtype(score_dtype).type,
        MERGED=merged,
    )
    pad_bias = (1.0 - key_mask.astype(jnp.float32)) * NEG_INF
    pos = position.astype(jnp.int32)
    if append:
        scalars = jnp.stack(
            [pos, layer.astype(jnp.int32), pos // ROWB, pos // 128]
        )
    else:
        scalars = jnp.stack([pos, layer.astype(jnp.int32)])

    operands = [scalars, (q * scale).astype(q.dtype)]
    if append:
        if cache == "fp":
            # fp append stores the raw row directly: cast to cache dtype
            operands += [k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype)]
        else:
            # quantized modes keep the model-dtype row (in-kernel quantize)
            operands += [k_new, v_new]
    operands += [pad_bias, k_cache]
    if not merged:
        operands += [v_cache]
    if quant:
        operands += [k_scale, v_scale]

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=input_output_aliases,
        # larger batch blocks = fewer sequential programs per call (the
        # per-program setup overhead is measurable); let the double
        # buffers use more VMEM than the conservative default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


