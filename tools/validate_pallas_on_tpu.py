"""Hardware validation: fused decode kernels vs an XLA oracle, same inputs.

Compares each production append+attend kernel's context output against a
straight XLA masked-softmax oracle ON THE REAL TPU (the unit tests run
the kernels in interpret mode on CPU; this checks the Mosaic lowering).
Also asserts the in-place cache append wrote exactly the quantized row /
scale and touched nothing else.

Measured (2026-08, v5e): max |ctx - oracle| ≈ 7.5e-3 — both sides run
their f32 MXU passes at the TPU's default bf16-internal precision, so
this is float-association noise, not a defect. NOTE: token-level
trajectory agreement is NOT a useful hardware check with random-init
weights — logits are near-uniform, so top-10 sampling flips on epsilon
differences and whole rows diverge chaotically (~13% agreement observed,
= frame-forced positions plus chance).

Usage: python tools/validate_pallas_on_tpu.py [--batch 256]
"""
import argparse
import json

import numpy as np

from mmtg_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mmtg_tpu.models.gpt2 import quantize_rows, quantize_rows_int4, unpack_int4
from mmtg_tpu.ops.decode_attention import (
    decode_attention_fp_append,
    decode_attention_int4_append,
    decode_attention_int8_append,
)

L, T, NH, HD = 2, 256, 12, 64
D = NH * HD


def oracle(q, k_deq, v_deq, pos):
    B = q.shape[0]
    qh = q.reshape(B, NH, HD).astype(jnp.float32)
    kh = k_deq.reshape(B, T, NH, HD).astype(jnp.float32)
    vh = v_deq.reshape(B, T, NH, HD).astype(jnp.float32)
    s = jnp.einsum("bhd,bthd->bht", qh, kh) / np.sqrt(HD)
    s = jnp.where(jnp.arange(T)[None, None, :] <= pos, s, -1e30)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bht,bthd->bhd", p, vh).reshape(B, D)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tol", type=float, default=3e-2)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)
    pos, layer = 130, 1
    results = {}

    # ---- int8 (position sweep: the DMA issue order differs across
    # num_tiles regimes — single-tile, last-tile-wait, steady-state —
    # and ordering races only show on real hardware) ---------------------
    knq, kns = quantize_rows(k_new)
    vnq, vns = quantize_rows(v_new)
    int8_sweep = {}
    for p in (5, 17, 31, 32, 100, 130, 255):
        kq, ks = quantize_rows(k)
        vq, vs = quantize_rows(v)
        kd = (kq.at[layer, :, p].set(knq))[layer].astype(jnp.float32) * (
            ks.at[layer, :, p].set(kns)
        )[layer][..., None]
        vd = (vq.at[layer, :, p].set(vnq))[layer].astype(jnp.float32) * (
            vs.at[layer, :, p].set(vns)
        )[layer][..., None]
        ref = oracle(q, kd, vd, p)
        out, kq2, _, ks2, _ = decode_attention_int8_append(
            q, k_new, v_new, kq, vq, ks, vs, mask,
            jnp.asarray(p), jnp.asarray(layer), n_head=NH,
        )
        int8_sweep[p] = {
            "max_abs_ctx": float(jnp.max(jnp.abs(out - ref))),
            "row_exact": bool(jnp.all(kq2[layer, :, p] == knq)),
            "scale_exact": bool(jnp.all(ks2[layer, :, p] == kns)),
        }
    results["int8"] = {
        "max_abs_ctx": max(r["max_abs_ctx"] for r in int8_sweep.values()),
        "row_exact": all(r["row_exact"] for r in int8_sweep.values()),
        "scale_exact": all(r["scale_exact"] for r in int8_sweep.values()),
        "positions": int8_sweep,
    }

    # ---- int4 ----------------------------------------------------------
    kq, ks = quantize_rows_int4(k)
    vq, vs = quantize_rows_int4(v)
    knq, kns = quantize_rows_int4(k_new)
    vnq, vns = quantize_rows_int4(v_new)
    kd = unpack_int4(kq.at[layer, :, pos].set(knq)[layer]) * (
        ks.at[layer, :, pos].set(kns)
    )[layer][..., None]
    vd = unpack_int4(vq.at[layer, :, pos].set(vnq)[layer]) * (
        vs.at[layer, :, pos].set(vns)
    )[layer][..., None]
    ref = oracle(q, kd, vd, pos)
    out, kq2, _, ks2, _ = decode_attention_int4_append(
        q, k_new, v_new, kq, vq, ks, vs, mask,
        jnp.asarray(pos), jnp.asarray(layer), n_head=NH,
    )
    results["int4"] = {
        "max_abs_ctx": float(jnp.max(jnp.abs(out - ref))),
        "row_exact": bool(jnp.all(kq2[layer, :, pos] == knq)),
        "scale_exact": bool(jnp.all(ks2[layer, :, pos] == kns)),
    }

    # ---- fp ------------------------------------------------------------
    k_ref = k.at[layer, :, pos].set(k_new)
    v_ref = v.at[layer, :, pos].set(v_new)
    ref = oracle(q, k_ref[layer], v_ref[layer], pos)
    out, k2, _ = decode_attention_fp_append(
        q, k_new, v_new, k, v, mask, jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH,
    )
    results["fp"] = {
        "max_abs_ctx": float(jnp.max(jnp.abs(out - ref))),
        "row_exact": bool(jnp.all(k2[layer, :, pos] == k_new)),
    }

    ok = all(
        r["max_abs_ctx"] < args.tol and r.get("row_exact", True)
        and r.get("scale_exact", True)
        for r in results.values()
    )
    print(json.dumps({"ok": ok, "tol": args.tol, "results": results}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
