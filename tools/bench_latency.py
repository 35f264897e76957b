#!/usr/bin/env python
"""Latency-regime decode bench: small-batch p50 vs the weight-read floor.

The throughput headline (bench.py, b512) amortizes weight reads over 512
rows; at serving batch sizes (1-32) every decode step re-reads the whole
weight set for a handful of rows, so the step cost IS the weight read and
the right lever is weight bytes (``weight_dtype="int8"`` — now the 'auto'
default for B ≤ 32, ``decoding.resolve_weight_dtype``). Reference cost
shape being replaced: one full re-forward per token, batch 1
(``/root/reference/src/generate.py:117-124``).

Measures p50 whole-call latency (one full batch of 220-token lyrics) for
each (batch, weight_dtype) pair and compares against the modeled memory
floor (``utils/roofline.decode_bytes_model`` ÷ measured HBM peak + the
measured ~40 ms per-call fixed cost, docs/PERF.md length-sweep fit).
Prints ONE JSON line; run on the real chip, idle host (CLAUDE.md rule 3).

Usage: python tools/bench_latency.py [--batches 1,8,32] [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--weight-dtypes", default="model,int8")
    ap.add_argument("--cache-dtype", default="auto",
                    choices=["auto", "model", "int8", "int4"],
                    help="'auto' = what a flagless generate resolves to "
                         "(full precision at b1 — the int8 quantize/dequant "
                         "chain is pure op-count overhead there — int8 from "
                         "b2 up)")
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "pallas", "fused", "xla"],
                    help="decode attention implementation to A/B in the "
                         "latency regime (per-layer Pallas kernels carry "
                         "~fixed DMA-issue cost per call that dominates at "
                         "tiny batches)")
    ap.add_argument("--layer-unroll", default="auto",
                    help="decode layer-loop unroll ('auto' or an int) — "
                         "at tiny batches the step is loop-bookkeeping "
                         "bound and full unroll removes it")
    ap.add_argument("--topk-impl", default="exact", choices=["exact", "approx"],
                    help="top-k sampling implementation (the exact TopK "
                         "custom call has a per-step fixed cost that can "
                         "dominate at b1)")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--length", type=int, default=220)
    ap.add_argument("--fixed-cost-ms", type=float, default=39.6,
                    help="measured per-call fixed cost (tunnel dispatch + "
                         "encoder + prefill + cache init; docs/PERF.md "
                         "length-sweep fit) added to the memory floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.decoding import generate
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.utils.roofline import decode_bytes_model, peak_hbm_gbps

    dev = jax.devices()[0]
    peak = peak_hbm_gbps(dev.device_kind)
    mcfg, dcfg = ModelConfig(), DataConfig()
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
            dtype,
        )
    }

    def make_batch(B):
        P, E = dcfg.topic_prompt_length, dcfg.wenlan_emb_size
        return {
            "topic_ids": jnp.asarray(rng.integers(103, 8000, (B, P)), jnp.int32),
            "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
            "tpw_type_ids": jnp.ones((B, P), jnp.int32),
            "topic_emb": jnp.asarray(rng.standard_normal((B, E)), dtype),
            "img_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
            "r_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
        }

    key = jax.random.PRNGKey(1)
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        batch = make_batch(B)
        for wd in args.weight_dtypes.split(","):
            gcfg = GenerateConfig(cache_dtype=args.cache_dtype,
                                  weight_dtype=wd, length=args.length,
                                  attn_impl=args.attn_impl,
                                  layer_unroll=args.layer_unroll,
                                  topk_impl=args.topk_impl)

            def run(k):
                toks = generate(params, const, mcfg, dcfg, gcfg, batch, k)
                float(jnp.sum(toks))  # device->host sync (CLAUDE.md rule 1)

            try:
                run(key)  # compile + warmup
            except Exception as e:
                if "FAILED_PRECONDITION" not in str(e):
                    raise
                print(f"WARNING: transient tunnel error, retrying: {e!r}",
                      file=sys.stderr)
                run(key)
            times = []
            for i in range(args.runs):
                t0 = time.perf_counter()
                run(jax.random.fold_in(key, i))
                times.append(time.perf_counter() - t0)
            times.sort()
            p50 = times[len(times) // 2]

            from mmtg_tpu.decoding import (resolve_attn_impl,
                                           resolve_cache_dtype,
                                           resolve_layer_unroll,
                                           resolve_weight_dtype)

            # 'auto' is a policy, not a byte width — resolve it the way
            # generate does before modeling the memory floor.
            wd_eff = resolve_weight_dtype(gcfg, B)
            cd_eff = resolve_cache_dtype(gcfg, B)
            m = decode_bytes_model(mcfg, dcfg, B, args.length,
                                   cache_dtype=cd_eff,
                                   weight_dtype=wd_eff,
                                   model_dtype="bfloat16")
            floor_ms = m["total_bytes"] / (peak * 1e9) * 1e3 \
                + args.fixed_cost_ms

            rows.append({
                "batch": B,
                "cache_dtype": cd_eff,
                "weight_dtype": wd_eff if wd == "auto" else wd,
                "attn_impl": resolve_attn_impl(gcfg, mcfg.gpt2.n_embd,
                                               batch_size=B),
                "layer_unroll": resolve_layer_unroll(
                    gcfg, mcfg.gpt2.n_layer, batch_size=B,
                    attn_impl=resolve_attn_impl(gcfg, mcfg.gpt2.n_embd,
                                                batch_size=B)),
                "p50_ms": round(p50 * 1e3, 1),
                "best_ms": round(times[0] * 1e3, 1),
                "ms_per_token_per_row": round(p50 * 1e3 / args.length, 3),
                "tok_s": round(B * args.length / p50, 1),
                "memory_floor_ms": round(floor_ms, 1),
                "x_of_floor": round(p50 * 1e3 / floor_ms, 2),
            })
            print(f"  b{B} {wd}: p50 {p50 * 1e3:.1f} ms "
                  f"(floor {floor_ms:.1f} ms)", file=sys.stderr)

    b1_int8 = next((r for r in rows
                    if r["batch"] == 1 and r["weight_dtype"] == "int8"),
                   rows[0])
    out = {
        "metric": "p50 single-lyric decode latency (batch 1, int8 weights, "
                  "220 tokens)",
        "value": b1_int8["p50_ms"],
        "unit": "ms",
        "vs_baseline": None,
        "detail": {
            "rows": rows,
            "cache_dtype": args.cache_dtype,
            "length": args.length,
            "fixed_cost_ms": args.fixed_cost_ms,
            "hbm_peak_gbps": peak,
            "floor_model": "roofline.decode_bytes_model / peak + measured "
                           "per-call fixed cost",
            "device": str(dev),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
