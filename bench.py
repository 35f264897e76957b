"""Headline benchmark: batched KV-cached decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "generated tokens/sec/chip", "value": N, "unit": "tok/s",
   "vs_baseline": R, ...}

``value`` is measured on the full-size MMTG (12L/12H/768d GPT-2, vocab
13317) decoding ``--batch`` sequences of 220 tokens with the reference's
canonical sampling config (temp 1.1 / top-k 10 / top-p 0.7 / rep-pen 1.5
— reference ``generate.sh:10-14``).

``vs_baseline`` compares against a faithfully-shaped reference decode
measured on the SAME chip: batch-1, NO KV cache, one full model re-forward
over the (statically padded) prefix per token — the cost shape of
reference ``generate.py:117-124``. (The repo publishes no GPU numbers —
BASELINE.md — so the reference's own algorithm on identical hardware is
the baseline; padding its re-forward to a static 236 window only *helps*
the baseline, making the ratio conservative.)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)  # b512 is the measured sweet spot (~72k tok/s vs ~67k at b256)
    ap.add_argument("--baseline-tokens", type=int, default=60,
                    help="tokens to decode for the batch-1 uncached baseline "
                         "(its per-token cost is constant — the static-window "
                         "re-forward — so 60 tokens estimate the rate)")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--runs", type=int, default=7,
                    help="timed decode repeats; reported value is the p50 "
                         "(the tunnel occasionally doubles one run's wall "
                         "time — a mean is fiction, the median is not)")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--cache-dtype", default="int8", choices=["model", "int8", "int4"],
                    help="int8 KV cache is the serving default (1.66x)")
    ap.add_argument("--weight-dtype", default="auto",
                    choices=["auto", "model", "int8"],
                    help="decode-matmul weight precision (weight-only int8; "
                         "auto = int8 for B<=32, model above)")
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "pallas", "fused", "xla"],
                    help="decode attention: per-layer Pallas kernels, the "
                         "whole-step megakernel, or XLA")
    ap.add_argument("--topk-impl", default="exact", choices=["exact", "approx"],
                    help="top-k: exact sort custom call vs the TPU's "
                         "approx partial-reduce (recall 0.99)")
    ap.add_argument("--merged-kv", default="off", choices=["on", "off"],
                    help="k||v in one [L,B,T,2D] buffer (one DMA per kernel "
                         "sub-tile instead of two; bit-identical outputs — "
                         "measured ~2% slower at the headline shape, "
                         "docs/PERF.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.decoding import generate, resolve_attn_impl, resolve_weight_dtype
    from mmtg_tpu.models.mmtg import init_mmtg_params, mmtg_forward_infer
    from mmtg_tpu.ops.sampling import sample_next_token
    from mmtg_tpu.configs import SpecialTokens

    dev = jax.devices()[0]
    mcfg, dcfg = ModelConfig(), DataConfig()
    gcfg = GenerateConfig(cache_dtype=args.cache_dtype,
                          weight_dtype=args.weight_dtype,
                          topk_impl=args.topk_impl,
                          attn_impl=args.attn_impl,
                          merged_kv=args.merged_kv == "on")  # canonical decode config
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

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

    # ---- headline: batched KV-cached decode -------------------------------
    B = args.batch
    batch = make_batch(B)
    key = jax.random.PRNGKey(1)

    def warmup():
        # NOTE: sync via a device->host scalar transfer — on the experimental
        # axon platform block_until_ready returns at dispatch, not completion.
        float(jnp.sum(generate(params, const, mcfg, dcfg, gcfg, batch, key)))

    try:
        warmup()
    except Exception as e:  # pragma: no cover - tunnel flake path
        # The axon tunnel occasionally throws a transient runtime
        # FAILED_PRECONDITION on first dispatch; one retry rides the
        # compilation cache (CLAUDE.md platform rules). Anything else, or a
        # second failure, is real.
        if "FAILED_PRECONDITION" not in str(e):
            raise
        import sys

        print(f"WARNING: transient tunnel error, retrying once: {e!r}",
              file=sys.stderr)
        warmup()
    times = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        toks = generate(params, const, mcfg, dcfg, gcfg, batch,
                        jax.random.fold_in(key, i))
        float(jnp.sum(toks))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]  # p50 — robust to tunnel hiccups
    best = times[0]
    # Spread over the fastest runs-2: the axon tunnel reliably doubles one
    # or two runs per session (hiccups, not contention); isolated outliers
    # shouldn't trip the contention warning, sustained slowness should.
    trimmed = times[:-2] if len(times) >= 6 else times
    spread = (trimmed[-1] - trimmed[0]) / dt
    tokens_per_sec = B * gcfg.length / dt
    if spread > 0.15:
        import sys

        print(
            f"WARNING: decode run-to-run spread {spread:.1%} > 15% "
            f"(times: {[round(t, 3) for t in times]}) — rerun on an idle "
            "host; the TPU runtime proxy is contention-sensitive",
            file=sys.stderr,
        )

    # ---- baseline: reference-shaped decode (batch 1, no KV cache) --------
    vs_baseline = None
    if not args.skip_baseline:
        SP = SpecialTokens()
        b1 = make_batch(1)
        n_base = args.baseline_tokens
        T = dcfg.target_length

        def uncached_step(params, const, tokens, length, step_key):
            # full re-forward over the statically padded prefix
            b = dict(b1, targets=tokens)
            out = mmtg_forward_infer(params, const, mcfg, dcfg, b)
            idx = dcfg.topic_prompt_length + length - 1
            logits = jax.lax.dynamic_slice(
                out.logits, (0, idx, 0), (1, 1, out.logits.shape[-1])
            )[:, 0]
            seen = jnp.zeros((1, mcfg.gpt2.vocab_size), bool)
            last = jax.lax.dynamic_slice(tokens, (0, length - 1), (1, 1))[:, 0]
            return sample_next_token(
                step_key, logits, seen, last,
                temperature=gcfg.temperature, top_k=gcfg.top_k,
                top_p=gcfg.top_p, repetition_penalty=gcfg.repetition_penalty,
            )

        ustep = jax.jit(uncached_step)
        # warmup compile (sync via host transfer, see above)
        tokens0 = jnp.zeros((1, T), jnp.int32).at[:, 0].set(SP.start_id)
        float(jnp.sum(ustep(params, const, tokens0, jnp.asarray(1), key)))
        # Best-of-3 loops: each step is its own tunnel round trip, so one
        # slow loop badly skews the baseline rate (seen: 20 vs 38 tok/s
        # run-to-run) — and vs_baseline with it. Best is also the
        # conservative choice (fastest baseline → smallest ratio).
        base_dts = []
        for r in range(3):
            tokens = tokens0
            t0 = time.perf_counter()
            for i in range(n_base):
                nxt = ustep(params, const, tokens, jnp.asarray(i + 1),
                            jax.random.fold_in(key, 1000 * r + i))
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, i + 1)
                )
            float(jnp.sum(tokens))
            base_dts.append(time.perf_counter() - t0)
        base_tps = n_base / min(base_dts)
        vs_baseline = tokens_per_sec / base_tps

    result = {
        "metric": "generated tokens/sec/chip (GPT2 decode, batch %d, KV-cached %s)"
                  % (B, args.cache_dtype),
        "value": round(tokens_per_sec, 1),
        "unit": "tok/s",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "detail": {
            "batch": B,
            "length": gcfg.length,
            "dtype": args.dtype,
            "cache_dtype": args.cache_dtype,
            # the EFFECTIVE precisions/implementations (auto/scope gates
            # can silently resolve or downgrade; a saved bench line must
            # record what actually ran)
            "weight_dtype": resolve_weight_dtype(gcfg, B),
            "weight_dtype_requested": args.weight_dtype,
            "attn_impl": resolve_attn_impl(
                gcfg, mcfg.gpt2.n_embd, batch_size=B
            ),
            "attn_impl_requested": args.attn_impl,
            "decode_wall_s": round(dt, 3),
            "p50_latency_s": round(dt, 3),
            "best_latency_s": round(best, 3),
            "best_tok_s": round(B * gcfg.length / best, 1),
            "runs": args.runs,
            "spread_pct": round(100 * spread, 1),
            "baseline": "batch-1 uncached full re-forward per token "
                        "(reference generate.py:117-124 cost shape), same chip",
            "baseline_tok_s": round(base_tps, 2) if vs_baseline else None,
            "baseline_note": "the batch-1 baseline is dispatch-floor bound "
                             "through the remote-TPU tunnel and swings "
                             "session-to-session (19-286 tok/s observed) — "
                             "vs_baseline is an order-of-magnitude indicator "
                             "only; the absolute tok/s value is the headline",
            "device": str(dev),
        },
    }
    # machine-checkable roofline accounting (utils/roofline.py): modeled
    # HBM bytes of the decode loop ÷ measured wall ÷ chip peak. The
    # marginal cache-stream term alone runs AT the roofline (docs/PERF.md
    # length-sweep fit); whole-call utilization is lower because the
    # per-call fixed cost and compute-bound glue are real (and measured).
    from mmtg_tpu.utils.roofline import decode_hbm_util

    result["detail"]["roofline"] = decode_hbm_util(
        mcfg, dcfg, B, gcfg.length, dt, dev.device_kind,
        cache_dtype=args.cache_dtype,
        weight_dtype=resolve_weight_dtype(gcfg, B),
        model_dtype=args.dtype,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
