"""Train-step benchmark: full-size MMTG train step on one TPU chip.

Prints ONE JSON line and (with ``--round N``) writes ``BENCH_TRAIN_r{N}.json``
so train perf is a committed, regression-guarded artifact like the decode
headline (``bench.py``) — reference hot loop: ``train.py:177-219``.

Measures the canonical shape: batch 256 × 236 tokens, bf16 compute with
f32 master params, full-block remat, hardware-RNG dropout, the Pallas
train-attention kernel, chunked LM-head loss. Timing syncs via a
device→host transfer (``block_until_ready`` returns at dispatch on the
axon tunnel — CLAUDE.md platform rule 1).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench_packed(args, mcfg, dcfg, tcfg, rng) -> None:
    """samples/s for --pack_sequences at a synthetic length distribution.

    The packed step consumes a VARYING number of real samples per step
    (metrics["kept"]); throughput is Σkept / Σtime over chained steps —
    directly comparable to the parity headline's samples/s.
    """
    import jax
    import jax.numpy as jnp
    import json
    import time

    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.pack import PackedBatcher, synthetic_framed_cols
    from mmtg_tpu.train import create_train_state, make_train_step

    V = mcfg.gpt2.vocab_size
    E = dcfg.wenlan_emb_size
    n_samples = 4096
    lens = np.clip(
        rng.normal(args.pack_avg_len, 4.0, (n_samples, 10)), 2, 20
    ).astype(np.int64)
    cols = synthetic_framed_cols(rng, dcfg, lens, emb_size=E)
    L = args.pack_row_len
    rows = args.pack_rows or max(8, (65536 // L) // 8 * 8)
    pb = PackedBatcher(cols, dcfg, row_len=L, max_slots=8)
    batches = []
    kept = []
    for b in pb.batches(rows, shuffle=True,
                        rng=np.random.default_rng(1)):
        if b["slot_valid"].sum() < rows:  # tail
            break
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
        kept.append(float(b["slot_valid"].sum()))
        if len(batches) >= 4:
            break
    if not batches:
        raise SystemExit("packing produced no full batches; lower "
                         "--pack-rows")
    const = {
        "wenlan_table": jnp.asarray(rng.standard_normal((V, E)), jnp.float32)
    }
    state, tx = create_train_state(
        jax.random.PRNGKey(2), mcfg, tcfg, 10, 1000,
        params=init_mmtg_params(jax.random.PRNGKey(0), mcfg),
    )
    step_fn = make_train_step(mcfg, dcfg, tcfg, tx)
    stage = jnp.asarray(3)

    def sync(x):
        float(jnp.sum(x))

    state, m = step_fn(state, const, batches[0], stage)
    sync(m["total"])

    K = args.steps_per_block
    block = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        for i in range(K):
            state, m = step_fn(state, const, batches[i % len(batches)], stage)
        sync(m["total"])
        block.append((time.perf_counter() - t0) / K)
    block.sort()
    dt = block[len(block) // 2]
    samples_per_step = float(np.mean(kept[:K]))
    out = {
        "metric": "packed train samples/sec (--pack_sequences, "
                  f"avg sentence {args.pack_avg_len:.0f} tok, "
                  f"{rows} rows x {L})",
        "value": round(samples_per_step / dt, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "detail": {
            "step_ms_p50": round(dt * 1e3, 1),
            "rows": rows,
            "row_len": L,
            "samples_per_step_mean": round(samples_per_step, 1),
            "pack_density": round(pb.density, 3),
            "dtype": args.dtype,
            "attn_impl": args.attn_impl,
            "remat_policy": args.remat_policy,
            "runs": args.runs,
            "non_parity": "objective counts real labels only "
                          "(mmtg_tpu/pack.py contract)",
            "device": str(jax.devices()[0].device_kind),
        },
    }
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--runs", type=int, default=7,
                    help="timed steps; report the p50 (tunnel hiccups make "
                         "a mean fiction)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--loss-impl", default="auto",
                    choices=["auto", "chunked", "full"],
                    help="auto (default) picks full [B,T,V] logits when "
                         "they fit (~1% faster, b256@13k vocab) and the "
                         "chunked LM-head loss when they don't (b512, "
                         "English vocab)")
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "pallas", "pallas_packed", "xla"],
                    help="train attention kernel: auto → pallas_packed "
                         "(unpadded slab) on TPU; 'pallas' keeps the r02 "
                         "padded-slab variant for A/B")
    ap.add_argument("--remat-policy", default="auto",
                    choices=["auto", "full", "save_qkv_ctx",
                             "save_ctx_fc1", "save_all"],
                    help="selective-remat menu (models/gpt2.py). r03 "
                         "measured save_qkv_ctx LOSING with the padded "
                         "slab; the packed slab halves the qkv save cost")
    ap.add_argument("--pack", action="store_true",
                    help="bench the --pack_sequences mode: synthetic "
                         "lyric-length distribution, packed rows, "
                         "samples/s = real samples consumed per second "
                         "(NON-parity objective; see mmtg_tpu/pack.py)")
    ap.add_argument("--pack-avg-len", type=float, default=12.0,
                    help="mean content tokens per sentence (max 20) for "
                         "the synthetic packing distribution")
    ap.add_argument("--pack-rows", type=int, default=0,
                    help="packed rows per step (0 = match the parity "
                         "token budget: 65536 / row_len, rounded to 8)")
    ap.add_argument("--pack-row-len", type=int, default=512,
                    help="packed row length (multiple of 128). Longer "
                         "rows pack more samples each (less dead tail) "
                         "but pay quadratic in-row attention; 512 fits "
                         "~3 avg lyric samples")
    ap.add_argument("--round", type=int, default=0,
                    help="also write BENCH_TRAIN_r{N}.json")
    ap.add_argument("--steps-per-block", type=int, default=5,
                    help="steps chained per timing block (sync once per "
                         "block). Steps depend on each other through the "
                         "donated train state, so a block measures true "
                         "sustained device throughput; syncing EVERY step "
                         "additionally measures the host/tunnel dispatch "
                         "gap (~30 ms here) that a real train loop — which "
                         "only syncs at log intervals, reference "
                         "train.py:196-201 — pipelines away")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, ModelConfig, TrainConfig
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.train import (
        _resolve_loss_impl,
        _resolve_remat_policy,
        create_train_state,
        make_train_step,
    )

    mcfg, dcfg = ModelConfig(), DataConfig()
    tcfg = TrainConfig(alpha=0.2, dtype=args.dtype, loss_impl=args.loss_impl,
                       attn_impl=args.attn_impl,
                       remat_policy=args.remat_policy)
    rng = np.random.default_rng(0)
    B = args.batch

    if args.pack:
        return _bench_packed(args, mcfg, dcfg, tcfg, rng)
    P, T, E = dcfg.topic_prompt_length, dcfg.target_length, dcfg.wenlan_emb_size
    V = mcfg.gpt2.vocab_size

    batch = {
        "topic_ids": jnp.asarray(rng.integers(103, 8000, (B, P)), jnp.int32),
        "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
        "tpw_type_ids": jnp.ones((B, P), jnp.int32),
        "topic_emb": jnp.asarray(rng.standard_normal((B, E)), jnp.float32),
        "img_embs": jnp.asarray(rng.standard_normal((B, 5, E)), jnp.float32),
        "r_embs": jnp.asarray(rng.standard_normal((B, 5, E)), jnp.float32),
        "targets": jnp.asarray(rng.integers(103, V, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "type_ids": jnp.asarray(rng.integers(0, 5, (B, T)), jnp.int32),
        "rating": jnp.asarray(rng.integers(1, 6, (B,)), jnp.float32),
        "sample_mask": jnp.ones((B,), jnp.float32),
    }
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((V, E)), jnp.float32
        )
    }

    state, tx = create_train_state(
        jax.random.PRNGKey(2), mcfg, tcfg, 10, 1000,
        params=init_mmtg_params(jax.random.PRNGKey(0), mcfg),
    )
    step_fn = make_train_step(mcfg, dcfg, tcfg, tx)
    stage = jnp.asarray(3)

    def sync(x):
        float(jnp.sum(x))  # device->host transfer = real completion

    # compile + warmup
    state, m = step_fn(state, const, batch, stage)
    sync(m["total"])

    # headline: sustained throughput — K chained steps per sync (each step
    # consumes the previous step's donated state, so the final sync proves
    # every step ran; no per-step host round-trip, like a real train loop
    # between log intervals)
    K = args.steps_per_block
    block_times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step_fn(state, const, batch, stage)
        sync(m["total"])
        block_times.append((time.perf_counter() - t0) / K)
    block_times.sort()
    dt = block_times[len(block_times) // 2]
    spread = (block_times[-2] - block_times[0]) / dt * 100 \
        if len(block_times) > 2 else 0.0

    # secondary: per-step wall with a sync after EVERY step (adds the
    # host/tunnel dispatch gap to each step)
    sync_times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        state, m = step_fn(state, const, batch, stage)
        sync(m["total"])
        sync_times.append(time.perf_counter() - t0)
    sync_times.sort()
    dt_sync = sync_times[len(sync_times) // 2]

    out = {
        "metric": f"train samples/sec (full MMTG step, batch {B}, "
                  f"{args.dtype}+remat)",
        "value": round(B / dt, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "detail": {
            "batch": B,
            "dtype": args.dtype,
            "step_ms_p50": round(dt * 1e3, 1),
            "steps_per_block": K,
            "step_ms_sync_every_step": round(dt_sync * 1e3, 1),
            "best_step_ms": round(block_times[0] * 1e3, 1),
            "best_samples_s": round(B / block_times[0], 1),
            "runs": args.runs,
            "spread_pct": round(spread, 1),
            "remat": _resolve_remat_policy(tcfg.remat_policy, batch),
            "attn_impl": args.attn_impl,
            "loss_impl": _resolve_loss_impl(
                tcfg.loss_impl, batch, mcfg.gpt2.vocab_size
            ),
            "baseline": "reference publishes no train throughput "
                        "(BASELINE.md); absolute samples/s is the headline",
            "device": str(jax.devices()[0].device_kind),
        },
    }
    # machine-checkable MFU (utils/roofline.py): model FLOPs (fwd+bwd,
    # standard convention) ÷ step wall ÷ bf16 peak; hw_flops_util adds
    # the remat re-forward the chip actually executes. BASELINE.md's
    # "≤10 ms @ b256" reconciliation derives from the same numbers.
    from mmtg_tpu.utils.roofline import train_mfu

    out["detail"]["roofline"] = train_mfu(
        mcfg, dcfg, B, dt, jax.devices()[0].device_kind,
        remat=tcfg.remat,
    )
    line = json.dumps(out)
    print(line)
    if args.round:
        with open(f"BENCH_TRAIN_r{args.round:02d}.json", "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
