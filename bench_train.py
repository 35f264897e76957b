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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--runs", type=int, default=7,
                    help="timed steps; report the p50 (tunnel hiccups make "
                         "a mean fiction)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--round", type=int, default=0,
                    help="also write BENCH_TRAIN_r{N}.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, ModelConfig, TrainConfig
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.train import create_train_state, make_train_step

    mcfg, dcfg = ModelConfig(), DataConfig()
    tcfg = TrainConfig(alpha=0.2, dtype=args.dtype)
    rng = np.random.default_rng(0)
    B = args.batch
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
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        state, m = step_fn(state, const, batch, stage)
        sync(m["total"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    spread = (times[-2] - times[0]) / dt * 100 if len(times) > 2 else 0.0

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
            "best_step_ms": round(times[0] * 1e3, 1),
            "best_samples_s": round(B / times[0], 1),
            "runs": args.runs,
            "spread_pct": round(spread, 1),
            "remat": "full-block",
            "loss_impl": tcfg.loss_impl,
            "baseline": "reference publishes no train throughput "
                        "(BASELINE.md); absolute samples/s is the headline",
            "device": str(jax.devices()[0].device_kind),
        },
    }
    line = json.dumps(out)
    print(line)
    if args.round:
        with open(f"BENCH_TRAIN_r{args.round:02d}.json", "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
