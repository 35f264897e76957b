"""The five BASELINE.md benchmark configs, one JSON line each.

  1. single-sample top-k decode, batch 1 (reference ``generate.py`` shape)
  2. multi-channel encoder forward, batch 32
  3. full train step (fwd+bwd+AdamW) with curriculum negative sampling
  4. batched KV-cached top-k/top-p decode at batch 256
  5. English variant (CLIP-sized embeddings + English GPT-2 dims)

Usage: ``python -m benchmarks.run [--configs 1,2,3,4,5] [--dtype bfloat16]``

All timings sync via a device→host scalar transfer (on the experimental
axon TPU platform ``block_until_ready`` returns at dispatch time).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:1]))


def _time(fn, runs=3):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(runs):
        fn()
    return (time.perf_counter() - t0) / runs


def make_batch(rng, B, dcfg, dtype, with_targets=False, vocab=13317):
    import jax.numpy as jnp

    P, E = dcfg.topic_prompt_length, dcfg.wenlan_emb_size
    b = {
        "topic_ids": jnp.asarray(rng.integers(103, vocab, (B, P)), jnp.int32),
        "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
        "tpw_type_ids": jnp.ones((B, P), jnp.int32),
        "topic_emb": jnp.asarray(rng.standard_normal((B, E)), dtype),
        "img_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
        "r_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
    }
    if with_targets:
        T = dcfg.target_length
        b["targets"] = jnp.asarray(rng.integers(103, vocab, (B, T)), jnp.int32)
        b["attention_mask"] = jnp.ones((B, T), jnp.int32)
        b["type_ids"] = jnp.asarray(rng.integers(0, 5, (B, T)), jnp.int32)
        b["rating"] = jnp.asarray(rng.integers(1, 6, (B,)), jnp.float32)
        b["sample_mask"] = jnp.ones((B,), jnp.float32)
    return b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()
    wanted = {int(x) for x in args.configs.split(",")}

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import (
        ChannelConfig,
        DataConfig,
        GenerateConfig,
        GPT2Config,
        ModelConfig,
        TrainConfig,
    )
    from mmtg_tpu.decoding import generate
    from mmtg_tpu.models.mmtg import encode_experiences, init_mmtg_params
    from mmtg_tpu.train import create_train_state, make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    mcfg, dcfg = ModelConfig(), DataConfig()
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)), dtype
        )
    }
    key = jax.random.PRNGKey(1)
    results = []

    if 1 in wanted:  # single-sample top-k decode (reference generate.py shape)
        # BASELINE.md words this config "CPU, batch 1"; we deliberately run
        # it on the default device (the TPU chip) with pure top-k
        # (top_p=0) — the JSON records both choices honestly.
        b = make_batch(rng, 1, dcfg, dtype)
        g = GenerateConfig(top_p=0.0)  # pure top-k, like config name says
        dt = _time(lambda: _sync(generate(params, const, mcfg, dcfg, g, b, key)))
        results.append(
            {"config": "1:batch1-topk-decode", "value": round(g.length / dt, 1),
             "unit": "tok/s", "p50_latency_s": round(dt, 4),
             "device": str(jax.devices()[0]), "sampling": "top-k 10, top-p off",
             "note": "BASELINE config 1 says CPU; measured on the TPU chip instead"}
        )

    if 2 in wanted:  # encoder forward, batch 32
        b = make_batch(rng, 32, dcfg, dtype)
        enc = jax.jit(
            lambda p, t, i, r: encode_experiences(p, mcfg, t, i, r)[0]
        )
        dt = _time(
            lambda: _sync(enc(params, b["topic_emb"], b["img_embs"], b["r_embs"]))
        )
        results.append(
            {"config": "2:encoder-fwd-b32", "value": round(32 / dt, 1),
             "unit": "samples/s", "step_ms": round(dt * 1e3, 3)}
        )

    if 3 in wanted:  # full train step, batch 256
        tcfg = TrainConfig(alpha=0.2, dtype=args.dtype)
        state, tx = create_train_state(
            jax.random.PRNGKey(2), mcfg, tcfg, 10, 1000,
            params=init_mmtg_params(jax.random.PRNGKey(0), mcfg),
        )
        step_fn = make_train_step(mcfg, dcfg, tcfg, tx)
        b = make_batch(rng, 256, dcfg, jnp.float32, with_targets=True)
        stage = jnp.asarray(1)
        holder = {"state": state}

        def run():
            holder["state"], m = step_fn(holder["state"], const32, b, stage)
            _sync(m["total"])

        const32 = {"wenlan_table": const["wenlan_table"].astype(jnp.float32)}
        dt = _time(run)
        results.append(
            {"config": "3:train-step-b256", "value": round(256 / dt, 1),
             "unit": "samples/s", "step_ms": round(dt * 1e3, 2)}
        )

    if 4 in wanted:  # batched KV-cached decode, batch 256
        b = make_batch(rng, 256, dcfg, dtype)
        g = GenerateConfig()
        dt = _time(lambda: _sync(generate(params, const, mcfg, dcfg, g, b, key)))
        results.append(
            {"config": "4:batched-decode-b256", "value": round(256 * g.length / dt, 1),
             "unit": "tok/s", "p50_latency_s": round(dt, 4)}
        )

    if 5 in wanted:  # English variant: CLIP 512-dim embeddings, GPT-2 base dims
        emcfg = ModelConfig(
            topic=ChannelConfig(input_dim=512, hidden_dim=512, type="MLP"),
            image=ChannelConfig(input_dim=512, hidden_dim=512),
            text=ChannelConfig(input_dim=512, hidden_dim=512),
            mm_att_out_dim=512,
            gpt2=GPT2Config(vocab_size=50257, n_positions=1024),
        )
        edcfg = DataConfig(wenlan_emb_size=512)
        ep = init_mmtg_params(jax.random.PRNGKey(3), emcfg, dtype=dtype)
        ec = {
            "wenlan_table": jnp.asarray(
                rng.standard_normal((emcfg.gpt2.vocab_size, 512)), dtype
            )
        }
        b = make_batch(rng, 64, edcfg, dtype, vocab=50257)
        g = GenerateConfig()
        dt = _time(lambda: _sync(generate(ep, ec, emcfg, edcfg, g, b, key)))
        results.append(
            {"config": "5:english-clip-decode-b64",
             "value": round(64 * g.length / dt, 1), "unit": "tok/s",
             "p50_latency_s": round(dt, 4)}
        )
        # the canonical serving config at English scale: vocab 50257 puts
        # 3.8x more weight on the LM-head/sampling tail than the Chinese
        # headline — this line quantifies it
        b512 = make_batch(rng, 512, edcfg, dtype, vocab=50257)
        g8 = GenerateConfig(cache_dtype="int8")
        dt = _time(lambda: _sync(generate(ep, ec, emcfg, edcfg, g8, b512, key)))
        results.append(
            {"config": "5b:english-clip-decode-b512-int8",
             "value": round(512 * g8.length / dt, 1), "unit": "tok/s",
             "p50_latency_s": round(dt, 4)}
        )
        # at vocab 50,257 the exact full-vocab TopK custom call is
        # sort-bound (~16% of the step); approx_max_k (recall 0.99) is
        # the measured English serving lever (docs/PERF.md) — this line
        # quantifies it in the same session as 5b
        ga = GenerateConfig(cache_dtype="int8", topk_impl="approx")
        dt = _time(lambda: _sync(generate(ep, ec, emcfg, edcfg, ga, b512, key)))
        results.append(
            {"config": "5c:english-clip-decode-b512-int8-approx-topk",
             "value": round(512 * ga.length / dt, 1), "unit": "tok/s",
             "p50_latency_s": round(dt, 4)}
        )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
