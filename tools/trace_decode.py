"""Trace a decode call to attribute per-step device time.

Defaults reproduce the b512 int8 headline attribution (docs/PERF.md
round-3); ``--batch 1 --weight-dtype int8 --attn-impl auto`` traces the
latency regime (docs/PERF.md "Round-4 latency regime"). Sub-ms ops can
ONLY be attributed this way on this platform — standalone op timing
reads the ~28 ms tunnel dispatch floor (CLAUDE.md rule 6).
"""
import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmtg_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
from mmtg_tpu.decoding import generate
from mmtg_tpu.models.mmtg import init_mmtg_params

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=512)
ap.add_argument("--cache-dtype", default="int8",
                choices=["model", "int8", "int4"])
ap.add_argument("--weight-dtype", default="model",
                choices=["auto", "model", "int8"])
ap.add_argument("--attn-impl", default="auto",
                choices=["auto", "pallas", "fused", "xla"])
ap.add_argument("--out", default="/tmp/trace_decode")
args = ap.parse_args()

rng = np.random.default_rng(0)
mcfg, dcfg = ModelConfig(), DataConfig()
gcfg = GenerateConfig(cache_dtype=args.cache_dtype,
                      weight_dtype=args.weight_dtype,
                      attn_impl=args.attn_impl)
dtype = jnp.bfloat16
params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
const = {
    "wenlan_table": jnp.asarray(
        rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)), dtype
    )
}
B, P, E = args.batch, dcfg.topic_prompt_length, dcfg.wenlan_emb_size
batch = {
    "topic_ids": jnp.asarray(rng.integers(103, 8000, (B, P)), jnp.int32),
    "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
    "tpw_type_ids": jnp.ones((B, P), jnp.int32),
    "topic_emb": jnp.asarray(rng.standard_normal((B, E)), dtype),
    "img_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
    "r_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
}
key = jax.random.PRNGKey(1)
float(jnp.sum(generate(params, const, mcfg, dcfg, gcfg, batch, key)))  # compile
with jax.profiler.trace(args.out):
    toks = generate(params, const, mcfg, dcfg, gcfg, batch, key)
    float(jnp.sum(toks))
print(f"traced b{B} {args.weight_dtype}/{args.cache_dtype}/{args.attn_impl}"
      f" -> {args.out}")
