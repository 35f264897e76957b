"""Megakernel block-shape sweep: time the FULL generate engine at the
headline shape (b512, int8, canonical sampling) for each (block_b,
sub_tiles) config, one subprocess per config (module-level knobs don't
re-key the outer generate jit).

Hypothesis being tested (docs/PERF.md round-3): the ~1.4 ms/step residual
fixed cost is per-PROGRAM, so fewer/bigger programs (grid (12,1) at
block_b=512) should claw it back where the 12->1 pallas_call merge at
block_b=128 measured a wash (same 48 programs/step).

Usage: python tools/sweep_megakernel.py [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
import numpy as np
from mmtg_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
from mmtg_tpu.ops import decode_megakernel
from mmtg_tpu.decoding import generate
from mmtg_tpu.models.mmtg import init_mmtg_params

impl, bb, sub, runs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
decode_megakernel.BLOCK_B = bb
decode_megakernel.SUB_TILES = sub

mcfg, dcfg = ModelConfig(), DataConfig()
rng = np.random.default_rng(0)
dtype = jnp.bfloat16
mparams = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
const = {"wenlan_table": jnp.asarray(
    rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)), dtype)}
B, P, E = 512, dcfg.topic_prompt_length, dcfg.wenlan_emb_size
batch = {
    "topic_ids": jnp.asarray(rng.integers(103, 8000, (B, P)), jnp.int32),
    "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
    "tpw_type_ids": jnp.ones((B, P), jnp.int32),
    "topic_emb": jnp.asarray(rng.standard_normal((B, E)), dtype),
    "img_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
    "r_embs": jnp.asarray(rng.standard_normal((B, 5, E)), dtype),
}
key = jax.random.PRNGKey(1)
gcfg = GenerateConfig(cache_dtype="int8", attn_impl=impl)
float(jnp.sum(generate(mparams, const, mcfg, dcfg, gcfg, batch, key)))  # compile
times = []
for i in range(runs):
    t0 = time.perf_counter()
    toks = generate(mparams, const, mcfg, dcfg, gcfg, batch,
                    jax.random.fold_in(key, i))
    float(jnp.sum(toks))
    times.append(time.perf_counter() - t0)
times.sort()
p50 = times[len(times) // 2]
print(json.dumps({
    "impl": impl, "block_b": bb, "sub_tiles": sub,
    "p50_s": round(p50, 3), "best_s": round(times[0], 3),
    "tok_s": round(B * gcfg.length / p50),
    "times": [round(t, 3) for t in times],
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--configs",
        default="pallas:128:4,fused:128:4,fused:256:4,fused:512:4",
        help="comma list of impl:block_b:sub_tiles",
    )
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # prepend (never replace — the axon plugin rides PYTHONPATH)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    for spec in args.configs.split(","):
        impl, bb, sub = spec.split(":")
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, impl, bb, sub, str(args.runs)],
                env=env, capture_output=True, text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"impl": impl, "block_b": int(bb),
                              "sub_tiles": int(sub),
                              "error": "timeout (1800s)"}), flush=True)
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            print(json.dumps({"impl": impl, "block_b": int(bb),
                              "sub_tiles": int(sub), "error":
                              r.stderr.strip().splitlines()[-1][:200]
                              if r.stderr.strip() else "no output"}),
                  flush=True)


if __name__ == "__main__":
    main()
