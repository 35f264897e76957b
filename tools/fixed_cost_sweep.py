"""Split the generate() wall time into fixed + per-step + quadratic parts.

The headline metric (bench.py) is B*length / wall(one generate call), so
every millisecond OUTSIDE the 220-step decode scan — encoder, prefill,
cache allocation/zero-fill, tunnel dispatch, the final token transfer —
dilutes tok/s exactly like a slow step does. The round-3 trace attributed
~3.45 ms/step to the step body but the wall is ~4.07 ms/step: this tool
measures where the difference lives.

Method: time generate at several --lengths L. Per-step cost grows
linearly with position (the kernel reads ceil((pos+1)/32rows) cache
tiles), so wall(L) = F + a*L + b*L^2/2. A least-squares fit over >=3
lengths separates the fixed cost F from the marginal step cost. Lengths
are chosen so the cache capacity (round_up(P+L+1, 128)) stays 256 for
all but the smallest — capacity-dependent init cost lands in F either
way.

Run on an idle host (CLAUDE.md rule 3). First run compiles one program
per length (~minutes each through the tunnel, cached afterwards).
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lengths", type=str, default="60,140,220")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cache-dtype", default="int8")
    args = ap.parse_args()
    lengths = [int(x) for x in args.lengths.split(",")]

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.decoding import generate

    mcfg, dcfg = ModelConfig(), DataConfig()
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    from mmtg_tpu.models.mmtg import init_mmtg_params

    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
            dtype,
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

    results = {}
    for L in lengths:
        gcfg = GenerateConfig(length=L, cache_dtype=args.cache_dtype)
        # warmup/compile (sync via host transfer — block_until_ready
        # returns at dispatch on axon)
        float(jnp.sum(generate(params, const, mcfg, dcfg, gcfg, batch, key)))
        times = []
        for i in range(args.runs):
            t0 = time.perf_counter()
            toks = generate(params, const, mcfg, dcfg, gcfg, batch,
                            jax.random.fold_in(key, i))
            float(jnp.sum(toks))
            times.append(time.perf_counter() - t0)
        times.sort()
        results[L] = times[len(times) // 2]
        print(f"L={L}: p50 {results[L]*1e3:.1f} ms  "
              f"(times {[round(t*1e3) for t in times]})", flush=True)

    # fit wall(L) = F + a L + b L^2/2
    Ls = np.array(sorted(results))
    ys = np.array([results[L] for L in Ls])
    A = np.stack([np.ones_like(Ls), Ls, Ls**2 / 2], axis=1).astype(float)
    coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
    F, a, b = coef
    L = max(Ls)
    print(json.dumps({
        "fixed_ms": round(F * 1e3, 1),
        "per_step_ms_at_0": round(a * 1e3, 3),
        "per_step_ms_at_L": round((a + b * L) * 1e3, 3),
        "quad_ms_per_step2": round(b * 1e6, 4),
        "wall_ms_at_L": round(float(ys[-1]) * 1e3, 1),
        "fixed_share_pct": round(100 * F / float(ys[-1]), 1),
        "tok_s_at_L": round(args.batch * int(L) / float(ys[-1]), 1),
        "tok_s_if_fixed_free": round(args.batch * int(L) / float(ys[-1] - F), 1),
    }))


if __name__ == "__main__":
    main()
