"""Probe: remat policies at b256 with the chunked loss (post-round-2 HBM)."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mmtg_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from mmtg_tpu.configs import DataConfig, ModelConfig, TrainConfig
from mmtg_tpu.models.mmtg import init_mmtg_params
from mmtg_tpu.train import create_train_state, make_train_step
from benchmarks.run import make_batch

rng = np.random.default_rng(0)
mcfg, dcfg = ModelConfig(), DataConfig()
const32 = {
    "wenlan_table": jnp.asarray(
        rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
        jnp.float32,
    )
}
stage = jnp.asarray(1)


def _sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


policy = sys.argv[1] if len(sys.argv) > 1 else "save_ctx_fc1"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
tcfg = TrainConfig(alpha=0.2, dtype="bfloat16", remat_policy=policy)
state, tx = create_train_state(
    jax.random.PRNGKey(2), mcfg, tcfg, 10, 1000,
    params=init_mmtg_params(jax.random.PRNGKey(0), mcfg),
)
b = make_batch(rng, B, dcfg, jnp.float32, with_targets=True)
step_fn = make_train_step(mcfg, dcfg, tcfg, tx)
holder = {"state": state}


def run():
    holder["state"], m = step_fn(holder["state"], const32, b, stage)
    _sync(m["total"])


try:
    run()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    p50 = ts[len(ts) // 2]
    print(json.dumps({"policy": policy, "batch": B,
                      "p50_ms": round(p50 * 1e3, 1),
                      "samples_per_s": round(B / p50, 1)}), flush=True)
except Exception as e:
    print(json.dumps({"policy": policy, "batch": B, "error": str(e)[:160]}))
