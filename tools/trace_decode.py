"""Trace the b512 int8 decode to attribute per-step time."""
import numpy as np
import jax
import jax.numpy as jnp

from mmtg_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
from mmtg_tpu.decoding import generate
from mmtg_tpu.models.mmtg import init_mmtg_params

rng = np.random.default_rng(0)
mcfg, dcfg = ModelConfig(), DataConfig()
gcfg = GenerateConfig(cache_dtype="int8")
dtype = jnp.bfloat16
params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
const = {
    "wenlan_table": jnp.asarray(
        rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)), dtype
    )
}
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
float(jnp.sum(generate(params, const, mcfg, dcfg, gcfg, batch, key)))  # compile
with jax.profiler.trace("/tmp/trace_decode"):
    toks = generate(params, const, mcfg, dcfg, gcfg, batch, key)
    float(jnp.sum(toks))
print("traced")
