"""Shared setup for the serving benchmark/soak tools: full-size model,
WenLan table, and synthetic request payloads matching serve.SAMPLE_KEYS.

Both tools/bench_serve.py and tools/soak_serve.py build their traffic
through these helpers so a sample-schema change (serve.SAMPLE_KEYS)
breaks loudly in one place instead of silently in a copy."""

from __future__ import annotations

import numpy as np


def build_model(cache_dtype: str = "int8"):
    """Random-init full-size MMTG + table + canonical GenerateConfig."""
    import jax
    import jax.numpy as jnp

    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.models.mmtg import init_mmtg_params

    mcfg, dcfg = ModelConfig(), DataConfig()
    gcfg = GenerateConfig(cache_dtype=cache_dtype)
    rng = np.random.default_rng(0)
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=jnp.bfloat16)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
            jnp.bfloat16,
        )
    }
    return params, const, mcfg, dcfg, gcfg


def make_payload(i: int, dcfg, mcfg) -> dict:
    """One synthetic request sample keyed per serve.SAMPLE_KEYS."""
    P = dcfg.topic_prompt_length
    r = np.random.default_rng(i)
    return {
        "topic_ids": r.integers(103, 8000, (P,)).astype(np.int32),
        "tpw_attention_mask": np.ones((P,), np.int32),
        "tpw_type_ids": np.ones((P,), np.int32),
        "topic_emb": r.standard_normal((mcfg.topic.input_dim,)).astype(
            np.float32
        ),
        "img_embs": r.standard_normal(
            (mcfg.seq_len, mcfg.image.input_dim)
        ).astype(np.float32),
        "r_embs": r.standard_normal(
            (mcfg.seq_len, mcfg.text.input_dim)
        ).astype(np.float32),
    }
