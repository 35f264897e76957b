"""Config invariants + the English-variant preset."""

import pytest

from mmtg_tpu.configs import (
    ChannelConfig,
    DataConfig,
    GPT2Config,
    ModelConfig,
    english_variant,
)


def test_derived_layout_constants():
    d = DataConfig()
    assert d.sent_frame_length == 22
    assert d.two_sents_length == 44
    assert d.target_length == 221
    assert d["max_sent_length"] == 20  # dict-style parity access


def test_hidden_dim_invariant():
    with pytest.raises(ValueError):
        ModelConfig(topic=ChannelConfig(hidden_dim=256))


def test_head_divisibility():
    with pytest.raises(ValueError):
        ModelConfig(self_att_heads=7)


def test_gpt2_json_roundtrip(tmp_path):
    import json

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "vocab_size": 13317, "n_ctx": 250, "n_embd": 768, "n_head": 12,
        "n_layer": 12, "n_positions": 1024, "layer_norm_epsilon": 1e-5,
        "initializer_range": 0.02,
    }))
    cfg = GPT2Config.from_json_file(str(p))
    assert cfg.vocab_size == 13317 and cfg.n_ctx == 250


def test_english_variant_dims():
    mcfg, dcfg = english_variant()
    assert mcfg.topic.input_dim == 512
    assert mcfg.mm_att_out_dim == 512
    assert mcfg.gpt2.vocab_size == 50257
    assert dcfg.wenlan_emb_size == 512


def test_english_variant_forward():
    """Scaled-down English-like dims run the full forward (dimension-driven)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtg_tpu.models.mmtg import init_mmtg_params, mmtg_forward_train

    mcfg = ModelConfig(
        topic=ChannelConfig(input_dim=48, hidden_dim=32, type="MLP"),
        image=ChannelConfig(input_dim=48, hidden_dim=32),
        text=ChannelConfig(input_dim=48, hidden_dim=32),
        self_att_hidden_size=32,
        self_att_heads=4,
        mm_att_out_dim=48,
        gpt2=GPT2Config(vocab_size=300, n_positions=256, n_embd=32, n_layer=2, n_head=4),
    )
    dcfg = DataConfig(wenlan_emb_size=48)
    rng = np.random.default_rng(0)
    B, P, T = 2, dcfg.topic_prompt_length, dcfg.target_length
    batch = {
        "topic_ids": jnp.asarray(rng.integers(0, 300, (B, P)), jnp.int32),
        "tpw_attention_mask": jnp.ones((B, P), jnp.int32),
        "tpw_type_ids": jnp.ones((B, P), jnp.int32),
        "topic_emb": jnp.asarray(rng.standard_normal((B, 48)), jnp.float32),
        "img_embs": jnp.asarray(rng.standard_normal((B, 5, 48)), jnp.float32),
        "r_embs": jnp.asarray(rng.standard_normal((B, 5, 48)), jnp.float32),
        "targets": jnp.asarray(rng.integers(0, 300, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "type_ids": jnp.asarray(rng.integers(0, 5, (B, T)), jnp.int32),
    }
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    const = {"wenlan_table": jnp.asarray(rng.standard_normal((300, 48)), jnp.float32)}
    out = mmtg_forward_train(params, const, mcfg, dcfg, batch)
    assert out.logits.shape == (B, P + T, 300)
