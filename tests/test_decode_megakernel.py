"""Whole-step decode megakernel vs the per-layer XLA decode path.

The megakernel (ops/decode_megakernel.py) runs ALL transformer layers of
one decode step in one pallas_call — glue (LN/qkv/proj/MLP) on-core, the
int8 quantize-append RMW and flash attention reproduced from the unified
kernel. These tests pin it, in interpret mode, to
``gpt2_decode_step(attn_impl="xla")``: same logits (f32 tolerance), same
cache rows/scales written, garbage beyond ``position`` ignored, and a
multi-step rollout staying in agreement as the cache fills through tile /
row-block / scale-block boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.gpt2 import (
    KVCache,
    gpt2_decode_step,
    init_cache,
    init_gpt2_params,
    quantize_rows,
)
from mmtg_tpu.ops.decode_megakernel import decode_block_fused

CFG = GPT2Config(
    vocab_size=120, n_positions=300, n_ctx=300, n_embd=128, n_layer=3, n_head=4
)
B, T = 8, 256
L, D = CFG.n_layer, CFG.n_embd


@pytest.fixture(scope="module")
def params():
    return init_gpt2_params(jax.random.PRNGKey(0), CFG)


def _filled_cache(rng, position):
    """int8 cache with rows < position quantized exactly like prefill."""
    k = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    # garbage beyond position must be ignored (masked + never read)
    return KVCache(kq, vq, ks, vs)


def _key_mask(position):
    m = (jnp.arange(T)[None, :] <= position).astype(jnp.int32)
    return jnp.tile(m, (B, 1))


def _step_both(params, cache, x, position, tt, mask, monkeypatch, block_b=8):
    from mmtg_tpu.ops import decode_megakernel

    ref_logits, ref_cache = gpt2_decode_step(
        params, CFG, cache, x, jnp.asarray(position), tt, mask,
        attn_impl="xla",
    )
    monkeypatch.setattr(decode_megakernel, "INTERPRET", True)
    h = (
        x
        + params["wpe"][jnp.asarray(position)]
        + jnp.take(params["wte"], tt, axis=0)
    )
    out = decode_block_fused(
        # the kernel donates (input_output_aliases) — pass copies so the
        # caller's cache stays readable for the assertions
        h, params["h"], jnp.array(cache.k), jnp.array(cache.v),
        jnp.array(cache.k_scale), jnp.array(cache.v_scale),
        mask, jnp.asarray(position), n_head=CFG.n_head,
        eps=CFG.layer_norm_epsilon, block_b=block_b, tile_t=64,
        interpret=True,
    )
    h_out, k, v, ks, vs = out
    from mmtg_tpu.models.gpt2 import _layer_norm

    h_out = _layer_norm(
        h_out, params["lnf_g"], params["lnf_b"], CFG.layer_norm_epsilon
    )
    fused_logits = h_out @ params["wte"].T
    return ref_logits, ref_cache, fused_logits, KVCache(k, v, ks, vs)


@pytest.mark.parametrize("position", [0, 5, 63, 64, 130, 255])
def test_megakernel_matches_xla_step(params, position, monkeypatch):
    rng = np.random.default_rng(position + 1)
    cache = _filled_cache(rng, position)
    x = jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.float32)
    tt = jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)
    mask = _key_mask(position)
    ref_logits, ref_cache, fused_logits, fused_cache = _step_both(
        params, cache, x, position, tt, mask, monkeypatch
    )
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits), atol=5e-3, rtol=0
    )
    # the appended rows and scales agree with the XLA quantize+DUS path
    # (quantization boundary rounding can differ by 1 code)
    for l in range(L):
        np.testing.assert_allclose(
            np.asarray(fused_cache.k[l, :, position].astype(jnp.int32)),
            np.asarray(ref_cache.k[l, :, position].astype(jnp.int32)),
            atol=1,
        )
        np.testing.assert_allclose(
            np.asarray(fused_cache.k_scale[l, :, position]),
            np.asarray(ref_cache.k_scale[l, :, position]),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(fused_cache.v_scale[l, :, position]),
            np.asarray(ref_cache.v_scale[l, :, position]),
            rtol=1e-4,
        )
    # neighbor rows untouched
    if position + 1 < T:
        np.testing.assert_array_equal(
            np.asarray(fused_cache.k[:, :, position + 1]),
            np.asarray(cache.k[:, :, position + 1]),
        )


def test_megakernel_multistep_rollout(params, monkeypatch):
    """Run 6 consecutive steps through BOTH paths from a shared prefix,
    each feeding its own updated cache forward — covers append-read-back
    coherence across sub-tile and row-block boundaries."""
    rng = np.random.default_rng(7)
    start = 62  # crosses the G=16 sub-tile boundary and the ROWB=8 block
    cache_ref = _filled_cache(rng, start)
    cache_fused = KVCache(
        cache_ref.k, cache_ref.v, cache_ref.k_scale, cache_ref.v_scale
    )
    for i in range(6):
        position = start + i
        x = jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.float32)
        tt = jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)
        mask = _key_mask(position)
        ref_logits, cache_ref, fused_logits, cache_fused = _step_both(
            params, cache_ref, x, position, tt, mask, monkeypatch
        )
        # feed each path its own cache; paths must stay in agreement
        np.testing.assert_allclose(
            np.asarray(fused_logits), np.asarray(ref_logits), atol=5e-3,
            rtol=0, err_msg=f"step {i} (position {position})",
        )


def test_megakernel_two_batch_blocks(params, monkeypatch):
    """block_b smaller than B: the residual-stream scratch and weight
    fetch must be coherent across the batch-block grid dimension."""
    rng = np.random.default_rng(11)
    position = 70
    cache = _filled_cache(rng, position)
    x = jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.float32)
    tt = jnp.zeros((B,), jnp.int32)
    mask = _key_mask(position)
    ref_logits, _, fused_logits, _ = _step_both(
        params, cache, x, position, tt, mask, monkeypatch, block_b=4
    )
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits), atol=5e-3, rtol=0
    )


def test_generate_engine_fused_runs(params, monkeypatch):
    """attn_impl='fused' drives the full generate engine end-to-end (tiny
    model, interpret mode) and produces frame-legal tokens."""
    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.decoding import generate
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.ops import decode_megakernel

    monkeypatch.setattr(decode_megakernel, "INTERPRET", True)
    mcfg = ModelConfig(gpt2=CFG)
    dcfg = DataConfig()
    # weight_dtype pinned to 'model': the fused megakernel is gated to
    # full-precision weights, and the 'auto' default resolves to int8 at
    # this batch size — which would (correctly) downgrade fused→pallas
    gcfg = GenerateConfig(attn_impl="fused", cache_dtype="int8", length=45,
                          weight_dtype="model")
    rng = np.random.default_rng(0)
    params_m = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((CFG.vocab_size, dcfg.wenlan_emb_size)),
            jnp.float32,
        )
    }
    Bs, P, E = 8, dcfg.topic_prompt_length, dcfg.wenlan_emb_size
    batch = {
        "topic_ids": jnp.asarray(rng.integers(103, 119, (Bs, P)), jnp.int32),
        "tpw_attention_mask": jnp.ones((Bs, P), jnp.int32),
        "tpw_type_ids": jnp.ones((Bs, P), jnp.int32),
        "topic_emb": jnp.asarray(rng.standard_normal((Bs, E)), jnp.float32),
        "img_embs": jnp.asarray(rng.standard_normal((Bs, 5, E)), jnp.float32),
        "r_embs": jnp.asarray(rng.standard_normal((Bs, 5, E)), jnp.float32),
    }
    toks = generate(params_m, const, mcfg, dcfg, gcfg, batch, jax.random.PRNGKey(1))
    toks = np.asarray(toks)
    assert toks.shape == (Bs, 46)
    # frame grid: position 22k is START, 22k+21 is EOS (generate.py:118-122)
    assert (toks[:, 21] == 2).all() and (toks[:, 22] == 1).all()
