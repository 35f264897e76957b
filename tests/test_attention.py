"""Alpha/beta attention: golden-value tests vs independent torch/numpy oracles."""

import math

import jax
import numpy as np
import pytest

from mmtg_tpu.models.attention import (
    alpha_attention,
    beta_attention,
    gaussian_step_priors,
    init_alpha_attention_params,
    init_beta_attention_params,
)


def test_prior_table_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    ours = gaussian_step_priors(5)
    for i in range(5):
        ref = scipy_stats.norm.pdf(np.arange(0, 5, 1), i, 1)
        ref = ref / ref.sum()  # reference model.py:118-119 normalization
        np.testing.assert_allclose(ours[i], ref, rtol=1e-6)
    np.testing.assert_allclose(ours.sum(axis=1), 1.0, rtol=1e-6)


def test_alpha_attention_oracle(tiny_model_cfg):
    """Context + KL vs a direct numpy transcription of the math
    (multi-head QKV self-attention over 5 steps; KLDivLoss batchmean
    against the N(i,1) prior — reference model.py:133-161)."""
    cfg = tiny_model_cfg
    key = jax.random.PRNGKey(0)
    params = init_alpha_attention_params(key, cfg)
    B, T, H = 3, 5, cfg.self_att_hidden_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))

    ctx, kl = alpha_attention(params, cfg, x)
    assert ctx.shape == (B, T, H)
    assert kl.shape == (B,)

    # numpy oracle
    xn = np.asarray(x, np.float64)
    q = xn @ np.asarray(params["query"]["w"]) + np.asarray(params["query"]["b"])
    k = xn @ np.asarray(params["key"]["w"]) + np.asarray(params["key"]["b"])
    v = xn @ np.asarray(params["value"]["w"]) + np.asarray(params["value"]["b"])
    nh = cfg.self_att_heads
    hd = H // nh
    rs = lambda t: t.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)
    scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    ctx_ref = (probs @ v).transpose(0, 2, 1, 3).reshape(B, T, H)
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref, atol=1e-4)

    prior = gaussian_step_priors(T).astype(np.float64)
    # reference: for each i, KLDivLoss(batchmean)(log probs[:,:,i,:], prior_i
    # repeated over (B, h)) then mean over i.
    kls = []
    for i in range(T):
        val = (prior[i] * (np.log(prior[i]) - np.log(probs[:, :, i, :]))).sum() / B
        kls.append(val)
    kl_scalar_ref = np.mean(kls)
    np.testing.assert_allclose(np.asarray(kl).mean(), kl_scalar_ref, rtol=1e-4)


def test_beta_attention_oracle(tiny_model_cfg):
    """Vectorized beta attention vs a literal per-step loop (model.py:191-200)."""
    cfg = tiny_model_cfg
    params = init_beta_attention_params(jax.random.PRNGKey(2), cfg)
    B, T, H = 2, cfg.seq_len, cfg.topic.hidden_dim
    topic = jax.random.normal(jax.random.PRNGKey(3), (B, H))
    image = jax.random.normal(jax.random.PRNGKey(4), (B, T, H))
    text = jax.random.normal(jax.random.PRNGKey(5), (B, T, H))

    out = beta_attention(params, topic, image, text)
    assert out.shape == (B, T, cfg.mm_att_out_dim)

    # loop oracle
    aw = np.asarray(params["att_w"], np.float64)  # [T, H, 1]
    ab = np.asarray(params["att_b"], np.float64)  # [T, 1]
    ow = np.asarray(params["out"]["w"], np.float64)
    ob = np.asarray(params["out"]["b"], np.float64)
    tn, imn, txn = (np.asarray(a, np.float64) for a in (topic, image, text))
    ref = np.zeros((B, T, cfg.mm_att_out_dim))
    for i in range(T):
        stacked = np.stack([tn, imn[:, i], txn[:, i]], axis=1)  # [B, 3, H]
        scores = stacked @ aw[i] + ab[i]  # [B, 3, 1]
        s = scores[..., 0]
        e = np.exp(s - s.max(-1, keepdims=True))
        mix = e / e.sum(-1, keepdims=True)  # [B, 3]
        fused = np.einsum("bm,bmh->bh", mix, stacked)
        ref[:, i] = fused @ ow + ob
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
