"""Multi-channel experience encoder (reference ``model.py:24-88``).

Three channels over the 5-step experience sequence:
  * topic: Linear 2048→512 on the topic WenLan embedding
    (``model.py:39``, ``:77``);
  * image / text: independent recurrent stacks (RNN/LSTM/GRU) 2048→512
    over the 5 steps (``model.py:41-59``, ``:78-79``) — here `lax.scan`
    cells from :mod:`mmtg_tpu.ops.rnn`;
  * 'TRM': a small causal transformer channel. The reference *mentions*
    TRM (``configs.py:10``) but never implements it (selecting it would
    crash); we implement it as a capability superset.

Weight init matches the reference: Xavier-normal input weights and
orthogonal recurrent weights on layer 0 (``model.py:83-88``), torch
defaults elsewhere.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mmtg_tpu.configs import ChannelConfig, ModelConfig
from mmtg_tpu.ops.rnn import init_rnn_params, rnn_forward


def _linear_init(key, in_dim, out_dim, dtype, xavier=False):
    """torch ``nn.Linear`` default (kaiming-uniform ≡ U(-1/√in, 1/√in));
    ``xavier=True`` applies the reference's xavier-normal weight override."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    if xavier:
        std = math.sqrt(2.0 / (in_dim + out_dim))
        w = std * jax.random.normal(kw, (in_dim, out_dim), dtype)
    else:
        w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _init_trm_channel(key, ch: ChannelConfig, dtype) -> Dict:
    """Tiny causal pre-LN transformer channel (TRM option)."""
    D = ch.hidden_dim
    ks = jax.random.split(key, 6)
    std = 0.02
    nrm = lambda k, shape: (std * jax.random.normal(k, shape, jnp.float32)).astype(dtype)
    return {
        "in_proj": _linear_init(ks[0], ch.input_dim, D, dtype),
        "pos": nrm(ks[1], (32, D)),
        "ln1_g": jnp.ones((D,), dtype),
        "ln1_b": jnp.zeros((D,), dtype),
        "qkv_w": nrm(ks[2], (D, 3 * D)),
        "qkv_b": jnp.zeros((3 * D,), dtype),
        "proj_w": nrm(ks[3], (D, D)),
        "proj_b": jnp.zeros((D,), dtype),
        "ln2_g": jnp.ones((D,), dtype),
        "ln2_b": jnp.zeros((D,), dtype),
        "fc_w": nrm(ks[4], (D, 4 * D)),
        "fc_b": jnp.zeros((4 * D,), dtype),
        "out_w": nrm(ks[5], (4 * D, D)),
        "out_b": jnp.zeros((D,), dtype),
    }


def _trm_forward(p: Dict, x: jnp.ndarray, n_head: int = 4) -> jnp.ndarray:
    """x: [T, B, in] → [T, B, D]; causal self-attention over the 5 steps."""
    T, B, _ = x.shape
    h = x @ p["in_proj"]["w"] + p["in_proj"]["b"] + p["pos"][:T][:, None, :]
    h = h.transpose(1, 0, 2)  # [B, T, D]
    D = h.shape[-1]
    hd = D // n_head

    def ln(v, g, b):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    a = ln(h, p["ln1_g"], p["ln1_b"])
    qkv = a @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal, scores, -1e30)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    h = h + ctx @ p["proj_w"] + p["proj_b"]
    m = ln(h, p["ln2_g"], p["ln2_b"])
    h = h + jax.nn.gelu(m @ p["fc_w"] + p["fc_b"]) @ p["out_w"] + p["out_b"]
    return h.transpose(1, 0, 2)


def init_encoder_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    k_topic, k_img, k_text = jax.random.split(key, 3)
    params = {
        "topic_fc": _linear_init(
            k_topic, cfg.topic.input_dim, cfg.topic.hidden_dim, dtype, xavier=True
        )
    }
    for name, k, ch in (("image", k_img, cfg.image), ("text", k_text, cfg.text)):
        if ch.type == "TRM":
            params[name] = _init_trm_channel(k, ch, dtype)
        else:
            params[name] = init_rnn_params(
                k, ch.type, ch.input_dim, ch.hidden_dim, ch.num_layers, dtype
            )
    return params


def encoder_forward(
    params: Dict,
    cfg: ModelConfig,
    topic: jnp.ndarray,
    image: jnp.ndarray,
    text: jnp.ndarray,
    dropout_key=None,
    use_fused_gru: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference ``MultiModalEncoder.forward`` (``model.py:63-81``).

    Args:
      topic: ``[B, input_dim]``; image/text: ``[T, B, input_dim]``.
    Returns:
      (topic ``[1, B, H]``, image ``[T, B, H]``, text ``[T, B, H]``).
    """
    out_topic = (topic @ params["topic_fc"]["w"] + params["topic_fc"]["b"])[None]
    outs = {}
    for name, x, ch in (("image", image, cfg.image), ("text", text, cfg.text)):
        if ch.type == "TRM":
            outs[name] = _trm_forward(params[name], x)
        elif use_fused_gru and ch.type == "GRU" and ch.num_layers == 1:
            # inference-only Pallas kernel (no custom VJP): hidden state
            # stays in VMEM across all T steps
            from mmtg_tpu.ops.fused_gru import fused_gru

            lp = params[name]["layers"][0]
            outs[name] = fused_gru(
                x, lp["w_ih"], lp["w_hh"], lp["b_ih"], lp["b_hh"]
            )
        else:
            k = None
            if dropout_key is not None:
                dropout_key, k = jax.random.split(dropout_key)
            outs[name], _ = rnn_forward(
                params[name], x, ch.type, dropout_rate=cfg.dropout, dropout_key=k
            )
    return out_topic, outs["image"], outs["text"]
