"""Inner-modal ("alpha") and multi-modal ("beta") attention fusion.

Alpha attention (reference ``model.py:91-161``): multi-head self-attention
over the 5 experience steps of one modality, plus a KL regularizer pulling
each step's attention distribution toward a discretized Gaussian prior
N(i, 1) centred on that step (``model.py:116-121``, ``:150-153``). Here
the prior is a precomputed ``[5, 5]`` constant and the KL is a single
einsum-free vectorized expression returning *per-sample* values so the
curriculum trainer can weight them under static shapes.

Beta attention (reference ``model.py:164-202``): for each step i, a
step-specific scoring Linear produces one scalar per modality
(topic / image_i / text_i); a 3-way softmax mixes the modality states and
a shared output Linear lifts 512 → 2048. The reference's Python loop over
steps (``model.py:191-200``) becomes one batched einsum over stacked
``[T, H, K]`` scoring weights.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import ModelConfig
from mmtg_tpu.models.encoder import _linear_init


def gaussian_step_priors(seq_len: int = 5) -> np.ndarray:
    """The reference's row-normalized N(i,1) pdf table
    (``model.py:116-121``): ``prior[i, j] ∝ exp(-(j-i)²/2)``.
    The 1/√(2π) pdf constant cancels in the row normalization."""
    j = np.arange(seq_len, dtype=np.float64)
    table = np.stack(
        [np.exp(-0.5 * (j - i) ** 2) for i in range(seq_len)]
    )
    table /= table.sum(axis=1, keepdims=True)
    return table.astype(np.float32)


def init_alpha_attention_params(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> Dict:
    H = cfg.self_att_hidden_size
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "query": _linear_init(kq, H, H, dtype),
        "key": _linear_init(kk, H, H, dtype),
        "value": _linear_init(kv, H, H, dtype),
    }


def alpha_attention(
    params: Dict, cfg: ModelConfig, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``InnerModalAttentionLayer.forward`` (``model.py:133-161``).

    Args:
      x: ``[B, T, H]`` one modality's per-step states.
    Returns:
      (context ``[B, T, H]``,
       kl ``[B]`` per-sample KL(prior ‖ attention) averaged over steps —
       ``kl.mean()`` equals the reference's KLDivLoss(batchmean) value).
    """
    B, T, H = x.shape
    n_head = cfg.self_att_heads
    hd = H // n_head

    q = x @ params["query"]["w"] + params["query"]["b"]
    k = x @ params["key"]["w"] + params["key"]["b"]
    v = x @ params["value"]["w"] + params["value"]["b"]
    rs = lambda t: t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(x.dtype) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1)  # [B, h, T, T]

    # KL(prior_i ‖ probs[:, :, i, :]) per sample:
    # reference loops i, computing KLDivLoss(batchmean) of log-probs vs the
    # prior repeated over (B, h) — i.e. (1/B) Σ_{b,h,j} p_ij (log p_ij −
    # log probs_bhij) — then means over i (model.py:150-153, :161).
    prior = jnp.asarray(gaussian_step_priors(T))  # [T, T]
    log_ratio = jnp.log(prior)[None, None] - jnp.log(probs)  # [B, h, T, T]
    kl_per_sample = jnp.einsum("ij,bhij->b", prior, log_ratio) / T

    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H)
    return ctx, kl_per_sample


def init_beta_attention_params(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> Dict:
    T, H, K = cfg.seq_len, cfg.topic.hidden_dim, cfg.mm_att_dim
    ks = jax.random.split(key, T + 1)
    per_step = [_linear_init(ks[i], H, K, dtype) for i in range(T)]
    return {
        "att_w": jnp.stack([p["w"] for p in per_step]),  # [T, H, K]
        "att_b": jnp.stack([p["b"] for p in per_step]),  # [T, K]
        "out": _linear_init(ks[T], H, cfg.mm_att_out_dim, dtype),
    }


def beta_attention(
    params: Dict,
    topic: jnp.ndarray,
    image: jnp.ndarray,
    text: jnp.ndarray,
) -> jnp.ndarray:
    """Reference ``MultiModalAttentionLayer.forward`` (``model.py:181-202``),
    vectorized over steps (only ``mm_att_dim == 1`` is meaningful — the
    reference silently requires it at ``model.py:200``).

    Args:
      topic: ``[B, H]``; image/text: ``[B, T, H]``.
    Returns:
      fused per-step vectors ``[B, T, out_dim]``.
    """
    B, T, H = image.shape
    # states[b, t, m, :]: modality m ∈ {topic, image_t, text_t}.
    states = jnp.stack(
        [jnp.broadcast_to(topic[:, None, :], (B, T, H)), image, text], axis=2
    )
    # Step-specific scalar scores: att_w [T, H, 1] → scores [B, T, 3].
    scores = (
        jnp.einsum("btmh,thk->btmk", states, params["att_w"]) + params["att_b"][None, :, None, :]
    )[..., 0]
    mix = jax.nn.softmax(scores, axis=-1)  # softmax over the 3 modalities
    fused = jnp.einsum("btm,btmh->bth", mix, states)
    return fused @ params["out"]["w"] + params["out"]["b"]
