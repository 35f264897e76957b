"""Top-level MMTG model: encoder → LN → alpha ×2 → beta → GPT-2 decoder.

Functional rebuild of the reference ``MMTG`` module (``model.py:330-400``)
and its ``GPT2_Decoder`` (``model.py:205-327``). Parameters are one plain
pytree; every forward is a pure function of ``(params, const, batch)`` so
it jits, grads, and shards directly.

The reference's per-token Python loops over the ``token_id2emb`` dict
(``model.py:253-268``) are a single dense-gather here: ``const["wenlan_table"]``
is a ``[vocab, 2048]`` array and the WenLan embedding of every token in the
batch is one ``jnp.take``. The per-step fused-vector addition over 44-token
windows (``model.py:267-268``) is a precomputed index map.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmtg_tpu.configs import DataConfig, ModelConfig, SpecialTokens
from mmtg_tpu.models.attention import (
    alpha_attention,
    beta_attention,
    init_alpha_attention_params,
    init_beta_attention_params,
)
from mmtg_tpu.models.encoder import (
    _linear_init,
    encoder_forward,
    init_encoder_params,
)
from mmtg_tpu.models.gpt2 import _layer_norm, gpt2_forward, init_gpt2_params

SPECIAL = SpecialTokens()


class MMTGOutput(NamedTuple):
    logits: Optional[jnp.ndarray]  # [B, prompt+target, vocab] (None if lm_head=False)
    kl_per_sample: jnp.ndarray  # [B] alpha-attention KL (img + text)
    lm_loss: Optional[jnp.ndarray]  # HF-style shifted CE (parity aux)
    hidden: Optional[jnp.ndarray] = None  # [B, L, n_embd] pre-LM-head states


def init_mmtg_params(
    key: jax.Array, mcfg: ModelConfig, dtype=jnp.float32
) -> Dict:
    H = mcfg.topic.hidden_dim
    ks = jax.random.split(key, 8)
    return {
        "encoder": init_encoder_params(ks[0], mcfg, dtype),
        # Three independent post-encoder LayerNorms (model.py:337-339).
        "ln_topic": {"g": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
        "ln_image": {"g": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
        "ln_text": {"g": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
        "alpha_img": init_alpha_attention_params(ks[1], mcfg, dtype),
        "alpha_text": init_alpha_attention_params(ks[2], mcfg, dtype),
        "beta": init_beta_attention_params(ks[3], mcfg, dtype),
        # WenLan→GPT-2 projector 2048→512→tanh→768 (model.py:216-218).
        "projector1": _linear_init(ks[4], mcfg.mm_att_out_dim, 512, dtype),
        "projector2": _linear_init(ks[5], 512, mcfg.gpt2.n_embd, dtype),
        "gpt2": init_gpt2_params(ks[6], mcfg.gpt2, dtype),
    }


# ---------------------------------------------------------------------------
# Encoder side: experiences → fused per-step vectors
# ---------------------------------------------------------------------------


def encode_experiences(
    params: Dict,
    mcfg: ModelConfig,
    topic_emb: jnp.ndarray,
    img_embs: jnp.ndarray,
    r_embs: jnp.ndarray,
    dropout_key=None,
    use_fused_gru: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``MMTG.forward`` encoder half (``model.py:371-390``).

    Args:
      topic_emb: ``[B, 2048]``; img_embs/r_embs: ``[B, T, 2048]``.
    Returns:
      (fused ``[B, T, 2048]``, kl_per_sample ``[B]`` = img_kl + text_kl).
    """
    # cast to the parameter compute dtype (reference .float() casts,
    # model.py:371-373; bfloat16 when params are bf16)
    dtype = params["encoder"]["topic_fc"]["w"].dtype
    topic_emb = topic_emb.astype(dtype)
    img_embs = img_embs.astype(dtype)
    r_embs = r_embs.astype(dtype)
    ln = lambda x, p: _layer_norm(x, p["g"], p["b"], 1e-5)
    topic_o, image_o, text_o = encoder_forward(
        params["encoder"],
        mcfg,
        topic_emb,
        img_embs.transpose(1, 0, 2),
        r_embs.transpose(1, 0, 2),
        dropout_key=dropout_key,
        use_fused_gru=use_fused_gru,
    )
    topic_o = ln(topic_o, params["ln_topic"])  # [1, B, H]
    image_o = ln(image_o, params["ln_image"])  # [T, B, H]
    text_o = ln(text_o, params["ln_text"])

    img_ctx, img_kl = alpha_attention(
        params["alpha_img"], mcfg, image_o.transpose(1, 0, 2)
    )
    text_ctx, text_kl = alpha_attention(
        params["alpha_text"], mcfg, text_o.transpose(1, 0, 2)
    )
    fused = beta_attention(params["beta"], topic_o[0], img_ctx, text_ctx)
    return fused, img_kl + text_kl


# ---------------------------------------------------------------------------
# Decoder side: token ids (+ fused vectors) → GPT-2 input embeddings
# ---------------------------------------------------------------------------


def wenlan_embed(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Dense-gather replacement for the reference's per-token dict loops
    (``model.py:253-266``)."""
    return jnp.take(table, ids, axis=0)


def add_fused_windows(
    token_wenlan: jnp.ndarray, fused: jnp.ndarray, dcfg: DataConfig
) -> jnp.ndarray:
    """``input_ids_wenlan[:, 44k:44(k+1)] += fused[:, k]`` for k < seq_len
    (``model.py:267-268``). Positions past the last window (the trailing
    [SEP] slot 220) get no addition, exactly like the reference."""
    B, L, E = token_wenlan.shape
    T = fused.shape[1]
    win = dcfg.two_sents_length
    pos = jnp.arange(L) // win  # window index per position
    gathered = jnp.take(fused, jnp.minimum(pos, T - 1), axis=1)  # [B, L, E]
    in_window = (pos < T)[None, :, None]
    return token_wenlan + jnp.where(in_window, gathered, 0.0)


def project_to_gpt2(params: Dict, wenlan: jnp.ndarray) -> jnp.ndarray:
    """2048 → 512 → tanh → 768 (``model.py:279-281``)."""
    h = jnp.tanh(wenlan @ params["projector1"]["w"] + params["projector1"]["b"])
    return h @ params["projector2"]["w"] + params["projector2"]["b"]


def decoder_input_embeds(
    params: Dict,
    wenlan_table: jnp.ndarray,
    dcfg: DataConfig,
    fused: jnp.ndarray,
    topic_ids: jnp.ndarray,
    target_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble GPT-2 ``inputs_embeds`` for [topic prompt | targets]."""
    topic_wl = wenlan_embed(wenlan_table, topic_ids)  # [B, 15, 2048]
    tgt_wl = wenlan_embed(wenlan_table, target_ids)  # [B, L, 2048]
    tgt_wl = add_fused_windows(tgt_wl, fused, dcfg)
    return project_to_gpt2(params, jnp.concatenate([topic_wl, tgt_wl], axis=1))


# ---------------------------------------------------------------------------
# Type-id / mask schemes for generation (SURVEY.md §3.3 inconsistency)
# ---------------------------------------------------------------------------


def train_scheme_type_ids(positions: jnp.ndarray, tokens: jnp.ndarray, dcfg: DataConfig):
    """The scheme the checkpoint was trained under (``MyDataset.py:99-109``):
    content tokens of sentence-pair p get p+1 (pair 4 → 1, the call-back);
    START/EOS/PAD/SEP slots get 0. ``positions`` index into the 221-token
    target grid."""
    frame = dcfg.sent_frame_length  # 22
    r = positions % frame
    sent = positions // frame
    pair = sent // 2
    type_id = jnp.where(pair == 4, 1, pair + 1)
    is_content = (r >= 1) & (r <= dcfg.max_sent_length) & (sent < 10)
    return jnp.where(
        is_content & (tokens != SPECIAL.pad_id), type_id, 0
    ).astype(jnp.int32)


def infer_scheme_type_ids(positions: jnp.ndarray, tokens: jnp.ndarray, dcfg: DataConfig):
    """The divergent per-sentence scheme the reference rebuilds at
    inference (``model.py:296-306``): sentence s → s+1 (s<10), START/EOS
    slots and PAD → 0."""
    frame = dcfg.sent_frame_length
    r = positions % frame
    sent = positions // frame
    max_sent_num = dcfg.max_seq_length // frame + 1  # 11 (model.py:296)
    type_id = jnp.where(sent < max_sent_num - 1, sent + 1, 1)
    is_inner = (r != 0) & (r != frame - 1)
    return jnp.where(
        is_inner & (tokens != SPECIAL.pad_id), type_id, 0
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Full forwards
# ---------------------------------------------------------------------------


def mmtg_forward_train(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    compute_lm_loss: bool = False,
    remat: bool = False,
    attn_impl: str = "xla",
    remat_policy: str = "full",
    lm_head: bool = True,
    pp=None,
) -> MMTGOutput:
    """Teacher-forced forward (reference ``MMTG.forward`` with
    ``train_flag=True`` — ``model.py:356-400`` + decoder train branch
    ``model.py:270-288``).

    ``batch`` uses the reference key names (``MyDataset.py:47-57``).
    Returns logits over [topic prompt | targets] plus the per-sample
    alpha-attention KL; ``lm_loss`` is the HF-internal shifted CE the
    reference computes and the trainer discards (``train.py:188``) —
    computed only on request for parity tests.
    """
    enc_key = dec_key = None
    if not deterministic and dropout_rng is not None:
        enc_key, dec_key = jax.random.split(dropout_rng)

    fused, kl = encode_experiences(
        params,
        mcfg,
        batch["topic_emb"],
        batch["img_embs"],
        batch["r_embs"],
        dropout_key=enc_key,
    )
    embeds = decoder_input_embeds(
        params, const["wenlan_table"], dcfg, fused, batch["topic_ids"], batch["targets"]
    )
    type_ids = jnp.concatenate([batch["tpw_type_ids"], batch["type_ids"]], axis=1)
    attn_mask = jnp.concatenate(
        [batch["tpw_attention_mask"], batch["attention_mask"]], axis=1
    )
    B, L, _ = embeds.shape
    positions = jnp.arange(L)[None, :]
    out, _ = gpt2_forward(
        params["gpt2"],
        mcfg.gpt2,
        embeds,
        positions,
        type_ids,
        attn_mask,
        dropout_rng=dec_key,
        deterministic=deterministic,
        remat=remat,
        attn_impl=attn_impl,
        remat_policy=remat_policy,
        lm_head=lm_head,
        pp=pp,
    )
    if not lm_head:
        # hidden states for the chunked LM loss (loss.py): the full
        # [B, L, V] logits are never materialized.
        return MMTGOutput(logits=None, kl_per_sample=kl, lm_loss=None, hidden=out)
    logits = out

    lm_loss = None
    if compute_lm_loss:
        labels = jnp.concatenate([batch["topic_ids"], batch["targets"]], axis=1)
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, shift_labels[..., None].astype(jnp.int32), -1)
        lm_loss = jnp.mean(nll)

    return MMTGOutput(logits=logits, kl_per_sample=kl, lm_loss=lm_loss)


def mmtg_forward_train_packed(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    pbatch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    remat: bool = False,
    attn_impl: str = "xla",
    remat_policy: str = "full",
    lm_head: bool = True,
) -> MMTGOutput:
    """Teacher-forced forward over PACKED rows (``mmtg_tpu.pack``).

    The encoder half runs per sample SLOT (``[R, S, ...]`` experience
    arrays, flattened to ``R·S`` encoder rows — empty slots produce
    garbage that ``slot_valid`` masks out of the loss); only the GPT-2
    decoder runs on the packed token rows, with original-grid position
    ids, data-provided type ids, per-token fused-window gathers and
    segment-masked attention. Explicitly NON-parity (see pack.py's
    token-accounting contract); the parity path is
    :func:`mmtg_forward_train`.
    """
    enc_key = dec_key = None
    if not deterministic and dropout_rng is not None:
        enc_key, dec_key = jax.random.split(dropout_rng)

    R, S, E = pbatch["topic_emb"].shape
    flat = lambda x: x.reshape((R * S,) + x.shape[2:])
    fused, kl = encode_experiences(
        params,
        mcfg,
        flat(pbatch["topic_emb"]),
        flat(pbatch["img_embs"]),
        flat(pbatch["r_embs"]),
        dropout_key=enc_key,
    )  # fused [R·S, W, E], kl [R·S]
    W = fused.shape[1]
    fused = fused.reshape(R, S, W, E)

    tokens = pbatch["tokens"]
    token_wl = wenlan_embed(const["wenlan_table"], tokens)  # [R, L, E]
    seg = pbatch["seg"]
    win = pbatch["win"]
    valid = (seg < S) & (win < W)
    slot_c = jnp.minimum(seg, S - 1)
    win_c = jnp.minimum(win, W - 1)
    gathered = fused[jnp.arange(R)[:, None], slot_c, win_c]  # [R, L, E]
    token_wl = token_wl + jnp.where(valid[..., None], gathered, 0.0)
    embeds = project_to_gpt2(params, token_wl)

    out, _ = gpt2_forward(
        params["gpt2"],
        mcfg.gpt2,
        embeds,
        pbatch["positions"],
        pbatch["type_ids"],
        attention_mask=None,
        dropout_rng=dec_key,
        deterministic=deterministic,
        remat=remat,
        attn_impl=attn_impl,
        remat_policy=remat_policy,
        lm_head=lm_head,
        segment_ids=seg,
    )
    kl = kl.reshape(R, S)
    if not lm_head:
        return MMTGOutput(logits=None, kl_per_sample=kl, lm_loss=None,
                          hidden=out)
    return MMTGOutput(logits=out, kl_per_sample=kl, lm_loss=None)


def mmtg_forward_infer(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    batch: Dict[str, jnp.ndarray],
    type_id_scheme: str = "train",
) -> MMTGOutput:
    """Non-cached inference forward over a (possibly partial) target prefix
    (reference decoder inference branch, ``model.py:291-326``).

    Unlike the reference — which rebuilds type ids and the attention mask
    per position in Python using *batch element 0's* tokens
    (``model.py:305``, ``:311``) — masks and type ids are computed
    vectorized and per-row. With batch 1 (the only case the reference
    supports) the results agree exactly.
    """
    fused, kl = encode_experiences(
        params,
        mcfg,
        batch["topic_emb"],
        batch["img_embs"],
        batch["r_embs"],
    )
    targets = batch["targets"]
    embeds = decoder_input_embeds(
        params, const["wenlan_table"], dcfg, fused, batch["topic_ids"], targets
    )
    scheme = infer_scheme_type_ids if type_id_scheme == "reference_infer" else train_scheme_type_ids
    positions = jnp.arange(targets.shape[1])[None, :]
    tgt_types = scheme(positions, targets, dcfg)
    tgt_mask = (targets != SPECIAL.pad_id).astype(jnp.int32)
    type_ids = jnp.concatenate([batch["tpw_type_ids"], tgt_types], axis=1)
    attn_mask = jnp.concatenate([batch["tpw_attention_mask"], tgt_mask], axis=1)
    L = embeds.shape[1]
    logits, _ = gpt2_forward(
        params["gpt2"],
        mcfg.gpt2,
        embeds,
        jnp.arange(L)[None, :],
        type_ids,
        attn_mask,
        deterministic=True,
    )
    return MMTGOutput(logits=logits, kl_per_sample=kl, lm_loss=None)
