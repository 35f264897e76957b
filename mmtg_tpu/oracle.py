"""Torch/HF oracle of the reference MMTG forward (teacher-forced branch).

Reconstructs the reference's computation with torch/HF primitives and
reference-named parameters (multi-channel GRU encoder → 3×LayerNorm →
alpha attention with Gaussian-prior KL → beta attention → WenLan-space
token embedding + fused-window addition → projector → HF GPT2LMHeadModel;
reference ``model.py:356-400`` and ``:225-288``). Used by the parity test
suite and the ``scripts/parity_check.py`` one-command harness for real
checkpoints. Requires the optional ``[torch]`` extra.
"""

from __future__ import annotations

import math


def build_oracle(mcfg):
    """torch module tree with the reference's state-dict key layout
    (so a reference ``mmtg_ckpt.pth`` state dict loads straight into it)."""
    import torch
    import transformers

    H = mcfg.topic.hidden_dim
    E = mcfg.topic.input_dim
    nn = torch.nn

    class Alpha(nn.Module):
        def __init__(self):
            super().__init__()
            self.query = nn.Linear(H, H)
            self.key = nn.Linear(H, H)
            self.value = nn.Linear(H, H)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.topic_fc = nn.Linear(E, H)
            self.rnns_image = nn.GRU(E, H, num_layers=1)
            self.rnns_text = nn.GRU(E, H, num_layers=1)

    class MM(nn.Module):
        def __init__(self):
            super().__init__()
            self.att_matrices = nn.ModuleList(
                [nn.Linear(H, mcfg.mm_att_dim) for _ in range(mcfg.seq_len)]
            )
            self.out_linear = nn.Linear(H, mcfg.mm_att_out_dim)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.projector_layer1 = nn.Linear(mcfg.mm_att_out_dim, 512)
            self.projector_layer2 = nn.Linear(512, mcfg.gpt2.n_embd)
            self.gpt2 = transformers.GPT2LMHeadModel(
                transformers.GPT2Config(
                    vocab_size=mcfg.gpt2.vocab_size,
                    n_positions=mcfg.gpt2.n_positions,
                    n_embd=mcfg.gpt2.n_embd,
                    n_layer=mcfg.gpt2.n_layer,
                    n_head=mcfg.gpt2.n_head,
                    attn_implementation="eager",
                )
            )

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.ln_layer1 = nn.LayerNorm(H)
            self.ln_layer2 = nn.LayerNorm(H)
            self.ln_layer3 = nn.LayerNorm(H)
            self.img_inner_atten_layer = Alpha()
            self.text_inner_atten_layer = Alpha()
            self.mm_atten_layer = MM()
            self.decoder = Dec()

    torch.manual_seed(0)
    return Oracle().eval()


def oracle_forward(oracle, mcfg, dcfg, batch, wenlan_table, heads):
    """Reference-semantics forward in torch (teacher-forced branch).
    Returns ``(logits, kl)``."""
    import torch

    t = lambda k, dt=torch.float32: torch.tensor(batch[k]).to(dt)
    topic = t("topic_emb")
    img = t("img_embs").transpose(0, 1)  # [T, B, E]
    txt = t("r_embs").transpose(0, 1)

    topic_o = oracle.ln_layer1(oracle.encoder.topic_fc(topic).unsqueeze(0))
    img_o = oracle.ln_layer2(oracle.encoder.rnns_image(img)[0])
    txt_o = oracle.ln_layer3(oracle.encoder.rnns_text(txt)[0])

    def alpha(layer, x):  # x: [B, T, H]
        B, T, H = x.shape
        hd = H // heads
        rs = lambda v: v.view(B, T, heads, hd).permute(0, 2, 1, 3)
        q, k, v = rs(layer.query(x)), rs(layer.key(x)), rs(layer.value(x))
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        from mmtg_tpu.models.attention import gaussian_step_priors

        prior = torch.tensor(gaussian_step_priors(T))
        kl = 0.0
        for i in range(T):
            pi = prior[i]
            kl = kl + (pi * (pi.log() - probs[:, :, i, :].log())).sum() / B
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, T, H)
        return ctx, kl / T

    img_ctx, img_kl = alpha(oracle.img_inner_atten_layer, img_o.transpose(0, 1))
    txt_ctx, txt_kl = alpha(oracle.text_inner_atten_layer, txt_o.transpose(0, 1))

    # beta attention, literal per-step loop (model.py:191-200)
    B = topic.shape[0]
    fused = torch.zeros(mcfg.seq_len, B, mcfg.mm_att_out_dim)
    tp = topic_o.transpose(0, 1)  # [B, 1, H]
    for i in range(mcfg.seq_len):
        lin = oracle.mm_atten_layer.att_matrices[i]
        stacked = torch.cat(
            [tp, img_ctx[:, i : i + 1], txt_ctx[:, i : i + 1]], dim=1
        )  # [B, 3, H]
        att = torch.softmax(lin(stacked).permute(0, 2, 1), dim=-1)  # [B, 1, 3]
        out = att @ stacked  # [B, 1, H]
        fused[i] = oracle.mm_atten_layer.out_linear(out)[:, 0]
    fused = fused.transpose(0, 1)  # [B, T, out_dim]

    # decoder embedding assembly (model.py:251-281)
    wl = torch.tensor(wenlan_table)
    topic_wl = wl[t("topic_ids", torch.long)]
    tgt_ids = t("targets", torch.long)
    tgt_wl = wl[tgt_ids].clone()
    win = dcfg.two_sents_length
    for k in range(mcfg.seq_len):
        tgt_wl[:, win * k : win * (k + 1)] += fused[:, k : k + 1]
    embs = torch.cat([topic_wl, tgt_wl], dim=1)
    gpt_in = oracle.decoder.projector_layer2(
        torch.tanh(oracle.decoder.projector_layer1(embs))
    )
    type_ids = torch.cat(
        [t("tpw_type_ids", torch.long), t("type_ids", torch.long)], dim=1
    )
    mask = torch.cat(
        [t("tpw_attention_mask", torch.long), t("attention_mask", torch.long)], dim=1
    )
    res = oracle.decoder.gpt2(
        inputs_embeds=gpt_in,
        token_type_ids=type_ids,
        attention_mask=mask,
        return_dict=True,
    )
    return res.logits, img_kl + txt_kl


def oracle_forward_infer(oracle, mcfg, dcfg, batch, wenlan_table, prefix_ids):
    """Reference-semantics INFERENCE branch in torch (``model.py:291-326``):
    the growing-prefix forward the reference runs once per decode token.
    Reproduces the literal per-position Python rebuild of type ids and the
    attention mask — including the reference's batch-element-0 peek
    (``input_ids[0][i]``, ``model.py:305,:311``) — so it is only
    meaningful at batch 1, exactly like the reference. Returns the full
    ``[B, P+K, V]`` logits over ``[topic | prefix_ids]``.

    ``prefix_ids``: ``[B, K]`` long tensor of generated-so-far target ids
    (position 0 = ``[#START#]``, reference ``generate.py:208-210``).
    """
    import torch

    t = lambda k, dt=torch.float32: torch.tensor(batch[k]).to(dt)
    topic = t("topic_emb")
    img = t("img_embs").transpose(0, 1)
    txt = t("r_embs").transpose(0, 1)
    heads = mcfg.self_att_heads

    topic_o = oracle.ln_layer1(oracle.encoder.topic_fc(topic).unsqueeze(0))
    img_o = oracle.ln_layer2(oracle.encoder.rnns_image(img)[0])
    txt_o = oracle.ln_layer3(oracle.encoder.rnns_text(txt)[0])

    def alpha_ctx(layer, x):
        B, T, H = x.shape
        hd = H // heads
        rs = lambda v: v.view(B, T, heads, hd).permute(0, 2, 1, 3)
        q, k, v = rs(layer.query(x)), rs(layer.key(x)), rs(layer.value(x))
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        return (probs @ v).permute(0, 2, 1, 3).reshape(B, T, H)

    img_ctx = alpha_ctx(oracle.img_inner_atten_layer, img_o.transpose(0, 1))
    txt_ctx = alpha_ctx(oracle.text_inner_atten_layer, txt_o.transpose(0, 1))

    B = topic.shape[0]
    fused = torch.zeros(mcfg.seq_len, B, mcfg.mm_att_out_dim)
    tp = topic_o.transpose(0, 1)
    for i in range(mcfg.seq_len):
        lin = oracle.mm_atten_layer.att_matrices[i]
        stacked = torch.cat(
            [tp, img_ctx[:, i : i + 1], txt_ctx[:, i : i + 1]], dim=1
        )
        att = torch.softmax(lin(stacked).permute(0, 2, 1), dim=-1)
        out = att @ stacked
        fused[i] = oracle.mm_atten_layer.out_linear(out)[:, 0]
    fused = fused.transpose(0, 1)  # [B, 5, out_dim]

    input_ids = torch.as_tensor(prefix_ids, dtype=torch.long)
    wl = torch.tensor(wenlan_table)
    topic_wl = wl[t("topic_ids", torch.long)]
    in_wl = wl[input_ids].clone()
    # fused-window addition over however much of the prefix exists
    # (model.py:263-268 — the add runs per 44-token window, partial tail
    # windows included)
    win = dcfg.two_sents_length
    K = input_ids.shape[1]
    for k in range(mcfg.seq_len):
        lo, hi = win * k, min(win * (k + 1), K)
        if lo >= K:
            break
        in_wl[:, lo:hi] += fused[:, k : k + 1]
    input_embs = torch.cat([topic_wl, in_wl], dim=1)

    # literal per-position type-id rebuild (model.py:296-306), incl. the
    # batch-element-0 peek
    _type_ids = t("tpw_type_ids", torch.long)
    sent_len = dcfg.max_sent_length + 2
    max_sent_num = dcfg.max_seq_length // sent_len + 1
    _type_ids_list = list(range(1, max_sent_num)) + [1]
    cols = [_type_ids]
    for i in range(K):
        if (i + 1) % sent_len == 0 or (i + 1) % sent_len == 1:
            cols.append(torch.zeros(B, 1, dtype=torch.long))
        else:
            v = 0 if int(input_ids[0][i]) == 0 else _type_ids_list[i // sent_len]
            cols.append(torch.full((B, 1), v, dtype=torch.long))
    _type_ids = torch.cat(cols, dim=1)

    # literal attention-mask rebuild (model.py:309-312), element-0 peek
    cols = [t("tpw_attention_mask", torch.long)]
    for i in range(K):
        v = 0 if int(input_ids[0][i]) == 0 else 1
        cols.append(torch.full((B, 1), v, dtype=torch.long))
    _attention_mask = torch.cat(cols, dim=1)

    gpt_in = oracle.decoder.projector_layer2(
        torch.tanh(oracle.decoder.projector_layer1(input_embs))
    )
    res = oracle.decoder.gpt2(
        inputs_embeds=gpt_in,
        token_type_ids=_type_ids,
        attention_mask=_attention_mask,
        return_dict=True,
    )
    return res.logits
