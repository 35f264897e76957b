"""End-to-end logits parity: our MMTG forward vs a torch+HF oracle.

The oracle reconstructs the reference's computation (multi-channel GRU
encoder → 3×LayerNorm → alpha attention with Gaussian-prior KL → beta
attention → WenLan-space token embedding + fused-window addition →
projector → HF GPT2LMHeadModel; reference ``model.py:356-400`` and
``:225-288``) using torch/HF primitives with reference-named parameters,
so ``import_reference_state_dict`` is exercised exactly as it would be on
a real ``mmtg_ckpt.pth`` (the BASELINE.md bit-faithful-logits target,
with random weights standing in for the unreleased checkpoint).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.checkpoint import import_reference_state_dict, strip_prefix
from mmtg_tpu.models.mmtg import mmtg_forward_train

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# oracle lives in the package so scripts/parity_check.py shares it
from mmtg_tpu.oracle import build_oracle, oracle_forward


def test_full_forward_parity(tiny_model_cfg, tiny_data_cfg, tokenizer, rng):
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    mcfg, dcfg = tiny_model_cfg, tiny_data_cfg
    oracle = build_oracle(mcfg)

    records = make_synthetic_records(3, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=3))
    # clamp token ids into the tiny vocab
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)

    wenlan_table = rng.standard_normal((V, dcfg.wenlan_emb_size)).astype(np.float32)

    with torch.no_grad():
        ref_logits, ref_kl = oracle_forward(
            oracle, mcfg, dcfg, batch, wenlan_table, mcfg.self_att_heads
        )

    params = import_reference_state_dict(oracle.state_dict(), mcfg)
    const = {"wenlan_table": jnp.asarray(wenlan_table)}
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out = mmtg_forward_train(params, const, mcfg, dcfg, jb, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        float(out.kl_per_sample.mean()), float(ref_kl), rtol=1e-4
    )


def test_dataparallel_prefix_strip():
    state = {"module.encoder.topic_fc.weight": np.zeros((2, 2))}
    assert "encoder.topic_fc.weight" in strip_prefix(state)


def test_load_reference_checkpoint_file(tmp_path, tiny_model_cfg):
    """Full .pth round trip: torch.save a reference-format checkpoint
    ({'model': DataParallel-prefixed state dict, 'args', 'model_cfgs'},
    train.py:212) → load_reference_checkpoint → same pytree as the direct
    importer."""
    from mmtg_tpu.checkpoint import (
        import_reference_state_dict,
        load_reference_checkpoint,
    )

    oracle = build_oracle(tiny_model_cfg)
    sd = oracle.state_dict()
    wrapped = {"module." + k: v for k, v in sd.items()}
    path = tmp_path / "mmtg_ckpt.pth"
    torch.save({"model": wrapped, "args": {"lr": 1e-5}, "model_cfgs": {}}, path)

    via_file = load_reference_checkpoint(str(path), tiny_model_cfg)
    direct = import_reference_state_dict(sd, tiny_model_cfg)
    import jax

    for a, b in zip(jax.tree.leaves(via_file), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_infer_branch_parity(tiny_model_cfg, tiny_data_cfg, tokenizer, rng):
    """Our vectorized inference forward vs a literal torch rebuild of the
    reference's divergent inference branch (model.py:291-326) — batch 1,
    the only case the reference's element-0 mask/type peek supports."""
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records
    from mmtg_tpu.models.mmtg import mmtg_forward_infer
    from mmtg_tpu.oracle import oracle_forward_infer

    mcfg, dcfg = tiny_model_cfg, tiny_data_cfg
    oracle = build_oracle(mcfg)
    records = make_synthetic_records(1, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=1))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    wenlan_table = rng.standard_normal((V, dcfg.wenlan_emb_size)).astype(np.float32)
    params = import_reference_state_dict(oracle.state_dict(), mcfg)
    const = {"wenlan_table": jnp.asarray(wenlan_table)}

    # a mid-generation partial prefix (2.5 sentences) incl. PAD tokens,
    # starting with [#START#] like the sampler's seed (generate.py:208-210)
    K = 55
    prefix = np.asarray(batch["targets"])[:, :K].copy()
    prefix[:, 0] = 1
    with torch.no_grad():
        ref = oracle_forward_infer(oracle, mcfg, dcfg, batch, wenlan_table,
                                   prefix)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jb["targets"] = jnp.asarray(prefix)
    out = mmtg_forward_infer(params, const, mcfg, dcfg, jb,
                             type_id_scheme="reference_infer")
    np.testing.assert_allclose(
        np.asarray(out.logits), ref.numpy(), atol=5e-4
    )


def test_cached_decode_step_parity(tiny_model_cfg, tiny_data_cfg, tokenizer, rng):
    """One KV-cached decode step == the reference's full re-forward of the
    growing prefix, at EVERY prefix length: our step-j logits must match
    the torch inference-branch oracle's last-position logits for the
    prefix tokens[:, :j+1] (generate.py:117-124 cost center)."""
    from mmtg_tpu.configs import GenerateConfig
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records
    from mmtg_tpu.decoding import teacher_forced_decode_logits
    from mmtg_tpu.oracle import oracle_forward_infer

    mcfg, dcfg = tiny_model_cfg, tiny_data_cfg
    oracle = build_oracle(mcfg)
    records = make_synthetic_records(1, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=1))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    wenlan_table = rng.standard_normal((V, dcfg.wenlan_emb_size)).astype(np.float32)
    params = import_reference_state_dict(oracle.state_dict(), mcfg)
    const = {"wenlan_table": jnp.asarray(wenlan_table)}

    K = 26  # one full sentence frame + into the second (covers a window
    #         boundary at 22 and PAD positions)
    tokens = np.asarray(batch["targets"])[:, :K].copy()
    tokens[:, 0] = 1
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    gcfg = GenerateConfig(type_id_scheme="reference_infer", attn_impl="xla")
    ours = np.asarray(teacher_forced_decode_logits(
        params, const, mcfg, dcfg, gcfg, jb, jnp.asarray(tokens)
    ))  # [1, K, V]

    with torch.no_grad():
        for j in range(0, K, 5):
            ref = oracle_forward_infer(
                oracle, mcfg, dcfg, batch, wenlan_table, tokens[:, : j + 1]
            )
            np.testing.assert_allclose(
                ours[:, j], ref[:, -1].numpy(), atol=5e-4,
                err_msg=f"prefix length {j + 1}",
            )
