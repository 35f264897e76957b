"""``--gpt2_ckpt`` with a raw HF ``GPT2LMHeadModel`` snapshot (VERDICT r03
missing #2): the reference bootstraps its decoder with
``GPT2LMHeadModel.from_pretrained("uer/gpt2-chinese-cluecorpussmall")``
(reference model.py:219); our trainer must accept a local snapshot of
that model — both serialization formats HF writes — plus a bare HF state
dict saved as a single ``.pth``."""

import dataclasses

import jax
import numpy as np
import pytest

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.mmtg import init_mmtg_params
from mmtg_tpu.train import load_gpt2_ckpt_into

TINY_HF = dict(vocab_size=200, n_positions=256, n_embd=48, n_layer=2,
               n_head=4)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    cfg = HFConfig(n_ctx=250, **TINY_HF)
    return GPT2LMHeadModel(cfg)


@pytest.fixture()
def tiny_cfg(tiny_model_cfg):
    return dataclasses.replace(
        tiny_model_cfg, gpt2=GPT2Config(n_ctx=250, **TINY_HF)
    )


def _assert_loaded(params, hf_model, mcfg):
    want = hf_model.transformer.wte.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params["gpt2"]["wte"]), want,
                               rtol=0, atol=0)
    want_fc = hf_model.transformer.h[1].mlp.c_fc.weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["gpt2"]["h"]["mlp_fc_w"][1]), want_fc)


@pytest.mark.parametrize("safe", [False, True])
def test_hf_snapshot_directory(tmp_path, hf_model, tiny_cfg, safe):
    """save_pretrained() layout, both pytorch_model.bin and
    model.safetensors serializations."""
    d = tmp_path / "hf_snapshot"
    hf_model.save_pretrained(str(d), safe_serialization=safe)
    params = init_mmtg_params(jax.random.PRNGKey(0), tiny_cfg)
    load_gpt2_ckpt_into(params, str(d), tiny_cfg, jax.random.PRNGKey(0))
    _assert_loaded(params, hf_model, tiny_cfg)


def test_hf_state_dict_file(tmp_path, hf_model, tiny_cfg):
    """A raw HF state dict torch.save'd as one file routes through
    import_hf_gpt2 (keys are transformer.-prefixed, not gpt2.-prefixed)."""
    import torch

    f = tmp_path / "hf_gpt2.pth"
    torch.save(hf_model.state_dict(), str(f))
    params = init_mmtg_params(jax.random.PRNGKey(0), tiny_cfg)
    load_gpt2_ckpt_into(params, str(f), tiny_cfg, jax.random.PRNGKey(0))
    _assert_loaded(params, hf_model, tiny_cfg)


def test_hf_snapshot_dim_mismatch_errors(tmp_path, hf_model, tiny_model_cfg):
    """A snapshot whose dims disagree with the model config fails fast
    with a message naming --model_config_json (not a shape error deep in
    init)."""
    d = tmp_path / "hf_snapshot"
    hf_model.save_pretrained(str(d), safe_serialization=False)
    # tiny_model_cfg's gpt2 is 200-vocab/48-wide like TINY_HF — perturb it
    mcfg = dataclasses.replace(
        tiny_model_cfg,
        gpt2=GPT2Config(vocab_size=300, n_positions=256, n_ctx=250,
                        n_embd=48, n_layer=2, n_head=4),
    )
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    with pytest.raises(ValueError, match="model_config_json"):
        load_gpt2_ckpt_into(params, str(d), mcfg, jax.random.PRNGKey(0))


def test_train_cli_bootstraps_from_hf_dir(tmp_path, hf_model, tiny_cfg,
                                          tiny_data_cfg,
                                          reference_vocab_path, rng):
    """End-to-end: mmtg_tpu.train --gpt2_ckpt <HF snapshot dir> trains.
    vocab ids in the synthetic data are clamped by the dataset to the
    200-token decoder, matching how the tiny CI configs run elsewhere."""
    import pickle

    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.train import main as train_main

    # the tiny decoder has vocab 200 < the 13317-token tokenizer, so use
    # a matching 13317-vocab HF snapshot for the e2e leg
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    hf_big = GPT2LMHeadModel(HFConfig(
        vocab_size=13317, n_positions=256, n_ctx=250, n_embd=48,
        n_layer=2, n_head=4))
    d = tmp_path / "hf_snapshot"
    hf_big.save_pretrained(str(d), safe_serialization=False)

    mcfg = dataclasses.replace(
        tiny_cfg,
        gpt2=GPT2Config(vocab_size=13317, n_positions=256, n_ctx=250,
                        n_embd=48, n_layer=2, n_head=4),
    )
    records = make_synthetic_records(8, rng,
                                     emb_size=tiny_data_cfg.wenlan_emb_size)
    train_pkl = tmp_path / "train.pkl"
    with open(train_pkl, "wb") as f:
        pickle.dump(records, f)
    emb_pkl = tmp_path / "emb.pkl"
    table = {i: rng.standard_normal(
        tiny_data_cfg.wenlan_emb_size).astype("float32")
        for i in range(13317)}
    with open(emb_pkl, "wb") as f:
        pickle.dump(table, f)

    val = train_main(
        [
            "--batch_size", "4", "--epochs", "1", "--lr", "1e-3",
            "--curriculums", "[0,0]", "--log_interval", "5",
            "--train_data_path", str(train_pkl),
            "--val_data_path", str(train_pkl),
            "--vocab_path", reference_vocab_path,
            "--token_emb_path", str(emb_pkl),
            "--gpt2_ckpt", str(d),
            "--dtype", "float32",
            "--mesh_data", "1", "--mesh_model", "1",
        ],
        mcfg=mcfg, dcfg=tiny_data_cfg,
    )
    assert np.isfinite(val)
