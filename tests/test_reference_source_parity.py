"""Logits parity against the reference's OWN code, not a reconstruction.

Imports ``/root/reference/src/model.py`` verbatim (``mmtg_tpu.ref_source``
stubs only its network/pkl/json I/O), loads an
``export_reference_state_dict`` checkpoint into the real ``MMTG`` class,
and diffs both forward branches against ours. This is the strongest form
of the parity claim: the oracle here is the reference implementation
itself (``model.py:330-400``), so a shared misreading between our code and
a rebuilt oracle cannot hide.

The config is as small as the reference source permits: ``model.py``
hardcodes ``out_linear→2048`` (``:179``), projector ``2048→512→768``
(``:216-218``) and 5-step alpha priors (``:117``), so wenlan/fusion dims
and ``n_embd`` stay full-size while vocab (200), GPT-2 depth (1 layer) and
channel widths (32) shrink. Full-size: ``scripts/parity_check.py
--oracle reference-src``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from mmtg_tpu import ref_source
from mmtg_tpu.configs import ChannelConfig, DataConfig, GPT2Config, ModelConfig
from mmtg_tpu.models.mmtg import (
    init_mmtg_params,
    mmtg_forward_infer,
    mmtg_forward_train,
)

pytestmark = pytest.mark.skipif(
    not ref_source.reference_available(),
    reason="reference source mount or torch unavailable",
)


@pytest.fixture(scope="module")
def ref_min_cfg():
    """Smallest config the reference source can run (see module docstring)."""
    return ModelConfig(
        seq_len=5,
        topic=ChannelConfig(input_dim=2048, hidden_dim=32, type="MLP"),
        image=ChannelConfig(input_dim=2048, hidden_dim=32, type="GRU"),
        text=ChannelConfig(input_dim=2048, hidden_dim=32, type="GRU"),
        self_att_hidden_size=32,
        self_att_heads=4,
        mm_att_out_dim=2048,
        gpt2=GPT2Config(
            vocab_size=200, n_positions=256, n_ctx=250, n_embd=768,
            n_layer=1, n_head=4,
        ),
    )


@pytest.fixture(scope="module")
def ref_setup(ref_min_cfg, tokenizer):
    """(params, const, batch, reference model with our weights loaded)."""
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    mcfg, dcfg = ref_min_cfg, DataConfig()
    rng = np.random.default_rng(7)
    records = make_synthetic_records(2, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=2))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    table = rng.standard_normal((V, dcfg.wenlan_emb_size)).astype(np.float32)

    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    model = ref_source.build_reference_mmtg(mcfg, dcfg, table,
                                            train_branch=True)
    ref_source.load_params_into_reference(model, params, mcfg)
    const = {"wenlan_table": jnp.asarray(table)}
    return params, const, dcfg, batch, table, model


def test_train_branch_matches_reference_source(ref_min_cfg, ref_setup):
    """Teacher-forced train branch (reference ``model.py:270-288``)."""
    params, const, dcfg, batch, _, model = ref_setup
    model.train_flag = True
    ref_logits, ref_kl, _ = ref_source.reference_forward(model, batch)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out = mmtg_forward_train(params, const, ref_min_cfg, dcfg, jb,
                             deterministic=True)
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, atol=5e-4)
    np.testing.assert_allclose(float(out.kl_per_sample.mean()), ref_kl,
                               rtol=1e-4)


def test_infer_branch_matches_reference_source(ref_min_cfg, ref_setup):
    """Divergent inference branch (reference ``model.py:291-326``) on a
    mid-generation prefix, batch 1 (the element-0 peek at ``:305``)."""
    params, const, dcfg, batch, _, model = ref_setup
    model.train_flag = False
    b1 = {k: np.asarray(v)[:1] for k, v in batch.items()}
    K = 55  # 2.5 sentence frames: covers window boundaries + PAD runs
    prefix = np.asarray(b1["targets"])[:, :K].copy()
    prefix[:, 0] = 1  # generation seeds with [#START#] (generate.py:208-210)
    ref_logits, _, _ = ref_source.reference_forward(model, b1, targets=prefix)

    jb = {k: jnp.asarray(v) for k, v in b1.items()}
    jb["targets"] = jnp.asarray(prefix)
    out = mmtg_forward_infer(params, const, ref_min_cfg, dcfg, jb,
                             type_id_scheme="reference_infer")
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, atol=5e-4)


def test_roundtrip_through_reference_state_dict(ref_min_cfg, ref_setup):
    """export → reference class → state_dict() → import returns the exact
    same pytree (the bridge is lossless through the real module tree)."""
    from mmtg_tpu.checkpoint import import_reference_state_dict

    params, _, _, _, _, model = ref_setup
    back = import_reference_state_dict(model.state_dict(), ref_min_cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b), atol=1e-6
        )
