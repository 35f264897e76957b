"""Reference .pth EXPORT (checkpoint.export_reference_state_dict): the
inverse bridge. A pytree trained here must load into the reference-shaped
torch model (our oracle shares its exact state-dict layout) and produce
identical logits; import(export(params)) must be the identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from mmtg_tpu.checkpoint import (
    export_reference_state_dict,
    import_reference_state_dict,
    load_reference_checkpoint,
    save_reference_checkpoint,
)
from mmtg_tpu.models.mmtg import init_mmtg_params, mmtg_forward_train
from mmtg_tpu.oracle import build_oracle, oracle_forward


@pytest.fixture(scope="module")
def params(request):
    mcfg = request.getfixturevalue("tiny_model_cfg")
    return init_mmtg_params(jax.random.PRNGKey(13), mcfg)


def test_loads_into_reference_model(params, tiny_model_cfg):
    sd = export_reference_state_dict(params, tiny_model_cfg)
    oracle = build_oracle(tiny_model_cfg)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    # only HF's regenerated attention-mask buffers may be absent
    missing = [
        k for k in missing
        if not k.endswith((".attn.bias", ".attn.masked_bias"))
    ]
    assert missing == [], missing
    assert unexpected == [], unexpected


def test_import_export_roundtrip_identity(params, tiny_model_cfg):
    sd = export_reference_state_dict(params, tiny_model_cfg)
    back = import_reference_state_dict(sd, tiny_model_cfg)
    ref_leaves = jax.tree_util.tree_leaves_with_path(params)
    back_leaves = jax.tree_util.tree_leaves_with_path(back)
    assert len(ref_leaves) == len(back_leaves)
    for (pa, a), (pb, b) in zip(ref_leaves, back_leaves):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
            err_msg=str(pa),
        )


def test_exported_forward_matches(params, tiny_model_cfg, tiny_data_cfg,
                                  tokenizer, rng):
    """The reference-side model loaded from the EXPORT produces the same
    teacher-forced logits as this framework's forward — a user can train
    here and serve on the reference code."""
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    mcfg, dcfg = tiny_model_cfg, tiny_data_cfg
    oracle = build_oracle(mcfg)
    oracle.load_state_dict(export_reference_state_dict(params, mcfg),
                           strict=False)

    records = make_synthetic_records(3, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=3))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    wenlan_table = rng.standard_normal((V, dcfg.wenlan_emb_size)).astype(
        np.float32
    )

    with torch.no_grad():
        ref_logits, ref_kl = oracle_forward(
            oracle, mcfg, dcfg, batch, wenlan_table, mcfg.self_att_heads
        )
    const = {"wenlan_table": jnp.asarray(wenlan_table)}
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out = mmtg_forward_train(params, const, mcfg, dcfg, jb, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        float(out.kl_per_sample.mean()), float(ref_kl), rtol=1e-4
    )


def test_pth_file_roundtrip(params, tiny_model_cfg, tmp_path):
    """save_reference_checkpoint writes the reference's on-disk format
    ({'model': module.-prefixed sd, 'args', 'model_cfgs'},
    reference train.py:212-213) and our own loader reads it back."""
    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(path, params, tiny_model_cfg)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert set(raw) == {"model", "args", "model_cfgs"}
    assert all(k.startswith("module.") for k in raw["model"])
    back = load_reference_checkpoint(path, tiny_model_cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
