"""Multi-device sharding: DP and DP×TP meshes on the 8-device CPU fixture
(SURVEY.md §4: jax makes multi-device CI native via
--xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import TrainConfig
from mmtg_tpu.models.mmtg import init_mmtg_params, mmtg_forward_train
from mmtg_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from mmtg_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup(request):
    mcfg = request.getfixturevalue("tiny_model_cfg")
    dcfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    rng = np.random.default_rng(6)
    records = make_synthetic_records(8, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=8))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    table = jax.random.normal(jax.random.PRNGKey(8), (V, dcfg.wenlan_emb_size))
    return mcfg, dcfg, jb, {"wenlan_table": table}


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single_device(setup, mesh_shape):
    mcfg, dcfg, batch, const = setup
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    ref = mmtg_forward_train(params, const, mcfg, dcfg, batch)

    mesh = make_mesh(mesh_shape)
    with mesh:
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)
        sc = {"wenlan_table": jax.device_put(const["wenlan_table"])}
        out = mmtg_forward_train(sp, sc, mcfg, dcfg, sb)
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(ref.logits), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.kl_per_sample), np.asarray(ref.kl_per_sample), rtol=2e-4
    )


def test_dp_train_step_runs_sharded(setup):
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig(lr=1e-3)
    mesh = make_mesh((8, 1))
    with mesh:
        state, tx = create_train_state(
            jax.random.PRNGKey(1), mcfg, tcfg, warmup_steps=1, total_steps=10
        )
        state = state._replace(params=shard_params(state.params, mesh))
        sb = shard_batch(batch, mesh)
        train_step = make_train_step(mcfg, dcfg, tcfg, tx)
        state, metrics = train_step(state, const, sb, jnp.asarray(3))
        state, metrics2 = train_step(state, const, sb, jnp.asarray(3))
    assert np.isfinite(float(metrics2["total"]))
    assert int(state.step) == 2


def test_tp_spec_tree_covers_params(setup):
    mcfg, *_ = setup
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    mesh = make_mesh((2, 4))
    specs = param_shardings(params, mesh)
    p_leaves = jax.tree.leaves(params)
    s_leaves = jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding)
    )
    assert len(p_leaves) == len(s_leaves)
    # TP axis actually divides the GPT-2 QKV projection
    qkv_spec = specs["gpt2"]["h"]["attn_w"].spec
    assert qkv_spec == jax.sharding.PartitionSpec(None, None, "model")


def test_sharded_generation_on_mesh(setup):
    """DP generation via shard_map on the 8-device mesh: runs, keeps the
    sentence frame grid, and shards the output over the data axis."""
    from mmtg_tpu.configs import GenerateConfig, SpecialTokens
    from mmtg_tpu.decoding import generate_sharded

    mcfg, dcfg, batch, const = setup
    gen_batch = {
        k: v
        for k, v in batch.items()
        if k in ("topic_ids", "tpw_attention_mask", "tpw_type_ids",
                 "topic_emb", "img_embs", "r_embs")
    }
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    gcfg = GenerateConfig(length=24, top_k=5, attn_impl="xla")
    mesh = make_mesh((8, 1))
    with mesh:
        toks = generate_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch,
            jax.random.PRNGKey(3), mesh,
        )
    toks = np.asarray(toks)
    SP = SpecialTokens()
    assert toks.shape == (8, 25)
    assert (toks[:, 0] == SP.start_id).all()
    assert (toks[:, 21] == SP.eos_id).all()
    assert (toks[:, 22] == SP.start_id).all()
    # shards sample independently (different rows differ)
    assert len({tuple(r) for r in toks.tolist()}) > 1
