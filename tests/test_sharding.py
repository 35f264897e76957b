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


def test_regroup_qkv_head_aligned():
    """After regrouping, a contiguous last-dim split hands shard s exactly
    [q_heads(s) | k_heads(s) | v_heads(s)]."""
    from mmtg_tpu.parallel.mesh import regroup_qkv_for_tp

    L, D, H, hd, S = 2, 8, 4, 2, 2
    rng = np.random.default_rng(0)
    w = rng.standard_normal((L, D, 3 * H * hd)).astype(np.float32)
    b = rng.standard_normal((L, 3 * H * hd)).astype(np.float32)
    w2, b2 = regroup_qkv_for_tp(jnp.asarray(w), jnp.asarray(b), H, hd, S)
    w2, b2 = np.asarray(w2), np.asarray(b2)
    Hl = H // S
    width = 3 * Hl * hd
    for s in range(S):
        local = w2[..., s * width : (s + 1) * width]
        q = w[..., 0 * H * hd + s * Hl * hd : 0 * H * hd + (s + 1) * Hl * hd]
        k = w[..., 1 * H * hd + s * Hl * hd : 1 * H * hd + (s + 1) * Hl * hd]
        v = w[..., 2 * H * hd + s * Hl * hd : 2 * H * hd + (s + 1) * Hl * hd]
        np.testing.assert_array_equal(local, np.concatenate([q, k, v], axis=-1))
        bl = b2[..., s * width : (s + 1) * width]
        bq = b[..., 0 * H * hd + s * Hl * hd : 0 * H * hd + (s + 1) * Hl * hd]
        bk = b[..., 1 * H * hd + s * Hl * hd : 1 * H * hd + (s + 1) * Hl * hd]
        bv = b[..., 2 * H * hd + s * Hl * hd : 2 * H * hd + (s + 1) * Hl * hd]
        np.testing.assert_array_equal(bl, np.concatenate([bq, bk, bv], axis=-1))


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_dp_decode(setup, tp):
    """Tensor-parallel decode on a (2, tp) mesh produces the SAME tokens
    as the DP-only (2, 1) decode: the psum-reassembled logits match to
    f32 rounding and the per-data-shard RNG streams are identical
    (VERDICT r01 item 4 / BASELINE 'saturating a v4-8')."""
    from mmtg_tpu.configs import GenerateConfig
    from mmtg_tpu.decoding import generate_sharded

    mcfg, dcfg, batch, const = setup
    gen_batch = {
        k: v
        for k, v in batch.items()
        if k in ("topic_ids", "tpw_attention_mask", "tpw_type_ids",
                 "topic_emb", "img_embs", "r_embs")
    }
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    gcfg = GenerateConfig(length=46, top_k=5, top_p=0.7, temperature=1.1,
                          repetition_penalty=1.5, attn_impl="xla")
    rng = jax.random.PRNGKey(13)

    mesh_dp = make_mesh((2, 1))
    with mesh_dp:
        ref = np.asarray(generate_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch, rng, mesh_dp))

    mesh_tp = make_mesh((2, tp))
    with mesh_tp:
        out = np.asarray(generate_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch, rng, mesh_tp))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("tp", [2])
def test_tp_decode_int8_cache(setup, tp):
    """TP decode with the int8-quantized (head-sharded) KV cache keeps the
    frame grid. NOTE: token-level equality with the DP int8 decode is NOT
    asserted — the per-row cache scales abs-max over the LOCAL head shard,
    so int8-cached TP decode is numerics-variant per mesh shape; this is
    why `cache_dtype='auto'` resolves every sharded run to full precision
    (decoding.resolve_cache_dtype)."""
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
    gcfg = GenerateConfig(length=24, top_k=5, attn_impl="xla",
                          cache_dtype="int8")
    rng = jax.random.PRNGKey(17)
    mesh_tp = make_mesh((2, tp))
    with mesh_tp:
        out = np.asarray(generate_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch, rng, mesh_tp))
    SP = SpecialTokens()
    assert out.shape == (8, 25)
    assert (out[:, 0] == SP.start_id).all()
    assert (out[:, 21] == SP.eos_id).all()


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


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2), (2, 4)])
def test_stream_sharded_matches_oneshot_and_single_device(setup, mesh_shape):
    """generate_stream_sharded is bit-identical to generate_sharded on the
    same mesh AND (with row_seeds) to the single-device generate — the
    decode state round-trips the chunk boundary sharded without changing
    a token, on DP, balanced DP×TP, and TP-heavy meshes."""
    from mmtg_tpu.configs import GenerateConfig
    from mmtg_tpu.decoding import (
        generate,
        generate_sharded,
        generate_stream_sharded,
    )

    mcfg, dcfg, batch, const = setup
    gen_batch = {
        k: v
        for k, v in batch.items()
        if k in ("topic_ids", "tpw_attention_mask", "tpw_type_ids",
                 "topic_emb", "img_embs", "r_embs")
    }
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg)
    gcfg = GenerateConfig(length=46, top_k=5, attn_impl="xla")
    key = jax.random.PRNGKey(3)
    seeds = jnp.arange(8, dtype=jnp.int32) * 5 + 2
    single = np.asarray(
        generate(params, const, mcfg, dcfg, gcfg, gen_batch, key,
                 row_seeds=seeds)
    )
    mesh = make_mesh(mesh_shape)
    with mesh:
        oneshot = np.asarray(generate_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch, key, mesh,
            row_seeds=seeds,
        ))
        blocks = [np.asarray(t) for t in generate_stream_sharded(
            params, const, mcfg, dcfg, gcfg, gen_batch, key, mesh,
            row_seeds=seeds,
        )]
    assert len(blocks) > 1  # streamed in sentence-frame chunks
    streamed = np.concatenate(blocks, axis=1)
    np.testing.assert_array_equal(streamed, oneshot[:, 1:])
    np.testing.assert_array_equal(streamed, single[:, 1:])


def test_dp_gradients_match_single_device(setup):
    """The DP-sharded loss gradient equals the single-device gradient at
    f32 tolerance: sharding must change WHERE the math runs, never what
    it computes (the reference's DataParallel gives the same guarantee
    implicitly via gather/scatter — train.py:112-114)."""
    from mmtg_tpu.train import loss_and_metrics

    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig(alpha=0.2)
    params = init_mmtg_params(jax.random.PRNGKey(3), mcfg)
    batch = dict(batch, sample_mask=jnp.ones((batch["targets"].shape[0],)))
    drng = jax.random.PRNGKey(9)

    def loss_fn(p, const, batch):
        # eval_mode=True: dropout off, so single-device and sharded runs
        # see identical masks regardless of how PRNG lowering shards
        out, _ = loss_and_metrics(
            p, const, mcfg, dcfg, tcfg, batch, jnp.asarray(2), drng, True
        )
        return out

    ref_grads = jax.grad(loss_fn)(params, const, batch)

    mesh = make_mesh((8, 1))
    with mesh:
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)
        sc = {"wenlan_table": jax.device_put(const["wenlan_table"])}
        dp_grads = jax.jit(jax.grad(loss_fn))(sp, sc, sb)

    flat_ref, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_dp, _ = jax.tree_util.tree_flatten(dp_grads)
    assert len(flat_ref) == len(flat_dp)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )
