"""GPipe pipeline parallelism (`parallel.pipeline`): the stacked GPT-2
layer axis sharded over a `pipe` mesh axis, microbatched activations
streamed via ppermute.

The reference has no pipeline parallelism at all (its only parallelism
is `nn.DataParallel`, reference train.py:112-114); this is capability
surplus of the TPU rebuild. Correctness bar: the pipelined stack must be
numerically equal (f32 tolerance) to the single-program `lax.scan` over
the same layers — forward AND gradients — on DP×PP meshes, since
differentiating through the shard_map is how the reverse pipeline is
produced (no hand-written backward schedule to trust).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.gpt2 import gpt2_forward, init_gpt2_params
from mmtg_tpu.parallel.pipeline import (
    make_dp_pp_mesh,
    pipeline_stack,
    shard_params_pp,
)

CFG = GPT2Config(
    vocab_size=96, n_positions=32, n_ctx=32, n_embd=32, n_layer=4, n_head=4
)


@pytest.fixture(scope="module")
def setup():
    params = init_gpt2_params(jax.random.PRNGKey(0), CFG)
    B, T, D = 8, 12, CFG.n_embd
    key = jax.random.PRNGKey(1)
    embeds = jax.random.normal(key, (B, T, D)) * 0.1
    pos = jnp.arange(T, dtype=jnp.int32)
    type_ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32).at[0, -3:].set(0)
    return params, embeds, pos, type_ids, mask


def _fwd(params, embeds, pos, type_ids, mask, pp=None, **kw):
    return gpt2_forward(
        params,
        CFG,
        embeds,
        pos,
        token_type_ids=type_ids,
        attention_mask=mask,
        deterministic=True,
        pp=pp,
        **kw,
    )[0]


@pytest.mark.parametrize(
    "dp,pipe,n_micro", [(2, 4, 4), (4, 2, 2), (1, 4, 8), (2, 2, 2)]
)
def test_pipeline_forward_matches_scan(setup, dp, pipe, n_micro):
    params, embeds, pos, type_ids, mask = setup
    ref = _fwd(params, embeds, pos, type_ids, mask)

    mesh = make_dp_pp_mesh(dp, pipe)
    sp = shard_params_pp({"gpt2": params}, mesh)["gpt2"]
    out = jax.jit(
        lambda p, e: _fwd(p, e, pos, type_ids, mask, pp=(mesh, n_micro))
    )(sp, embeds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_forward_remat(setup):
    params, embeds, pos, type_ids, mask = setup
    ref = _fwd(params, embeds, pos, type_ids, mask)
    mesh = make_dp_pp_mesh(2, 4)
    out = jax.jit(
        lambda p, e: _fwd(
            p, e, pos, type_ids, mask, pp=(mesh, 4), remat=True
        )
    )(shard_params_pp({"gpt2": params}, mesh)["gpt2"], embeds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_grad_matches_scan(setup):
    """The reverse pipeline (transpose of ppermute + masked psum) must
    produce the same param gradients as the single-program scan."""
    params, embeds, pos, type_ids, mask = setup

    def loss(p, e, pp=None):
        logits = _fwd(p, e, pos, type_ids, mask, pp=pp)
        return jnp.sum(jnp.tanh(logits) * 1e-2)

    ref_l, ref_g = jax.value_and_grad(loss)(params, embeds)

    mesh = make_dp_pp_mesh(2, 4)
    sp = shard_params_pp({"gpt2": params}, mesh)["gpt2"]
    pp_l, pp_g = jax.jit(
        jax.value_and_grad(lambda p, e: loss(p, e, pp=(mesh, 4)))
    )(sp, embeds)

    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-5)
    flat_ref = jax.tree.leaves_with_path(ref_g)
    flat_pp = jax.tree.leaves(pp_g)
    assert len(flat_ref) == len(flat_pp)
    for (path, r), p in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(p),
            np.asarray(r),
            atol=3e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_dropout_deterministic_and_distinct(setup):
    """Dropout path: same seed → same output; the per-microbatch rng fold
    gives microbatches independent masks (output differs from the
    single-program draw, which is expected — shapes differ)."""
    params, embeds, pos, type_ids, mask = setup
    mesh = make_dp_pp_mesh(2, 4)
    sp = shard_params_pp({"gpt2": params}, mesh)["gpt2"]

    def fwd(seed):
        return gpt2_forward(
            sp,
            CFG,
            embeds,
            pos,
            token_type_ids=type_ids,
            attention_mask=mask,
            deterministic=False,
            dropout_rng=jax.random.PRNGKey(seed),
            pp=(mesh, 4),
        )[0]

    a = jax.jit(fwd)(0)
    b = jax.jit(fwd)(0)
    c = jax.jit(fwd)(7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_pipeline_rejects_return_kv(setup):
    params, embeds, pos, type_ids, mask = setup
    mesh = make_dp_pp_mesh(1, 4)
    with pytest.raises(ValueError, match="train-path only"):
        gpt2_forward(
            params,
            CFG,
            embeds,
            pos,
            token_type_ids=type_ids,
            attention_mask=mask,
            deterministic=True,
            return_kv=True,
            pp=(mesh, 2),
        )


def test_pipeline_layer_divisibility_error():
    from mmtg_tpu.parallel.pipeline import pp_param_shardings

    params = init_gpt2_params(
        jax.random.PRNGKey(0),
        GPT2Config(
            vocab_size=64, n_positions=16, n_ctx=16, n_embd=16, n_layer=3,
            n_head=2,
        ),
    )
    mesh = make_dp_pp_mesh(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        pp_param_shardings({"gpt2": params}, mesh)


# ---------------------------------------------------------------------------
# Full MMTG train/eval step under DP×PP
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mmtg_setup(request):
    """Tiny MMTG with n_layer=2 (divides pipe=2) + a synthetic batch."""
    from mmtg_tpu.configs import ChannelConfig, GPT2Config, ModelConfig
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    mcfg = request.getfixturevalue("tiny_model_cfg")
    dcfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    rng = np.random.default_rng(11)
    records = make_synthetic_records(8, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=8))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jb["sample_mask"] = jnp.ones((8,), jnp.float32)
    table = jax.random.normal(
        jax.random.PRNGKey(3), (V, dcfg.wenlan_emb_size)
    )
    return mcfg, dcfg, jb, {"wenlan_table": table}


def test_mmtg_train_step_pp(mmtg_setup):
    """Full train step (grad+AdamW) with the GPT-2 stack pipelined over
    (data=4, pipe=2): eval loss must EQUAL the unsharded eval loss
    (deterministic path — same numerics, just scheduled differently),
    and a train step must move the params."""
    from mmtg_tpu.configs import TrainConfig
    from mmtg_tpu.parallel.mesh import shard_batch
    from mmtg_tpu.train import (
        TrainState,
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    mcfg, dcfg, batch, const = mmtg_setup
    tcfg = TrainConfig(lr=1e-3, alpha=0.2, dtype="float32")
    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, mcfg, tcfg, 0, 10)

    ref_metrics = make_eval_step(mcfg, dcfg, tcfg)(
        state.params, const, batch, jnp.asarray(2)
    )

    mesh = make_dp_pp_mesh(4, 2)
    pp = (mesh, 2)
    with mesh:
        sp = shard_params_pp(state.params, mesh)
        sb = shard_batch(batch, mesh)
        pp_metrics = make_eval_step(mcfg, dcfg, tcfg, pp=pp)(
            sp, const, sb, jnp.asarray(2)
        )
        np.testing.assert_allclose(
            float(pp_metrics["total"]), float(ref_metrics["total"]), rtol=2e-6
        )

        # snapshot before the step — train_step donates its state arg
        before = jax.tree.map(np.asarray, state.params["gpt2"])
        sstate = TrainState(sp, state.opt_state, state.step, state.rng)
        train_step = make_train_step(mcfg, dcfg, tcfg, tx, pp=pp)
        # two steps: the reference-shaped LR schedule is 0 at step 0
        # (warmup ramps from zero), so only step 2 moves the params
        new_state, m = train_step(sstate, const, sb, jnp.asarray(2))
        new_state, m = train_step(new_state, const, sb, jnp.asarray(2))
        assert np.isfinite(float(m["total"]))
        assert float(m["kept"]) > 0
        moved = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            new_state.params["gpt2"],
            before,
        )
        assert max(jax.tree.leaves(moved)) > 0
