"""Trainer: schedule parity vs transformers, step mechanics, overfit smoke,
checkpoint resume round-trip."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import TrainConfig
from mmtg_tpu.models.mmtg import init_mmtg_params
from mmtg_tpu.train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_schedule,
    make_train_step,
    parse_curriculums,
)


@pytest.fixture(scope="module")
def setup(request):
    mcfg = request.getfixturevalue("tiny_model_cfg")
    dcfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    rng = np.random.default_rng(5)
    records = make_synthetic_records(8, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=8))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    table = jax.random.normal(jax.random.PRNGKey(9), (V, dcfg.wenlan_emb_size))
    return mcfg, dcfg, jb, {"wenlan_table": table}


def test_schedule_matches_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    tcfg = TrainConfig(lr=1e-3)
    warmup, total = 10, 100
    sched = make_schedule(tcfg, warmup, total)

    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=tcfg.lr)
    ref = transformers.get_linear_schedule_with_warmup(opt, warmup, total)
    for step in range(total):
        ref_lr = opt.param_groups[0]["lr"]
        ours = float(sched(step))
        assert math.isclose(ours, ref_lr, rel_tol=1e-5, abs_tol=1e-9), (
            step, ours, ref_lr,
        )
        ref.step()


def test_train_step_decreases_loss(setup):
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig(lr=3e-3, alpha=0.2)
    state, tx = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, warmup_steps=2, total_steps=200
    )
    train_step = make_train_step(mcfg, dcfg, tcfg, tx)
    stage = jnp.asarray(3)
    first = None
    for i in range(12):
        state, metrics = train_step(state, const, batch, stage)
        if first is None:
            first = float(metrics["total"])
    assert int(state.step) == 12
    assert float(metrics["total"]) < first
    assert np.isfinite(float(metrics["total"]))


def test_eval_deterministic(setup):
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig()
    state, _ = create_train_state(
        jax.random.PRNGKey(1), mcfg, tcfg, warmup_steps=1, total_steps=10
    )
    eval_step = make_eval_step(mcfg, dcfg, tcfg)
    a = eval_step(state.params, const, batch, jnp.asarray(2))
    b = eval_step(state.params, const, batch, jnp.asarray(2))
    assert float(a["total"]) == float(b["total"])


def test_stage_changes_kept_count(setup):
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig()
    state, _ = create_train_state(
        jax.random.PRNGKey(2), mcfg, tcfg, warmup_steps=1, total_steps=10
    )
    eval_step = make_eval_step(mcfg, dcfg, tcfg)
    kept = [float(eval_step(state.params, const, batch, jnp.asarray(s))["kept"]) for s in (1, 2, 3)]
    assert kept[0] <= kept[1] <= kept[2]
    assert kept[2] == batch["rating"].shape[0]


def test_epoch_for_step():
    from mmtg_tpu.train import epoch_for_step

    # 10 samples, bs 2, curriculums (1,3): stage-1 epoch runs at 2x bs
    # (4) -> 3 steps; later epochs -> 5 steps. Cumulative: 3,8,13,18,23.
    cur, epochs = (1, 3), 5
    assert epoch_for_step(0, 10, 2, cur, epochs) == 0
    assert epoch_for_step(2, 10, 2, cur, epochs) == 0  # mid epoch 0: replay
    assert epoch_for_step(3, 10, 2, cur, epochs) == 1  # boundary: next epoch
    assert epoch_for_step(8, 10, 2, cur, epochs) == 2
    assert epoch_for_step(13, 10, 2, cur, epochs) == 3
    assert epoch_for_step(22, 10, 2, cur, epochs) == 4
    assert epoch_for_step(23, 10, 2, cur, epochs) == 5  # fully trained


def test_zero_kept_batch_is_noop(setup):
    """A batch the curriculum filters out entirely must not move params,
    AdamW moments, or the schedule count (reference train.py:184-185
    ``continue``s before optimizer/scheduler)."""
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig(lr=3e-3, alpha=0.2)
    state, tx = create_train_state(
        jax.random.PRNGKey(4), mcfg, tcfg, warmup_steps=2, total_steps=50
    )
    train_step = make_train_step(mcfg, dcfg, tcfg, tx)
    # warm AdamW moments so a frozen schedule/moment is actually observable
    state, _ = train_step(state, const, batch, jnp.asarray(3))

    params_before = jax.device_get(state.params)
    opt_before = jax.device_get(state.opt_state)
    # stage 1 keeps rating<2 or >4 — all-3 ratings leave nothing
    zb = dict(batch, rating=jnp.full_like(batch["rating"], 3.0))
    state, metrics = train_step(state, const, zb, jnp.asarray(1))
    assert float(metrics["kept"]) == 0.0
    jax.tree.map(
        np.testing.assert_array_equal, jax.device_get(state.params), params_before
    )
    jax.tree.map(
        np.testing.assert_array_equal, jax.device_get(state.opt_state), opt_before
    )
    # ...while a kept batch does move params
    state, metrics = train_step(state, const, batch, jnp.asarray(3))
    assert float(metrics["kept"]) > 0
    moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            jax.device_get(state.params), params_before,
        )
    )
    assert max(moved) > 0


def test_checkpoint_roundtrip(setup, tmp_path):
    mcfg, dcfg, batch, const = setup
    from mmtg_tpu.checkpoint import restore_train_state, save_train_state

    tcfg = TrainConfig()
    state, tx = create_train_state(
        jax.random.PRNGKey(3), mcfg, tcfg, warmup_steps=1, total_steps=10
    )
    train_step = make_train_step(mcfg, dcfg, tcfg, tx)
    state, _ = train_step(state, const, batch, jnp.asarray(3))

    save_train_state(str(tmp_path / "ck"), int(state.step), jax.device_get(state))
    template, _ = create_train_state(
        jax.random.PRNGKey(99), mcfg, tcfg, warmup_steps=1, total_steps=10
    )
    restored, step = restore_train_state(str(tmp_path / "ck"), template)
    assert step == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues identically
    s1, m1 = train_step(state, const, batch, jnp.asarray(3))
    s2, m2 = train_step(
        TrainState(restored.params, restored.opt_state, restored.step, restored.rng),
        const, batch, jnp.asarray(3),
    )
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)


def test_parse_curriculums():
    assert parse_curriculums("[1,3]") == (1, 3)
    assert parse_curriculums("1,3") == (1, 3)
    with pytest.raises(ValueError):
        parse_curriculums("1")


def test_remat_forward_matches(setup):
    """jax.checkpoint on the block scan must not change the numbers."""
    from mmtg_tpu.models.mmtg import mmtg_forward_train

    mcfg, dcfg, batch, const = setup
    params = init_mmtg_params(jax.random.PRNGKey(7), mcfg)
    a = mmtg_forward_train(params, const, mcfg, dcfg, batch, remat=False)
    b = mmtg_forward_train(params, const, mcfg, dcfg, batch, remat=True)
    np.testing.assert_allclose(
        np.asarray(a.logits), np.asarray(b.logits), atol=1e-6
    )


def test_training_deterministic_given_seed(setup):
    """Same seed → bitwise-identical loss trajectory (threaded jax.random
    keys replace the reference's global torch seeding, train.py:81-94)."""
    mcfg, dcfg, batch, const = setup
    tcfg = TrainConfig(lr=1e-3, alpha=0.2)

    def run():
        state, tx = create_train_state(
            jax.random.PRNGKey(123), mcfg, tcfg, warmup_steps=1, total_steps=10
        )
        step_fn = make_train_step(mcfg, dcfg, tcfg, tx)
        losses = []
        for _ in range(3):
            state, m = step_fn(state, const, batch, jnp.asarray(3))
            losses.append(float(m["total"]))
        return losses

    assert run() == run()
