"""Gradient accumulation (--grad_accum): the chunked step's gradients and
metrics are EXACTLY the full-batch step's, for any curriculum stage —
including chunks whose kept count is zero. The recombination scales each
chunk's kept-weighted mean back to a sum before accumulating (see
train.make_train_step)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import TrainConfig
from mmtg_tpu.train import create_train_state, make_train_step


def _dropout_free(mcfg):
    return dataclasses.replace(
        mcfg,
        dropout=0.0,
        gpt2=dataclasses.replace(
            mcfg.gpt2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0
        ),
    )


@pytest.fixture(scope="module")
def setup(request):
    mcfg = _dropout_free(request.getfixturevalue("tiny_model_cfg"))
    dcfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    rng = np.random.default_rng(21)
    records = make_synthetic_records(8, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=True)
    batch = next(ds.batches(batch_size=8))
    V = mcfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    # spread ratings so curriculum stages keep strict subsets
    batch["rating"] = np.asarray([1, 2, 3, 4, 5, 1, 3, 5], np.float32)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    table = jax.random.normal(jax.random.PRNGKey(5), (V, dcfg.wenlan_emb_size))
    return mcfg, dcfg, jb, {"wenlan_table": table}


def _one_step(mcfg, dcfg, batch, const, grad_accum, stage, n_steps=2):
    tcfg = TrainConfig(lr=1e-3, dtype="float32", remat=False,
                       grad_accum=grad_accum)
    state, tx = create_train_state(
        jax.random.PRNGKey(9), mcfg, tcfg, warmup_steps=1, total_steps=10
    )
    step = make_train_step(mcfg, dcfg, tcfg, tx)
    metrics = {}
    for _ in range(n_steps):
        state, metrics = step(state, const, batch, jnp.asarray(stage))
    return jax.device_get(state), {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("stage", [1, 2, 3])
@pytest.mark.parametrize("accum", [2, 4])
def test_matches_full_batch(setup, stage, accum):
    mcfg, dcfg, batch, const = setup
    ref_state, ref_m = _one_step(mcfg, dcfg, batch, const, 1, stage)
    acc_state, acc_m = _one_step(mcfg, dcfg, batch, const, accum, stage)
    assert acc_m["kept"] == ref_m["kept"]
    np.testing.assert_allclose(acc_m["total"], ref_m["total"], rtol=1e-5)
    for r, a in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(acc_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-6, rtol=2e-5)


def test_zero_kept_chunk_is_harmless(setup):
    """A chunk whose samples are all curriculum-filtered contributes
    nothing — and an all-zero batch stays a full no-op (reference
    train.py:184-185 continues before the optimizer)."""
    mcfg, dcfg, batch, const = setup
    # stage 1 keeps rating<2 or >4; put all kept samples in the first half
    b = dict(batch)
    b["rating"] = jnp.asarray([1, 5, 1, 5, 3, 3, 3, 3], jnp.float32)
    ref_state, ref_m = _one_step(mcfg, dcfg, b, const, 1, 1)
    acc_state, acc_m = _one_step(mcfg, dcfg, b, const, 2, 1)
    assert acc_m["kept"] == ref_m["kept"] == 4.0
    for r, a in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(acc_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-6, rtol=2e-5)
    # all filtered -> exact no-op even with accumulation
    b["rating"] = jnp.full((8,), 3.0, jnp.float32)
    state0, _ = _one_step(mcfg, dcfg, b, const, 2, 1, n_steps=0)
    state1, m = _one_step(mcfg, dcfg, b, const, 2, 1, n_steps=1)
    assert m["kept"] == 0.0
    for p0, p1 in zip(
        jax.tree.leaves(state0.params), jax.tree.leaves(state1.params)
    ):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_cli_rejects_indivisible(tmp_path):
    from mmtg_tpu.train import main

    with pytest.raises(ValueError, match="divisible"):
        main([
            "--batch_size", "10", "--grad_accum", "3",
            "--train_data_path", "x", "--val_data_path", "y",
        ])
