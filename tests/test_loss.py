"""Loss parity vs a torch transcription of MyLoss (loss.py:39-74) and
curriculum semantics (train.py:159-186)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import DataConfig
from mmtg_tpu.loss import (
    binarize_ratings,
    curriculum_sample_weights,
    sequence_unlikelihood_loss,
    stage_for_epoch,
    weighted_mean,
)

torch = pytest.importorskip("torch")

DCFG = DataConfig(topic_prompt_length=3, max_sent_length=2, max_seq_length=8)


def _torch_myloss(outputs, targets, ratings, stage, topic_len):
    """Literal transcription of the reference forward (loss.py:45-74)."""
    import torch.nn as nn

    NEAR_0 = 1e-10
    ratings = torch.tensor(ratings)
    one, zero = torch.ones_like(ratings), torch.zeros_like(ratings)
    y = torch.where(ratings > 4, one, zero) if stage == 1 else torch.where(
        ratings > 3, one, zero
    )
    outputs = torch.tensor(outputs)
    targets = torch.tensor(targets, dtype=torch.long)
    shift_logits = outputs[:, topic_len:-1, :]
    shift_labels = targets[:, 1:]
    loss_fct = nn.CrossEntropyLoss()
    B = targets.shape[0]
    loss = torch.zeros(B)
    for i in range(B):
        _loss = loss_fct(shift_logits[i], shift_labels[i])
        p = 1 / torch.exp(_loss)
        loss[i] = -y[i] * torch.log(p + NEAR_0) - (1 - y[i]) * torch.log(1 - p + NEAR_0)
    return float(loss.mean())


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_loss_matches_torch_oracle(stage, rng):
    B, V = 4, 11
    L = DCFG.topic_prompt_length + 9  # logits cover prompt + targets(9)
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    targets = rng.integers(0, V, (B, 9)).astype(np.int32)
    ratings = np.array([1.0, 3.0, 4.0, 5.0], np.float32)

    ref = _torch_myloss(logits, targets, ratings, stage, DCFG.topic_prompt_length)
    ours = sequence_unlikelihood_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(ratings),
        jnp.asarray(stage), DCFG,
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_weighted_matches_filtered(rng):
    """Masked loss over the full batch == plain loss over the kept subset
    (the reference's index-filtering, train.py:179-186)."""
    B, V, T = 6, 7, 9
    L = DCFG.topic_prompt_length + T
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    targets = rng.integers(0, V, (B, T)).astype(np.int32)
    ratings = np.array([1, 2, 3, 4, 5, 5], np.float32)
    for stage in (1, 2, 3):
        w = curriculum_sample_weights(jnp.asarray(ratings), jnp.asarray(stage))
        keep = np.asarray(w) > 0
        masked = sequence_unlikelihood_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(ratings),
            jnp.asarray(stage), DCFG, w,
        )
        subset = sequence_unlikelihood_loss(
            jnp.asarray(logits[keep]), jnp.asarray(targets[keep]),
            jnp.asarray(ratings[keep]), jnp.asarray(stage), DCFG,
        )
        np.testing.assert_allclose(float(masked), float(subset), rtol=1e-5)


def test_curriculum_masks():
    ratings = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_array_equal(
        np.asarray(curriculum_sample_weights(ratings, jnp.asarray(1))),
        [1, 0, 0, 0, 1],
    )
    np.testing.assert_array_equal(
        np.asarray(curriculum_sample_weights(ratings, jnp.asarray(2))),
        [1, 1, 0, 1, 1],
    )
    np.testing.assert_array_equal(
        np.asarray(curriculum_sample_weights(ratings, jnp.asarray(3))),
        [1, 1, 1, 1, 1],
    )


def test_binarize():
    r = jnp.asarray([4.0, 4.5, 3.5, 3.0])
    np.testing.assert_array_equal(
        np.asarray(binarize_ratings(r, jnp.asarray(1))), [0, 1, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(binarize_ratings(r, jnp.asarray(2))), [1, 1, 1, 0]
    )


def test_stage_schedule():
    # curriculums [1,3]: epoch 0 → 1; epochs 1,2 → 2; 3+ → 3 (train.py:159-169)
    assert [stage_for_epoch(e, (1, 3)) for e in range(5)] == [1, 2, 2, 3, 3]


def test_weighted_mean_empty_safe():
    v = jnp.asarray([1.0, 2.0])
    assert float(weighted_mean(v, jnp.asarray([0.0, 0.0]))) == 0.0


def test_chunked_loss_matches_full_value_and_grad():
    """sequence_unlikelihood_loss_from_hidden == sequence_unlikelihood_loss
    (value AND grads) when logits = hidden @ wte.T — incl. a chunk size
    that doesn't divide the 220 shifted positions (padding path)."""
    from mmtg_tpu.configs import DataConfig
    from mmtg_tpu.loss import (
        sequence_unlikelihood_loss,
        sequence_unlikelihood_loss_from_hidden,
    )

    dcfg = DataConfig(
        topic_prompt_length=3, max_sent_length=2, max_seq_length=30
    )
    B, V, D = 4, 37, 16
    L = dcfg.topic_prompt_length + dcfg.target_length
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wte = jnp.asarray(rng.standard_normal((V, D)) * 0.2, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, (B, dcfg.target_length)), jnp.int32)
    ratings = jnp.asarray([1.0, 3.0, 4.0, 5.0])
    weights = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    stage = jnp.asarray(2)

    def full(h, w):
        return sequence_unlikelihood_loss(
            h @ w.T, targets, ratings, stage, dcfg, weights
        )

    def chunked(h, w):
        return sequence_unlikelihood_loss_from_hidden(
            h, w, targets, ratings, stage, dcfg, weights, chunk_size=7
        )

    vf, gf = jax.value_and_grad(full, argnums=(0, 1))(hidden, wte)
    vc, gc = jax.value_and_grad(chunked, argnums=(0, 1))(hidden, wte)
    np.testing.assert_allclose(float(vf), float(vc), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gc[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gc[1]), atol=1e-6)
