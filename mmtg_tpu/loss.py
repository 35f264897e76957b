"""Rating-conditioned sequence-level unlikelihood loss + curriculum masks.

Vectorized rebuild of the reference ``MyLoss`` (``loss.py:39-74``) and the
trainer's curriculum index-filtering (``train.py:159-186``). The reference
filters the batch with dynamic ``torch.where`` indexing — shape-dynamic and
jit-hostile — so here every sample gets a 0/1 *weight* instead and the loss
is a weighted mean: identical value, static shapes, no recompiles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmtg_tpu.configs import DataConfig

NEAR_0 = 1e-10


def binarize_ratings(ratings: jnp.ndarray, stage: jnp.ndarray) -> jnp.ndarray:
    """Stage-dependent rating → y (``loss.py:57-60``): stage 1 keeps only
    rating>4 as positive; later stages use rating>3."""
    y1 = (ratings > 4).astype(jnp.float32)
    y23 = (ratings > 3).astype(jnp.float32)
    return jnp.where(stage == 1, y1, y23)


def curriculum_sample_weights(ratings: jnp.ndarray, stage: jnp.ndarray) -> jnp.ndarray:
    """Which samples a stage trains on (``train.py:179-184``):
    stage 1 → rating<2 or >4; stage 2 → rating≠3; stage 3 → all."""
    w1 = ((ratings < 2) | (ratings > 4)).astype(jnp.float32)
    w2 = ((ratings < 3) | (ratings > 3)).astype(jnp.float32)
    w3 = jnp.ones_like(ratings, dtype=jnp.float32)
    return jnp.where(stage == 1, w1, jnp.where(stage == 2, w2, w3))


def stage_for_epoch(epoch: int, curriculums: Tuple[int, int]) -> int:
    """Curriculum stage schedule (``train.py:159-169``)."""
    if epoch < curriculums[0]:
        return 1
    if epoch < curriculums[1]:
        return 2
    return 3


def sequence_unlikelihood_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ratings: jnp.ndarray,
    stage: jnp.ndarray,
    dcfg: DataConfig,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The reference objective (``loss.py:45-74``), vectorized.

    Per sample: CE averaged over the 220 shifted target positions (the
    topic block and final position are dropped, ``loss.py:62-63``; PAD is
    *not* masked — faithful to ``nn.CrossEntropyLoss`` with no
    ignore_index), then ``p = exp(-CE)`` and the sequence-level NLL
    ``-y·log(p) - (1-y)·log(1-p)``. Mean over (weighted) batch.

    Args:
      logits: ``[B, topic_prompt+target_len, V]`` full-forward outputs.
      targets: ``[B, target_len]`` token ids.
      sample_weights: optional ``[B]`` 0/1 — curriculum keep-mask ×
        tail-batch padding mask. None → plain mean (reference exact).
    """
    y = binarize_ratings(ratings, stage)
    shift_logits = logits[:, dcfg.topic_prompt_length : -1, :]
    shift_labels = targets[:, 1:]
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_nll = -jnp.take_along_axis(
        logp, shift_labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    ce = jnp.mean(token_nll, axis=-1)  # [B]
    p = jnp.exp(-ce)
    per_sample = -y * jnp.log(p + NEAR_0) - (1.0 - y) * jnp.log(1.0 - p + NEAR_0)
    if sample_weights is None:
        return jnp.mean(per_sample)
    denom = jnp.maximum(jnp.sum(sample_weights), 1.0)
    return jnp.sum(per_sample * sample_weights) / denom


def weighted_mean(values: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Weighted batch mean used for the KL term under curriculum masks
    (reference means the KL over the filtered batch, ``train.py:192``)."""
    if weights is None:
        return jnp.mean(values)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)
