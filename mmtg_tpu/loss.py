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


def sequence_unlikelihood_loss_from_hidden(
    hidden: jnp.ndarray,
    wte: jnp.ndarray,
    targets: jnp.ndarray,
    ratings: jnp.ndarray,
    stage: jnp.ndarray,
    dcfg: DataConfig,
    sample_weights: jnp.ndarray | None = None,
    chunk_size: int = 44,
) -> jnp.ndarray:
    """Same value as :func:`sequence_unlikelihood_loss`, computed from the
    decoder's pre-LM-head hidden states without ever materializing the full
    ``[B, T, V]`` logits.

    At train shapes (B=256, T=236, V=13317) the full-logits path costs
    1.6 GB bf16 logits + a ~2.9 GB f32 log-softmax of HBM; here each
    ``lax.scan`` step computes one ``[B, chunk, V]`` slice under
    ``jax.checkpoint`` (re-derived in the backward), so peak loss memory
    drops ~25x. The LM-head matmul runs twice (fwd + bwd recompute) but it
    is a ~7 ms MXU op — the HBM traffic it saves is worth more.
    """
    y = binarize_ratings(ratings, stage)
    h = hidden[:, dcfg.topic_prompt_length : -1, :]
    labels = targets[:, 1:].astype(jnp.int32)
    B, T, D = h.shape
    n_chunks = -(-T // chunk_size)
    pad = n_chunks * chunk_size - T
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
    valid = (jnp.arange(n_chunks * chunk_size) < T).astype(jnp.float32)
    hs = h.reshape(B, n_chunks, chunk_size, D).transpose(1, 0, 2, 3)
    ys = labels.reshape(B, n_chunks, chunk_size).transpose(1, 0, 2)
    vs = valid.reshape(n_chunks, chunk_size)

    @jax.checkpoint
    def chunk_nll_sum(h_c, y_c, v_c):
        # logits in the compute dtype, softmax reduce in f32 — identical
        # numerics to the full path (loss computes log_softmax in f32).
        logits = (h_c @ wte.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y_c[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * v_c[None, :], axis=-1)

    def body(acc, xs):
        return acc + chunk_nll_sum(*xs), None

    total_nll, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), (hs, ys, vs))
    ce = total_nll / T
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
