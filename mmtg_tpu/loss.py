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


def _packed_slot_loss(
    nll_sums: jnp.ndarray,  # [R·S] per-slot summed label NLL
    pbatch,
    stage: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-slot CE → sequence-level unlikelihood → weighted batch mean.

    NON-parity accounting (pack.py contract): CE divides by the slot's
    REAL label count instead of the fixed 220; a PAD-free sample makes
    the two coincide exactly (tested)."""
    R, S = pbatch["slot_valid"].shape
    ratings = pbatch["slot_rating"].reshape(R * S)
    valid = pbatch["slot_valid"].reshape(R * S)
    nlab = pbatch["slot_nlabels"].reshape(R * S)
    ce = nll_sums / jnp.maximum(nlab, 1.0)
    # Empty slots carry ce == 0 → p == 1 → XLA may reassociate
    # 1 - p + eps into exactly 0 and emit log(0) = -inf, which the ×0
    # slot weight then turns into NaN. Pin dead slots to a harmless ce
    # BEFORE the logs (real slots keep the parity formula untouched).
    ce = jnp.where(valid > 0, ce, 1.0)
    y = binarize_ratings(ratings, stage)
    p = jnp.exp(-ce)
    per_slot = -y * jnp.log(p + NEAR_0) - (1.0 - y) * jnp.log(1.0 - p + NEAR_0)
    weights = curriculum_sample_weights(ratings, stage) * valid
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(per_slot * weights) / denom, weights, denom


def _packed_flat_ids(pbatch) -> jnp.ndarray:
    """[R, L] global slot id per token (R·S = dump bucket for pads)."""
    R, L = pbatch["tokens"].shape
    S = pbatch["slot_valid"].shape[1]
    seg = pbatch["seg"]
    base = jnp.arange(R, dtype=jnp.int32)[:, None] * S
    return jnp.where(seg < S, base + seg, R * S)


def packed_sequence_unlikelihood_loss(
    logits: jnp.ndarray,  # [R, L, V]
    pbatch,
    stage: jnp.ndarray,
):
    """Full-logits packed loss (``--pack_sequences``). Returns
    ``(loss, slot_weights, denom)`` — weights feed the KL mean."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        logp, pbatch["labels"][..., None].astype(jnp.int32), axis=-1
    )[..., 0] * pbatch["label_w"]
    R, L = nll.shape
    S = pbatch["slot_valid"].shape[1]
    sums = jax.ops.segment_sum(
        nll.reshape(R * L), _packed_flat_ids(pbatch).reshape(R * L),
        num_segments=R * S + 1,
    )[: R * S]
    return _packed_slot_loss(sums, pbatch, stage)


def packed_sequence_unlikelihood_loss_from_hidden(
    hidden: jnp.ndarray,  # [R, L, D]
    wte: jnp.ndarray,
    pbatch,
    stage: jnp.ndarray,
    chunk_size: int = 64,
):
    """Chunked-LM-head packed loss: [R, chunk, V] logit slices under
    ``jax.checkpoint`` (same memory story as the parity chunked path)."""
    R, L, D = hidden.shape
    S = pbatch["slot_valid"].shape[1]
    n_chunks = -(-L // chunk_size)
    pad = n_chunks * chunk_size - L
    h = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))) if pad else hidden
    lab = jnp.pad(pbatch["labels"], ((0, 0), (0, pad))) if pad else pbatch["labels"]
    lw = jnp.pad(pbatch["label_w"], ((0, 0), (0, pad))) if pad else pbatch["label_w"]
    ids = _packed_flat_ids(pbatch)
    ids = (jnp.pad(ids, ((0, 0), (0, pad)), constant_values=R * S)
           if pad else ids)
    hs = h.reshape(R, n_chunks, chunk_size, D).transpose(1, 0, 2, 3)
    ys = lab.reshape(R, n_chunks, chunk_size).transpose(1, 0, 2)
    ws = lw.reshape(R, n_chunks, chunk_size).transpose(1, 0, 2)
    fs = ids.reshape(R, n_chunks, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_sums(h_c, y_c, w_c, f_c):
        logits = (h_c @ wte.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, y_c[..., None].astype(jnp.int32), axis=-1
        )[..., 0] * w_c
        return jax.ops.segment_sum(
            nll.reshape(-1), f_c.reshape(-1), num_segments=R * S + 1
        )[: R * S]

    def body(acc, xs):
        return acc + chunk_sums(*xs), None

    sums, _ = jax.lax.scan(
        body, jnp.zeros((R * S,), jnp.float32), (hs, ys, ws, fs)
    )
    return _packed_slot_loss(sums, pbatch, stage)


def weighted_mean(values: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Weighted batch mean used for the KL term under curriculum masks
    (reference means the KL over the filtered batch, ``train.py:192``)."""
    if weights is None:
        return jnp.mean(values)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)
