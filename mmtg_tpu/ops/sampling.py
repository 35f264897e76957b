"""Fully batched, jittable top-k / top-p sampling ops.

Reimplements the reference's batch-1 sampling pipeline
(``generate.py:64-145``) as vectorized ops over ``[B, V]`` logits so a
whole batch decodes in one fused XLA program:

  * repetition penalty: unconditional division of already-seen token
    logits once PER OCCURRENCE (faithful to ``generate.py:127-131`` —
    including its behavior on negative logits and the non-deduping
    tensor-set quirk), exemptions {PAD=0, SEP=102}, tracked with a
    per-row occurrence-count table instead of a Python ``set``;
  * temperature, then hard bans on {[#START#], [#EOS#], [UNK], [SEP]}
    (``generate.py:132-136``);
  * forced PAD when the previous token is PAD (``generate.py:137-138``);
  * top-k threshold mask + nucleus (top-p) mask with keep-first shift
    (``generate.py:64-94``, the Thom Wolf gist), then categorical draw.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mmtg_tpu.configs import SpecialTokens

NEG_INF = -1e30
SPECIAL = SpecialTokens()
DEFAULT_BANNED = (SPECIAL.start_id, SPECIAL.eos_id, SPECIAL.unk_id, SPECIAL.sep_id)
DEFAULT_PENALTY_EXEMPT = (SPECIAL.pad_id, SPECIAL.sep_id)


def apply_repetition_penalty(
    logits: jnp.ndarray,
    seen_counts: jnp.ndarray,
    penalty: float,
    exempt_ids: Sequence[int] = DEFAULT_PENALTY_EXEMPT,
) -> jnp.ndarray:
    """Divide seen-token logits by ``penalty`` once PER OCCURRENCE.

    Faithful to ``generate.py:127-131``: the reference's
    ``set(generated[0])`` is a set of 0-dim torch *tensors* (id-based
    ``__hash__``), so it never dedupes — a token that occurred ``n`` times
    is divided ``n`` times, i.e. ``logits / penalty**n``.

    Args:
      logits: ``[B, V]``.
      seen_counts: ``[B, V]`` int (or bool = 0/1 counts) — occurrence
        count of each token in the row so far.
    """
    counts = seen_counts.astype(logits.dtype)
    if exempt_ids:
        counts = counts.at[:, jnp.asarray(exempt_ids)].set(0)
    return logits * jnp.power(jnp.asarray(penalty, logits.dtype), -counts)


def ban_tokens(
    logits: jnp.ndarray, banned_ids: Sequence[int] = DEFAULT_BANNED
) -> jnp.ndarray:
    """Set banned token logits to -inf (``generate.py:133-136``)."""
    return logits.at[:, jnp.asarray(banned_ids)].set(NEG_INF)


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 0.0
) -> jnp.ndarray:
    """Batched port of the reference filter (``generate.py:64-94``).

    top-k keeps every logit ≥ the k-th largest; top-p sorts descending,
    masks tokens whose *cumulative* softmax mass exceeds ``top_p``, with
    the keep-first right-shift so at least one token always survives.
    """
    V = logits.shape[-1]
    if top_k > 0:
        k = min(top_k, V)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p > 0.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum_probs > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        sorted_logits = jnp.where(remove, NEG_INF, sorted_logits)
        # Unsort back to vocab order.
        inv = jnp.argsort(sort_idx, axis=-1)
        logits = jnp.take_along_axis(sorted_logits, inv, axis=-1)
    return logits


def _nucleus_mask_sorted(sorted_logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Keep-first nucleus mask over descending-sorted logits
    (``generate.py:82-90``); returns masked sorted logits."""
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum_probs > top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    return jnp.where(remove, NEG_INF, sorted_logits)


def sample_next_token(
    key: jax.Array,
    logits: jnp.ndarray,
    seen_counts: jnp.ndarray,
    last_token: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    repetition_penalty: float = 1.0,
    topk_impl: str = "exact",
    per_row_keys: bool = False,
) -> jnp.ndarray:
    """One full sampling step over a batch (``generate.py:124-142`` order).

    With ``top_k > 0`` the whole filter+draw happens in the ``[B, k]``
    top-k subspace: every non-top-k logit is already -inf, so the nucleus
    mask and the categorical draw over the k candidates induce exactly
    the softmax-of-filtered-logits distribution — without the per-step
    full-vocab argsort (the decode-loop hot spot at 13317×B).

    Args:
      logits: ``[B, V]`` next-token logits.
      seen_counts: ``[B, V]`` occurrence counts of tokens generated so
        far (incl. prompt); bool works as 0/1 counts.
      last_token: ``[B]`` previous token id (PAD forces PAD).
      topk_impl: "exact" (lax.top_k — the reference's semantics, a
        sort-bound custom call: 0.26 ms/step on [512, 13317] bf16) or
        "approx" (lax.approx_max_k, recall_target 0.99 — the TPU's
        partial-reduce top-k; candidates are exact-top-k-aggregated and
        sorted, but ~1% of true top-k entries may be swapped for
        near-ties, a measurable-but-tiny sampling perturbation).
      per_row_keys: when True, ``key`` is a ``[B]`` batch of PRNG keys
        and each row draws from its own stream (batch-composition-
        invariant sampling for the serving layer); default False keeps
        the historical single-key draw bit-for-bit.
    Returns:
      ``[B]`` int32 sampled token ids.
    """
    if per_row_keys:
        draw = jax.vmap(lambda k, l: jax.random.categorical(k, l, axis=-1))
    else:
        draw = lambda k, l: jax.random.categorical(k, l, axis=-1)  # noqa: E731
    if repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, seen_counts, repetition_penalty)
    logits = logits / temperature
    logits = ban_tokens(logits)
    if top_k > 0:
        k = min(top_k, logits.shape[-1])
        # default "exact" is the full-vocab TopK call. The grouped exact
        # two-stage form (tools/probe_topk.py) loses in-program at BOTH
        # vocabs — 14% at 13,317 (95.9k -> 82.6k) and 2x at the English
        # 50,257 (99.4k -> 47.8k, token-identical) — despite winning the
        # standalone op probe; the reshape/pad/gather traffic around it
        # doesn't fuse. "approx" (recall 0.99) is noise at 13,317 but
        # +16% at 50,257 (99k -> 115k): the English serving lever.
        if topk_impl == "approx":
            vals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.99)
        else:
            vals, idx = jax.lax.top_k(logits, k)  # descending, ties by index
        if top_p > 0.0:
            vals = _nucleus_mask_sorted(vals, top_p)
        j = draw(key, vals)
        sampled = jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0].astype(jnp.int32)
    else:
        filtered = top_k_top_p_filter(logits, top_k=top_k, top_p=top_p)
        sampled = draw(key, filtered).astype(jnp.int32)
    return jnp.where(last_token == SPECIAL.pad_id, SPECIAL.pad_id, sampled)


def frame_forced_token(step_index: jnp.ndarray, sent_frame_length: int = 22):
    """Forced frame tokens at sentence boundaries (``generate.py:118-122``).

    The reference decodes positions ``i = 0..length-1`` (relative to the
    initial ``[#START#]``) and forces ``[#EOS#]`` when ``(i+2) % 22 == 0``
    and ``[#START#]`` when ``(i+2) % 22 == 1`` for ``i > 0``.

    Returns:
      (is_forced ``bool``, forced_id ``int32``) for the given step index.
    """
    m = (step_index + 2) % sent_frame_length
    is_eos = jnp.logical_and(step_index > 0, m == 0)
    is_start = jnp.logical_and(step_index > 0, m == 1)
    forced = jnp.where(
        is_eos, SPECIAL.eos_id, jnp.where(is_start, SPECIAL.start_id, 0)
    ).astype(jnp.int32)
    return jnp.logical_or(is_eos, is_start), forced
