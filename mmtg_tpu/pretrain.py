"""Phase-1 GPT-2 lyrics pretraining.

The reference's two-phase regime (phase 1: fine-tune GPT-2 on a lyrics
corpus; phase 2: train the full MMTG from that checkpoint) is *described*
but not scripted — it ships only the resulting
``GPT2_lyrics_ckpt_epoch00.ckpt`` (reference ``README.md:83``,
``model.py:345-354``). This module makes phase 1 real: a standard causal
LM trainer over a lyrics text corpus (one sentence per line, framed
``[#START#] … [#EOS#]`` and packed into fixed-length rows), producing an
Orbax checkpoint that ``mmtg_tpu.train --gpt2_ckpt`` consumes.

Usage:
  python -m mmtg_tpu.pretrain --corpus lyrics.txt --vocab_path vocab.txt \
      --save_path pretrained/phase1 --epochs 1
"""

from __future__ import annotations

import argparse
import math
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmtg_tpu.configs import GPT2Config, SpecialTokens
from mmtg_tpu.models.gpt2 import gpt2_forward, init_gpt2_params
from mmtg_tpu.utils.logging import StepTimer, setup_logger

SPECIAL = SpecialTokens()


def pack_corpus(
    lines: List[str], tokenizer, seq_len: int = 128
) -> np.ndarray:
    """Frame each line ``[#START#] tokens [#EOS#]`` and pack greedily into
    ``[N, seq_len]`` rows (PAD-filled tails)."""
    start_id = tokenizer.convert_tokens_to_ids("[#START#]")
    eos_id = tokenizer.convert_tokens_to_ids("[#EOS#]")
    rows, cur = [], []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        ids = [start_id] + tokenizer.encode(line) + [eos_id]
        if cur and len(cur) + len(ids) > seq_len:
            rows.append(cur + [SPECIAL.pad_id] * (seq_len - len(cur)))
            cur = []
        if len(ids) > seq_len:
            ids = ids[:seq_len]
        cur += ids
    if cur:
        rows.append(cur + [SPECIAL.pad_id] * (seq_len - len(cur)))
    return np.asarray(rows, np.int32)


def lm_loss(params, cfg: GPT2Config, batch_ids, dropout_rng=None):
    """Shifted CE with PAD positions masked out."""
    embeds = jnp.take(params["wte"], batch_ids, axis=0)
    T = batch_ids.shape[1]
    mask = (batch_ids != SPECIAL.pad_id).astype(jnp.int32)
    logits, _ = gpt2_forward(
        params,
        cfg,
        embeds,
        jnp.arange(T)[None, :],
        attention_mask=mask,
        dropout_rng=dropout_rng,
        deterministic=dropout_rng is None,
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, batch_ids[:, 1:, None], axis=-1)[..., 0]
    w = mask[:, 1:].astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="MMTG phase-1 GPT-2 pretraining")
    p.add_argument("--corpus", required=True, type=str,
                   help="text file, one lyric sentence per line")
    p.add_argument("--vocab_path", required=True, type=str)
    p.add_argument("--save_path", required=True, type=str)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--seq_len", default=128, type=int)
    p.add_argument("--epochs", default=1, type=int)
    p.add_argument("--lr", default=5e-5, type=float)
    p.add_argument("--warmup_ratio", default=0.1, type=float)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--log_interval", default=50, type=int)
    args = p.parse_args(argv)

    from mmtg_tpu.bpe import load_tokenizer
    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    logger = setup_logger()
    tokenizer = load_tokenizer(args.vocab_path)
    with open(args.corpus, encoding="utf-8") as f:
        rows = pack_corpus(f.readlines(), tokenizer, args.seq_len)
    logger.info("Packed corpus: %d rows of %d tokens", len(rows), args.seq_len)

    cfg = GPT2Config(vocab_size=len(tokenizer))
    key = jax.random.PRNGKey(args.seed)
    params = init_gpt2_params(key, cfg)

    steps_per_epoch = math.ceil(len(rows) / args.batch_size)
    total = steps_per_epoch * args.epochs
    warmup = max(int(total * args.warmup_ratio), 1)
    # decay spans the REMAINING total - warmup steps so lr hits 0 exactly
    # at the end (matches train.make_schedule)
    sched = optax.join_schedules(
        [
            optax.linear_schedule(0.0, args.lr, warmup),
            optax.linear_schedule(args.lr, 0.0, max(total - warmup, 1)),
        ],
        [warmup],
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, eps=1e-6))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(lm_loss)(params, cfg, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng_np = np.random.default_rng(args.seed)
    timer = StepTimer()
    gstep = 0
    for epoch in range(args.epochs):
        order = rng_np.permutation(len(rows))
        t1 = time.time()
        for lo in range(0, len(rows), args.batch_size):
            idx = order[lo : lo + args.batch_size]
            if len(idx) < args.batch_size:  # static shapes: pad w/ row 0
                idx = np.concatenate([idx, np.zeros(args.batch_size - len(idx), int)])
            batch = jnp.asarray(rows[idx])
            key, sub = jax.random.split(key)
            timer.start()
            params, opt_state, loss = step(params, opt_state, batch, sub)
            loss = float(loss)
            timer.stop()
            gstep += 1
            if gstep % args.log_interval == 0:
                logger.info(
                    "epoch %d step %d loss %.4f (%.1f rows/s)",
                    epoch + 1, gstep, loss, timer.throughput(args.batch_size),
                )
        logger.info("epoch %d done in %.1fs, last loss %.4f",
                    epoch + 1, time.time() - t1, loss)

    from mmtg_tpu.checkpoint import save_train_state

    save_train_state(args.save_path, gstep, {"gpt2": jax.device_get(params)})
    logger.info("Saved phase-1 GPT-2 checkpoint to %s (step %d)",
                args.save_path, gstep)


if __name__ == "__main__":
    main()
