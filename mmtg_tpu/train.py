"""Curriculum trainer: optax AdamW + linear warmup/decay, pjit over a mesh.

CLI-parity rebuild of the reference trainer (``train.py:33-268``):
identical flag names and defaults, identical optimization recipe
(transformers-AdamW lr 1e-5 / eps 1e-6 / wd 0, linear warmup over 10% of
one epoch then linear decay — ``train.py:137-148``; global-norm grad clip
1.0 — ``:194``), identical curriculum semantics (stage-by-epoch with a 2×
batch in stage 1 and rating-based filtering — ``:130-135``, ``:159-186``)
— but with static shapes throughout: filtering is a 0/1 sample-weight
mask, so one compiled train step serves every stage and batch.

TPU-native extras over the reference: full train-state checkpointing with
resume (params + optimizer + step + PRNG via Orbax), bfloat16 compute
option, mesh-sharded data parallelism (gradient all-reduce emitted by XLA
over ICI), and throughput logging.
"""

from __future__ import annotations

import argparse
import math
import os
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmtg_tpu.configs import DataConfig, ModelConfig, TrainConfig
from mmtg_tpu.loss import (
    curriculum_sample_weights,
    packed_sequence_unlikelihood_loss,
    packed_sequence_unlikelihood_loss_from_hidden,
    sequence_unlikelihood_loss,
    sequence_unlikelihood_loss_from_hidden,
    stage_for_epoch,
    weighted_mean,
)
from mmtg_tpu.models.mmtg import (
    init_mmtg_params,
    mmtg_forward_train,
    mmtg_forward_train_packed,
)
from mmtg_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from mmtg_tpu.utils.logging import StepTimer, format_time, setup_logger


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: jax.Array


def make_schedule(tcfg: TrainConfig, warmup_steps: int, total_steps: int):
    """Linear warmup → linear decay to 0 (``get_linear_schedule_with_warmup``,
    reference ``train.py:146-148``)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, tcfg.lr, max(warmup_steps, 1)),
            optax.linear_schedule(
                tcfg.lr, 0.0, max(total_steps - warmup_steps, 1)
            ),
        ],
        [max(warmup_steps, 1)],
    )


def make_optimizer(tcfg: TrainConfig, warmup_steps: int, total_steps: int):
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip_norm),
        optax.adamw(
            make_schedule(tcfg, warmup_steps, total_steps),
            b1=tcfg.adam_b1,
            b2=tcfg.adam_b2,
            eps=tcfg.adam_eps,
            weight_decay=tcfg.weight_decay,
        ),
    )


def create_train_state(
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    warmup_steps: int,
    total_steps: int,
    params: Optional[Dict] = None,
) -> Tuple[TrainState, Any]:
    pkey, rkey = jax.random.split(key)
    if params is None:
        params = init_mmtg_params(pkey, mcfg)
    tx = make_optimizer(tcfg, warmup_steps, total_steps)
    return (
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), rkey),
        tx,
    )


def _resolve_remat_policy(policy: str, batch=None, pp=None) -> str:
    """"auto" → "save_qkv_ctx" when the saved pair fits, else "full".

    r03 measured save_qkv_ctx LOSING with the padded attention slab
    (521 vs 511 ms @ b256): saving the [B,T,4608] padded qkv round-trips
    more HBM than the recompute costs. The r05 PACKED slab halves that
    save to [B,T,2304], flipping the verdict: 393.5 → 382.9 ms @ b256
    (docs/PERF.md round-5 A/B; save_ctx_fc1 385.4, chunked-loss 401.6).
    Memory gate: qkv+ctx ≈ 73728·B·T bytes across 12 layers — fine at
    b256×256 (4.8 GB of 15.75), OOM territory at b512 → fall back to
    "full" past ~5 GB. Pipeline path keeps "full" (per-stage savings
    unmeasured)."""
    if policy != "auto":
        return policy
    if pp is not None or batch is None:
        return "full"
    if "tokens" in batch:  # packed rows
        B, T = batch["tokens"].shape
    else:
        B, T = batch["targets"].shape
        T += 15  # topic prompt rides in front of the targets
    Tp = ((T + 127) // 128) * 128  # kernel sequence pad
    return "save_qkv_ctx" if 73728 * B * Tp <= 5e9 else "full"


def _resolve_loss_impl(impl: str, batch: Dict[str, jnp.ndarray], vocab: int) -> str:
    """``auto`` → "full" when the materialized-logits path fits
    comfortably, else "chunked" (identical loss value either way —
    value+grad-equal tested). The full path materializes the [B,T,V]
    bf16 logits plus an f32 log-softmax in the backward ≈ 6·B·T·V bytes;
    measured on a 16 GB v5e at V=13k: b256 full is ~1% faster (the
    chunked LM-head re-run is ~5 ms of MXU), b512 full OOMs. English
    vocab (50257) needs chunked from b128 up."""
    if impl != "auto":
        return impl
    B, T = (batch["tokens"].shape if "tokens" in batch
            else batch["targets"].shape)
    return "full" if 6 * B * T * vocab < 5e9 else "chunked"


def loss_and_metrics(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    tcfg: TrainConfig,
    batch: Dict[str, jnp.ndarray],
    stage: jnp.ndarray,
    dropout_rng: Optional[jax.Array],
    deterministic: bool,
    pp=None,
):
    """total = unlikelihood(curriculum-masked) + alpha·KL
    (reference ``train.py:191-192``)."""
    if tcfg.dtype == "bfloat16":
        # mixed precision: f32 master params/optimizer, bf16 compute
        # (the cast is differentiable → gradients land back in f32);
        # the loss itself always reduces in f32.
        cast = lambda x: (
            x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
        )
        fwd_params = jax.tree.map(cast, params)
        fwd_const = jax.tree.map(cast, const)
    else:
        fwd_params, fwd_const = params, const
    chunked = (
        _resolve_loss_impl(
            tcfg.loss_impl, batch, mcfg.gpt2.vocab_size
        )
        == "chunked"
    )
    if "seg" in batch:
        # --pack_sequences: segment-packed rows (mmtg_tpu.pack). The
        # NON-parity objective — per-slot CE over real labels only — is
        # the whole point; see pack.py's token-accounting contract.
        out = mmtg_forward_train_packed(
            fwd_params,
            fwd_const,
            mcfg,
            dcfg,
            batch,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            remat=tcfg.remat and not deterministic,
            attn_impl=tcfg.attn_impl,
            remat_policy=_resolve_remat_policy(tcfg.remat_policy, batch),
            lm_head=not chunked,
        )
        if chunked:
            loss, weights, _ = packed_sequence_unlikelihood_loss_from_hidden(
                out.hidden, fwd_params["gpt2"]["wte"], batch, stage
            )
        else:
            loss, weights, _ = packed_sequence_unlikelihood_loss(
                out.logits, batch, stage
            )
        kl_flat = out.kl_per_sample.astype(jnp.float32).reshape(-1)
        kl = weighted_mean(kl_flat, weights)
        total = loss + tcfg.alpha * kl
        return total, {"loss": loss, "kl": kl, "total": total,
                       "kept": jnp.sum(weights)}
    out = mmtg_forward_train(
        fwd_params,
        fwd_const,
        mcfg,
        dcfg,
        batch,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
        remat=tcfg.remat and not deterministic,
        attn_impl=tcfg.attn_impl,
        remat_policy=_resolve_remat_policy(tcfg.remat_policy, batch, pp=pp),
        lm_head=not chunked,
        pp=pp,
    )
    ratings = batch["rating"]
    weights = curriculum_sample_weights(ratings, stage)
    if "sample_mask" in batch:
        weights = weights * batch["sample_mask"]
    if chunked:
        loss = sequence_unlikelihood_loss_from_hidden(
            out.hidden,
            fwd_params["gpt2"]["wte"],
            batch["targets"],
            ratings,
            stage,
            dcfg,
            weights,
        )
    else:
        loss = sequence_unlikelihood_loss(
            out.logits, batch["targets"], ratings, stage, dcfg, weights
        )
    kl = weighted_mean(out.kl_per_sample.astype(jnp.float32), weights)
    total = loss + tcfg.alpha * kl
    return total, {"loss": loss, "kl": kl, "total": total, "kept": jnp.sum(weights)}


def make_train_step(mcfg, dcfg, tcfg, tx, pp=None, zero1_shardings=None,
                    param_shardings=None):
    """One jitted, donated train step (grad → clip → AdamW → apply).

    ``const`` (the ~109MB WenLan gather table) is a runtime argument, NOT
    a closure capture — capturing it would bake it into the HLO as a
    constant and blow up compile payloads.

    ``pp=(mesh, n_micro)`` runs the GPT-2 stack GPipe-pipelined over the
    mesh's ``pipe`` axis (``parallel.pipeline``); grads/optimizer are
    unchanged — the reverse pipeline falls out of differentiating the
    shard_map.

    ``zero1_shardings`` (ZeRO-1): a NamedSharding tree pinning the
    updated optimizer state to its data-axis shards
    (``parallel.mesh.zero1_opt_shardings``), so the AdamW moment update
    runs — and its state lives — 1/dp-sharded per device instead of
    replicated.

    ``param_shardings``: a NamedSharding tree pinning the UPDATED params
    to the same canonical layout the inputs were placed at
    (``parallel.mesh.param_shardings`` / ``pipeline.pp_param_shardings``).
    Without it GSPMD is free to invent exotic output shardings for the
    updated params (e.g. a 4x2 factorization of the data axis across two
    tensor dims), which then become the INPUT shardings of every
    downstream compile (eval/decode) and trigger
    "[SPMD] Involuntary full rematerialization" — a replicate-then-
    repartition of the tensor on every call."""

    def _grads_and_metrics(params, const, batch, stage, dropout_rng):
        """One fwd+bwd over the whole batch, or ``tcfg.grad_accum``
        sequential micro-chunks with EXACT recombination: the chunk total
        is a kept-weighted mean, so ``grad(total_c)·max(kept_c, 1)``
        accumulates to the full-batch numerator and one division by
        ``max(Σkept, 1)`` restores the reference objective — identical
        gradients for any row→chunk assignment (tests/test_grad_accum.py)."""
        N = tcfg.grad_accum

        def loss_fn_for(chunk, rng_i):
            def loss_fn(p):
                return loss_and_metrics(
                    p, const, mcfg, dcfg, tcfg, chunk, stage, rng_i, False,
                    pp=pp,
                )
            return loss_fn

        if N <= 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn_for(batch, dropout_rng), has_aux=True
            )(params)
            return grads, metrics

        # every batch leaf is batch-leading (parity rows or packed rows)
        B = jax.tree.leaves(batch)[0].shape[0]
        if B % N:
            raise ValueError(f"batch {B} not divisible by grad_accum {N}")
        chunks = jax.tree.map(
            lambda x: x.reshape((N, B // N) + x.shape[1:]), batch
        )

        def body(carry, xs):
            g_acc, num_acc, i = carry
            chunk = xs
            rng_i = jax.random.fold_in(dropout_rng, i)

            def scaled_loss(p):
                total, m = loss_fn_for(chunk, rng_i)(p)
                k = jnp.maximum(m["kept"], 1.0)
                return total * k, m

            (_, m), g = jax.value_and_grad(scaled_loss, has_aux=True)(params)
            k = jnp.maximum(m["kept"], 1.0)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            num_acc = {
                "loss": num_acc["loss"] + m["loss"] * k,
                "kl": num_acc["kl"] + m["kl"] * k,
                "total": num_acc["total"] + m["total"] * k,
                "kept": num_acc["kept"] + m["kept"],
            }
            return (g_acc, num_acc, i + 1), None

        g0 = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        n0 = {k: jnp.zeros((), jnp.float32) for k in ("loss", "kl", "total", "kept")}
        (g_acc, num, _), _ = jax.lax.scan(body, (g0, n0, 0), chunks)
        denom = jnp.maximum(num["kept"], 1.0)
        grads = jax.tree.map(lambda g: (g / denom).astype(jnp.float32), g_acc)
        metrics = {
            "loss": num["loss"] / denom,
            "kl": num["kl"] / denom,
            "total": num["total"] / denom,
            "kept": num["kept"],
        }
        return grads, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, const: Dict, batch: Dict, stage: jnp.ndarray):
        rng, dropout_rng = jax.random.split(state.rng)
        grads, metrics = _grads_and_metrics(
            state.params, const, batch, stage, dropout_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if zero1_shardings is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, zero1_shardings
            )
        params = optax.apply_updates(state.params, updates)
        # Zero-kept curriculum batches are true no-ops: the reference
        # ``continue``s before optimizer/scheduler (train.py:184-185), so
        # neither AdamW moments (nonzero even with zero grads) nor the
        # schedule count may advance.
        keep = metrics["kept"] > 0
        params = jax.tree.map(
            lambda n, o: jnp.where(keep, n, o), params, state.params
        )
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(keep, n, o), opt_state, state.opt_state
        )
        if param_shardings is not None:
            params = jax.lax.with_sharding_constraint(params, param_shardings)
        return TrainState(params, opt_state, state.step + 1, rng), metrics

    return train_step


def make_eval_step(mcfg, dcfg, tcfg, pp=None):
    @jax.jit
    def eval_step(params: Dict, const: Dict, batch: Dict, stage: jnp.ndarray):
        _, metrics = loss_and_metrics(
            params, const, mcfg, dcfg, tcfg, batch, stage, None, True, pp=pp
        )
        return metrics

    return eval_step


def evaluate(eval_step, params, const, dataset, batch_size, stage) -> Tuple[float, float]:
    """Mean val loss over the set (reference ``train.py:241-268``): batches
    with zero kept samples contribute 0, faithful to the reference's
    ``continue``-then-divide-by-len behavior."""
    losses, kls, n = 0.0, 0.0, 0
    for batch in dataset.batches(batch_size):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        m = eval_step(params, const, jb, jnp.asarray(stage))
        kept = float(m["kept"])
        if kept > 0:
            losses += float(m["total"])
            kls += float(m["kl"])
        n += 1
    return losses / max(n, 1), kls / max(n, 1)


# ---------------------------------------------------------------------------
# CLI (flag names/defaults per reference train.py:33-51 + train.sh)
# ---------------------------------------------------------------------------


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MMTG TPU trainer")
    p.add_argument("--device_ids", default="0", type=str,
                   help="kept for reference-CLI parity; mesh uses all devices")
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--val_batch_size", default=32, type=int)
    p.add_argument("--epochs", default=5, type=int)
    p.add_argument("--lr", default=1e-05, type=float)
    p.add_argument("--curriculums", default="1,3", type=str,
                   help="two ints, e.g. '1,3' (also accepts '[1,3]')")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--num_workers", default=0, type=int,
                   help="parity no-op (data is pre-packed, no loader workers)")
    p.add_argument("--log_interval", default=100, type=int)
    p.add_argument("--val_interval_ratio", default=0.2, type=float)
    p.add_argument("--train_data_path", default="", type=str)
    p.add_argument("--val_data_path", default="", type=str)
    p.add_argument("--save_model", action="store_true")
    p.add_argument("--save_path", default="", type=str)
    p.add_argument("--log_path", default="", type=str)
    p.add_argument("--alpha", default=0, type=float, help="Factor of KL loss")
    # TPU-native extras:
    p.add_argument("--vocab_path", default="./vocab/vocab.txt", type=str)
    p.add_argument("--token_emb_path", default="./vocab/token_id2emb_dict.pkl", type=str)
    p.add_argument("--gpt2_ckpt", default="", type=str,
                   help="phase-1 GPT-2 .pth/.ckpt to initialize the decoder")
    p.add_argument("--resume", action="store_true", help="resume from save_path")
    p.add_argument("--mesh_data", default=0, type=int,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--mesh_model", default=1, type=int)
    p.add_argument("--mesh_pipe", default=1, type=int,
                   help="pipeline-parallel stages (GPipe over the GPT-2 "
                        "layer stack; mutually exclusive with --mesh_model)")
    p.add_argument("--pp_microbatches", default=0, type=int,
                   help="microbatches per pipelined step (0 = 2x stages)")
    p.add_argument("--grad_accum", default=1, type=int,
                   help="split each batch into N sequential micro-chunks "
                        "(exact recombination under curriculum weights) — "
                        "effective batches beyond what HBM fits")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard the AdamW moments over the data "
                        "axis (1/dp optimizer bytes per device; GSPMD "
                        "emits the reduce-scatter/all-gather)")
    p.add_argument("--pack_sequences", action="store_true",
                   help="EXPLICITLY NON-PARITY throughput mode: drop PAD "
                        "tokens, pack samples into segment-masked rows "
                        "(mmtg_tpu.pack). Changes the objective's token "
                        "accounting (per-sample CE over real labels, not "
                        "the fixed 220 grid); eval stays parity/unpacked. "
                        "Single-mesh or data-parallel only.")
    p.add_argument("--pack_row_len", default=512, type=int,
                   help="packed row length (multiple of 128 for the "
                        "Pallas kernel). Longer rows pack more samples "
                        "each (less dead tail) but pay quadratic in-row "
                        "attention; 512 fits ~3 average lyric samples")
    p.add_argument("--pack_slots", default=8, type=int,
                   help="max samples per packed row")
    p.add_argument("--pack_rows", default=0, type=int,
                   help="rows per packed step (0 = auto: ≈ the token "
                        "budget of --batch_size parity rows)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="dump a jax.profiler (Perfetto) trace of steps 10-30")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (f32 master params either way)")
    p.add_argument("--no_remat", action="store_true",
                   help="disable GPT-2 block rematerialization")
    p.add_argument("--model_config_json", default="", type=str,
                   help="GPT-2 config JSON (reference config/model_config.json)")
    p.add_argument("--variant", default="chinese", choices=["chinese", "english"],
                   help="'english' = CLIP embeddings + byte-level-BPE GPT-2 "
                        "(reference README.md:19-20,86); --vocab_path then "
                        "points at a vocab.json+merges.txt directory")
    p.add_argument("--clip_dim", default=512, type=int,
                   help="CLIP embedding width for --variant english")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host pods")
    return p


def epoch_for_step(
    last_step: int,
    n_samples: int,
    batch_size: int,
    curriculums: Tuple[int, int],
    epochs: int,
) -> int:
    """Map a restored global step count to the epoch to resume at.

    Stage-1 epochs run at 2x batch size, so they have fewer steps
    (reference train.py:130-135). Epoch-boundary checkpoints (last_step
    == cumulative steps of epoch e) resume at epoch e+1; a mid-epoch
    step count replays its containing epoch. Returns ``epochs`` when
    training already completed."""
    cum = 0
    for e in range(epochs):
        bs = 2 * batch_size if stage_for_epoch(e, curriculums) == 1 else batch_size
        cum += math.ceil(n_samples / bs)
        if last_step < cum:
            return e
    return epochs


def parse_curriculums(s: str) -> Tuple[int, int]:
    vals = [int(x) for x in s.strip("[] ").split(",")]
    if len(vals) != 2:
        raise ValueError(f"--curriculums expects two ints, got {s!r}")
    return (vals[0], vals[1])


def load_gpt2_ckpt_into(params: Dict, path: str, mcfg: ModelConfig,
                        key: jax.Array) -> None:
    """Initialize ``params["gpt2"]`` (and, when present, the projectors)
    from ``--gpt2_ckpt``. Accepted layouts:

    - a raw **HF model directory** (``pytorch_model.bin`` or
      ``model.safetensors``) — the reference's decoder bootstrap is
      ``GPT2LMHeadModel.from_pretrained("uer/gpt2-chinese-cluecorpussmall")``
      (reference model.py:219); point this flag at a local snapshot of
      that model
    - our **phase-1 Orbax** checkpoint dir (mmtg_tpu.pretrain)
    - a torch ``.pth``/``.ckpt`` file: either the reference's phase-1
      ``GPT2_Decoder`` state dict (``gpt2.``-prefixed + projectors,
      optionally ``state_dict``-wrapped, reference model.py:345-354) or a
      raw HF ``GPT2LMHeadModel`` state dict (``transformer.``-prefixed)
    """
    from mmtg_tpu.checkpoint import _linear, import_hf_gpt2, strip_prefix

    def check_dims(gpt2):
        V, D = gpt2["wte"].shape
        if (V, D) != (mcfg.gpt2.vocab_size, mcfg.gpt2.n_embd):
            raise ValueError(
                f"--gpt2_ckpt {path} has wte [{V}, {D}] but the model "
                f"config expects [{mcfg.gpt2.vocab_size}, "
                f"{mcfg.gpt2.n_embd}]; pass the matching "
                f"--model_config_json"
            )

    if os.path.isdir(path):
        hf_bin = os.path.join(path, "pytorch_model.bin")
        hf_st = os.path.join(path, "model.safetensors")
        if os.path.exists(hf_bin) or os.path.exists(hf_st):
            # raw HF GPT2LMHeadModel snapshot directory
            if os.path.exists(hf_bin):
                import torch

                raw = torch.load(hf_bin, map_location="cpu",
                                 weights_only=False)
            else:
                from safetensors.numpy import load_file

                raw = load_file(hf_st)
            raw = strip_prefix(raw)
            if not any(k.startswith("transformer.") for k in raw):
                # GPT2Model-style save (no LM-head wrapper prefix)
                raw = {f"transformer.{k}": v for k, v in raw.items()}
            gpt2 = import_hf_gpt2(raw, mcfg.gpt2)
            check_dims(gpt2)
            params["gpt2"] = gpt2
            return
        # our phase-1 Orbax checkpoint (mmtg_tpu.pretrain)
        from mmtg_tpu.checkpoint import restore_train_state
        from mmtg_tpu.models.gpt2 import init_gpt2_params

        template = {"gpt2": init_gpt2_params(key, mcfg.gpt2)}
        restored, step = restore_train_state(path, template)
        if step < 0:
            raise FileNotFoundError(f"no checkpoint under {path}")
        params["gpt2"] = restored["gpt2"]
        return

    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in raw:
        raw = raw["state_dict"]
    raw = strip_prefix(raw)
    if any(k.startswith("transformer.") for k in raw):
        # raw HF GPT2LMHeadModel state dict saved as a single file
        gpt2 = import_hf_gpt2(raw, mcfg.gpt2)
        check_dims(gpt2)
        params["gpt2"] = gpt2
        return
    gpt2_state = {
        k[len("gpt2."):]: v for k, v in raw.items() if k.startswith("gpt2.")
    }
    params["gpt2"] = import_hf_gpt2(gpt2_state, mcfg.gpt2)
    if "projector_layer1.weight" in raw:
        params["projector1"] = _linear(raw, "projector_layer1")
        params["projector2"] = _linear(raw, "projector_layer2")


def initialize_multihost() -> None:
    """``--multihost``: join the multi-process JAX runtime.

    On a TPU pod slice the coordinator/process topology auto-detects from
    the TPU metadata (``jax.distributed.initialize()`` bare — gradient
    all-reduce then spans hosts over DCN/ICI). Generic launchers (and the
    CI smoke, tools/multihost_smoke.py) have no cluster plugin, so the
    explicit ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` env triple is honored first — the same contract as
    torch's ``MASTER_ADDR``/``WORLD_SIZE``/``RANK``. The reference has no
    multi-host story at all (single-process ``nn.DataParallel``,
    reference train.py:112-114)."""
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if num is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=int(num),
            process_id=int(pid),
            # host-local virtual CPU devices need no device filtering;
            # on GPU-style launchers JAX_LOCAL_DEVICE_IDS still applies
        )
    else:
        jax.distributed.initialize()


def main(argv=None, mcfg: Optional[ModelConfig] = None,
         dcfg: Optional[DataConfig] = None) -> float:
    """CLI entry; ``mcfg``/``dcfg`` injectable so tests can drive the full
    training loop with a tiny model on the CPU mesh."""
    args = build_arg_parser().parse_args(argv)
    if args.zero1 and args.mesh_pipe > 1:
        raise ValueError("--zero1 derives moment shardings from the "
                         "TP param layout; combine it with "
                         "--mesh_data/--mesh_model, not --mesh_pipe")
    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from mmtg_tpu.bpe import load_tokenizer
    from mmtg_tpu.data import MMTGDataset, load_token_embedding_table

    if args.multihost:
        initialize_multihost()
    logger = setup_logger(args.log_path or None)
    logger.info(str(args))
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if mcfg is None:
        if args.variant == "english":
            from mmtg_tpu.configs import english_variant

            tok = load_tokenizer(args.vocab_path)
            mcfg, en_dcfg = english_variant(
                clip_dim=args.clip_dim, gpt2_vocab=len(tok)
            )
            if dcfg is None:
                dcfg = en_dcfg
        elif args.model_config_json:
            from mmtg_tpu.configs import GPT2Config

            mcfg = ModelConfig(gpt2=GPT2Config.from_json_file(args.model_config_json))
        else:
            mcfg = ModelConfig()
    if dcfg is None:
        dcfg = DataConfig()
    curriculums = parse_curriculums(args.curriculums)
    tcfg = TrainConfig(
        batch_size=args.batch_size,
        val_batch_size=args.val_batch_size,
        epochs=args.epochs,
        lr=args.lr,
        curriculums=curriculums,
        seed=args.seed,
        log_interval=args.log_interval,
        val_interval_ratio=args.val_interval_ratio,
        alpha=args.alpha,
        dtype=args.dtype,
        remat=not args.no_remat,
        grad_accum=args.grad_accum,
    )
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        raise ValueError(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--grad_accum {args.grad_accum} (stage-1 epochs run 2x batch, "
            "which stays divisible)"
        )

    tokenizer = load_tokenizer(args.vocab_path)
    logger.info("Loading data...")
    train_data = MMTGDataset(args.train_data_path, tokenizer, dcfg, if_train=True)
    valid_data = MMTGDataset(args.val_data_path, tokenizer, dcfg, if_train=True)
    table = load_token_embedding_table(
        args.token_emb_path, len(tokenizer), dcfg.wenlan_emb_size
    )
    const = {"wenlan_table": jnp.asarray(table)}
    logger.info("Data loaded.")

    # step bookkeeping (reference train.py:138-143): stage-1 epochs run at
    # 2× batch size, so fewer steps per epoch.
    steps_1 = math.ceil(len(train_data) / (2 * tcfg.batch_size))
    steps_2 = math.ceil(len(train_data) / tcfg.batch_size)
    total_steps = (
        steps_1 * curriculums[0]
        + steps_2 * (curriculums[1] - curriculums[0])
        + steps_2 * (tcfg.epochs - curriculums[1])
    )
    warmup = int(steps_1 * tcfg.warmup_epoch_ratio)
    logger.info("Total training steps: %d", total_steps)

    key = jax.random.PRNGKey(tcfg.seed)
    params = None
    if args.gpt2_ckpt:
        logger.info("Loading pre-trained GPT2 model from %s...", args.gpt2_ckpt)
        params = init_mmtg_params(key, mcfg)
        load_gpt2_ckpt_into(params, args.gpt2_ckpt, mcfg, key)
        logger.info("Pre-trained GPT2 model loaded.")

    state, tx = create_train_state(key, mcfg, tcfg, warmup, total_steps, params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info("* number of parameters: %d", n_params)

    start_epoch = 0
    if args.resume and args.save_path:
        from mmtg_tpu.checkpoint import restore_train_state

        state, last_step = restore_train_state(
            os.path.join(args.save_path, "orbax"), state
        )
        if last_step >= 0:
            # Resume the epoch loop where the restored step left off —
            # otherwise a stage-3 model would replay curriculum stage 1
            # against an already-advanced LR schedule.
            start_epoch = epoch_for_step(
                last_step, len(train_data), tcfg.batch_size, curriculums,
                tcfg.epochs,
            )
            logger.info("Resumed from step %d (epoch %d)", last_step, start_epoch)
            if start_epoch >= tcfg.epochs:
                logger.warning(
                    "Checkpoint at step %d already covers all %d epochs; "
                    "nothing to train.", last_step, tcfg.epochs,
                )

    pp = None
    zero1_sh = None
    if args.mesh_pipe > 1:
        if args.mesh_model > 1:
            raise ValueError("--mesh_pipe and --mesh_model are mutually "
                             "exclusive (TP decode and PP train shard the "
                             "same stacked layer axis differently)")
        from mmtg_tpu.parallel.pipeline import make_dp_pp_mesh, shard_params_pp

        dp = args.mesh_data or len(jax.devices()) // args.mesh_pipe
        mesh = make_dp_pp_mesh(dp, args.mesh_pipe)
        if args.pp_microbatches:
            n_micro = args.pp_microbatches
        else:
            # largest M ≤ 2·stages dividing every per-device batch this
            # run will see (train + val; stage-1 epochs double both, so
            # divisibility carries over)
            n_micro = math.gcd(
                math.gcd(args.batch_size // dp, args.val_batch_size // dp),
                2 * args.mesh_pipe,
            ) or 1
        pp = (mesh, n_micro)
        from mmtg_tpu.parallel.pipeline import pp_param_shardings

        psh = pp_param_shardings(state.params, mesh)
        sharded = shard_params_pp(state.params, mesh)
    else:
        mesh = make_mesh(
            None
            if args.mesh_data == 0
            else (args.mesh_data, args.mesh_model)
        )
        psh = param_shardings(state.params, mesh)
        sharded = shard_params(state.params, mesh)
    opt_state = state.opt_state
    if args.zero1:
        from mmtg_tpu.parallel.mesh import zero1_opt_shardings

        zero1_sh = zero1_opt_shardings(state.opt_state, state.params, mesh)
        opt_state = jax.device_put(state.opt_state, zero1_sh)
    with mesh:
        state = TrainState(sharded, opt_state, state.step, state.rng)
        return _train_loop(
            state, tx, const, mcfg, dcfg, tcfg, train_data, valid_data,
            curriculums, args, logger, mesh, start_epoch=start_epoch, pp=pp,
            zero1_shardings=zero1_sh, param_shardings=psh,
        )


def _train_loop(
    state, tx, const, mcfg, dcfg, tcfg, train_data, valid_data, curriculums,
    args, logger, mesh, start_epoch: int = 0, pp=None, zero1_shardings=None,
    param_shardings=None,
) -> float:
    train_step = make_train_step(
        mcfg, dcfg, tcfg, tx, pp=pp, zero1_shardings=zero1_shardings,
        param_shardings=param_shardings,
    )
    eval_step = make_eval_step(mcfg, dcfg, tcfg, pp=pp)
    timer = StepTimer()
    best_val = float("inf")
    val_loss = float("inf")
    rng_np = np.random.default_rng(tcfg.seed)

    packer = None
    if getattr(args, "pack_sequences", False):
        if pp is not None:
            raise ValueError("--pack_sequences does not support pipeline "
                             "parallelism")
        if mesh is not None and dict(mesh.shape).get("model", 1) > 1:
            raise ValueError("--pack_sequences supports data parallelism "
                             "only (--mesh_model must be 1)")
        from mmtg_tpu.pack import PackedBatcher

        packer = PackedBatcher(
            train_data.arrays(), dcfg,
            row_len=args.pack_row_len, max_slots=args.pack_slots,
        )
        logger.info(
            "Sequence packing ON (non-parity objective): density %.3f "
            "(real/grid tokens), row_len %d, ≤%d samples/row",
            packer.density, args.pack_row_len, args.pack_slots,
        )

    grid_len = dcfg.topic_prompt_length + dcfg.target_length

    for epoch in range(start_epoch, tcfg.epochs):
        t1 = time.time()
        stage = stage_for_epoch(epoch, curriculums)
        # stage 1 runs 2× batch then filters (reference train.py:128-135)
        bs = 2 * tcfg.batch_size if stage == 1 else tcfg.batch_size
        vbs = 2 * tcfg.val_batch_size if stage == 1 else tcfg.val_batch_size
        if packer is not None:
            rows = args.pack_rows or max(
                8, 8 * round(bs * grid_len * packer.density
                             / args.pack_row_len / 8)
            )
            est_rows = math.ceil(
                len(train_data) * grid_len * packer.density
                / args.pack_row_len
            )
            steps_per_epoch = max(1, math.ceil(est_rows / rows))
            batch_iter = packer.batches(rows, shuffle=True, rng=rng_np)
        else:
            steps_per_epoch = math.ceil(len(train_data) / bs)
            batch_iter = train_data.batches(bs, shuffle=True, rng=rng_np)
        val_every = max(int(steps_per_epoch * tcfg.val_interval_ratio), 1)
        logger.info("Epoch %d/%d (stage %d)", epoch + 1, tcfg.epochs, stage)

        avg_loss, seen_steps, kept_total = 0.0, 0, 0.0
        for step, batch in enumerate(batch_iter):
            jb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
            if args.profile_dir and epoch == 0 and step == 10:
                jax.profiler.start_trace(args.profile_dir)
            timer.start()
            state, metrics = train_step(state, const, jb, jnp.asarray(stage))
            # device sync via host transfer (block_until_ready returns at
            # dispatch on the axon platform)
            avg_loss += float(metrics["loss"])
            kept_total += float(metrics["kept"])
            timer.stop()
            if args.profile_dir and epoch == 0 and step == 30:
                jax.profiler.stop_trace()
                logger.info("Wrote profiler trace to %s", args.profile_dir)
            seen_steps += 1
            if step > 0 and (step + 1) % tcfg.log_interval == 0:
                logger.info(
                    "Epoch: %d, Step: %d/%d, Average loss: %.6f, "
                    "p50 step: %.1f ms, samples/s: %.1f",
                    epoch + 1, step + 1, steps_per_epoch,
                    avg_loss / seen_steps, timer.p50_ms,
                    timer.throughput(
                        kept_total / seen_steps if packer is not None else bs
                    ),
                )
            if step > 0 and (step + 1) % val_every == 0:
                val_loss, _ = evaluate(
                    eval_step, state.params, const, valid_data, vbs, stage
                )
                logger.info(
                    "Epoch: %d, Step: %d/%d, Val. Loss: %.4f",
                    epoch + 1, step + 1, steps_per_epoch, val_loss,
                )
                if val_loss < best_val:
                    best_val = val_loss
                    if args.save_model and args.save_path:
                        _save(args.save_path, state, "best_val", logger)

        val_loss, _ = evaluate(eval_step, state.params, const, valid_data, vbs, stage)
        logger.info("End eval of epoch %d. Val. Loss: %.4f", epoch + 1, val_loss)
        logger.info(
            "Average loss: %.4f  Elapsed time: %s",
            avg_loss / max(seen_steps, 1), format_time(time.time() - t1),
        )
        if args.save_model and args.save_path:
            _save(args.save_path, state, f"epoch_{epoch + 1}", logger)

    logger.info("Training finished.")
    return val_loss


def _save(save_path: str, state: TrainState, tag: str, logger) -> None:
    """Two artifact streams like the reference's best_val_model.pth /
    epoch_{N}.pth (train.py:212-213, :230-231): best-val checkpoints under
    orbax_best/, epoch checkpoints under orbax/ (which --resume reads)."""
    from mmtg_tpu.checkpoint import save_train_state

    os.makedirs(save_path, exist_ok=True)
    sub = "orbax_best" if tag == "best_val" else "orbax"
    save_train_state(
        os.path.join(save_path, sub), int(state.step), jax.device_get(state)
    )
    logger.info("Saved %s checkpoint at step %d to %s/%s", tag,
                int(state.step), save_path, sub)


if __name__ == "__main__":
    main()
