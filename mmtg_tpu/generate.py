"""Batch generation CLI (reference ``generate.py:149-244`` parity).

Same flags and file-to-file behavior, but the decode itself is the batched
KV-cached engine: instead of ``len(test) × n_samples`` sequential batch-1
loops of 220 full re-forwards each (reference ``generate.py:205-221``),
every test row is replicated ``n_samples`` times and whole batches decode
in one compiled program. Fixes inherited latent bugs consciously: the
reference's ``MMTG(model_cfgs, vocab, False)`` missing-``data_config``
crash (``generate.py:189``) and the missing line-continuation in
``generate.sh:15`` have no analogue here.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
from mmtg_tpu.decoding import generate as generate_batch
from mmtg_tpu.decoding import postprocess_tokens
from mmtg_tpu.utils.logging import setup_logger


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MMTG TPU batch generator")
    p.add_argument("--device_ids", default="0,1", type=str, help="parity no-op")
    p.add_argument("--CUDA_VISIBLE_DEVICES", default="0,1", type=str, help="parity no-op")
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--num_workers", default=8, type=int, help="parity no-op")
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--model_path", default="", type=str,
                   help=".pth reference ckpt or an Orbax save_path dir")
    p.add_argument("--tokenizer_path", default="", type=str)
    p.add_argument("--token_emb_path", default="./vocab/token_id2emb_dict.pkl", type=str)
    p.add_argument("--temperature", default=1.1, type=float)
    p.add_argument("--topk", default=10, type=int)
    p.add_argument("--topp", default=0.7, type=float)
    p.add_argument("--repetition_penalty", default=1.5, type=float)
    p.add_argument("--n_samples", default=10, type=int)
    p.add_argument("--save_samples", action="store_true")
    p.add_argument("--save_samples_path", default="", type=str)
    p.add_argument("--type_id_scheme", default="train",
                   choices=["train", "reference_infer"])
    p.add_argument("--cache_dtype", default="auto",
                   choices=["auto", "model", "int8", "int4"],
                   help="KV cache precision; 'auto' resolves ONCE per run "
                        "from the batch size (full precision at batch 1 "
                        "where the int8 quantize/dequant ops are pure "
                        "overhead, int8 otherwise — halves decode HBM "
                        "traffic at larger batches)")
    p.add_argument("--weight_dtype", default="auto",
                   choices=["auto", "model", "int8"],
                   help="decode-matmul weight precision; 'auto' resolves "
                        "ONCE per run from the batch size (int8 when "
                        "batch_size <= 32 — the weight-read-bound latency "
                        "regime — else model), so every batch of the run "
                        "samples identically")
    p.add_argument("--topk_impl", default="exact", choices=["exact", "approx"],
                   help="top-k sampling: exact (reference semantics) or the "
                        "TPU's approx partial-reduce (recall 0.99)")
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "pallas", "fused", "xla"],
                   help="decode attention: per-layer Pallas kernels (default "
                        "on TPU), the whole-step megakernel ('fused', int8 "
                        "cache only), or XLA")
    p.add_argument("--variant", default="chinese", choices=["chinese", "english"],
                   help="'english' = CLIP embeddings + byte-level-BPE GPT-2 "
                        "(reference README.md:19-20,86); --tokenizer_path then "
                        "points at a vocab.json+merges.txt directory")
    p.add_argument("--clip_dim", default=512, type=int,
                   help="CLIP embedding width for --variant english")
    p.add_argument("--mesh_data", default=1, type=int,
                   help="data-parallel decode shards (0 = all devices / "
                        "mesh_model). >1 or with --mesh_model >1 the batch "
                        "decodes via generate_sharded over a (data, model) "
                        "mesh — per-row PRNG streams make the outputs "
                        "invariant to the mesh shape (the TPU answer to the "
                        "reference's nn.DataParallel, generate.py:191)")
    p.add_argument("--mesh_model", default=1, type=int,
                   help="tensor-parallel shards within each data shard "
                        "(Megatron-style sharded GPT-2 decode)")
    return p


def load_params(model_path: str, mcfg: ModelConfig):
    """Load either a reference ``.pth`` or one of our Orbax checkpoints."""
    if model_path.endswith((".pth", ".ckpt", ".pt")):
        from mmtg_tpu.checkpoint import load_reference_checkpoint

        return load_reference_checkpoint(model_path, mcfg)
    from mmtg_tpu.checkpoint import restore_train_state
    from mmtg_tpu.configs import TrainConfig
    from mmtg_tpu.train import create_train_state

    key = jax.random.PRNGKey(0)
    template, _ = create_train_state(key, mcfg, TrainConfig(), 1, 1)
    if os.path.basename(model_path).startswith("orbax"):
        candidates = [model_path]
    else:
        # prefer the best-val stream when present (reference loads
        # best_val_model.pth by convention)
        candidates = [
            os.path.join(model_path, "orbax_best"),
            os.path.join(model_path, "orbax"),
        ]
    for ckpt_dir in candidates:
        state, step = restore_train_state(ckpt_dir, template)
        if step >= 0:
            return state.params
    raise FileNotFoundError(f"no checkpoint under {candidates}")


def replicate_batch(rows: List[Dict[str, np.ndarray]], n_samples: int) -> Dict:
    """Stack test rows, each repeated ``n_samples`` times."""
    keys = ("topic_ids", "tpw_attention_mask", "tpw_type_ids",
            "topic_emb", "img_embs", "r_embs")
    return {
        k: jnp.asarray(np.repeat(np.stack([r[k] for r in rows]), n_samples, axis=0))
        for k in keys
    }


def main(argv=None, mcfg: ModelConfig | None = None,
         dcfg: DataConfig | None = None) -> None:
    """CLI entry; ``mcfg``/``dcfg`` injectable so tests can drive the
    full pipeline with a tiny model on the CPU mesh."""
    args = build_arg_parser().parse_args(argv)
    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from mmtg_tpu.bpe import load_tokenizer
    from mmtg_tpu.data import MMTGDataset, load_token_embedding_table

    logger = setup_logger()
    if mcfg is None or dcfg is None:
        if args.variant == "english":
            from mmtg_tpu.configs import english_variant

            tok = load_tokenizer(args.tokenizer_path)
            mcfg, dcfg = english_variant(
                clip_dim=args.clip_dim, gpt2_vocab=len(tok)
            )
        else:
            mcfg, dcfg = ModelConfig(), DataConfig()
    # 'auto' weights/cache resolve ONCE per run from the nominal batch
    # size so every batch of the run samples with identical numerics
    # (decoding.resolve_weight_dtype would otherwise flip at B=32,
    # resolve_cache_dtype at B=1).
    weight_dtype = args.weight_dtype
    if weight_dtype == "auto":
        weight_dtype = "int8" if args.batch_size <= 32 else "model"
    cache_dtype = args.cache_dtype
    if cache_dtype == "auto":
        # the decode batch is rows_per_batch × n_samples, padded static;
        # ANY meshed run resolves full precision (the outputs must not
        # depend on the mesh shape and the int8 cache's shard-local
        # scales are not TP-invariant — decoding.resolve_cache_dtype)
        decode_b = max(args.batch_size // args.n_samples, 1) * args.n_samples
        meshed = args.mesh_data != 1 or args.mesh_model != 1
        cache_dtype = "model" if decode_b <= 1 or meshed else "int8"
    gcfg = GenerateConfig(
        batch_size=args.batch_size,
        seed=args.seed,
        temperature=args.temperature,
        top_k=args.topk,
        top_p=args.topp,
        repetition_penalty=args.repetition_penalty,
        n_samples=args.n_samples,
        length=dcfg.max_seq_length,
        type_id_scheme=args.type_id_scheme,
        cache_dtype=cache_dtype,
        weight_dtype=weight_dtype,
        topk_impl=args.topk_impl,
        attn_impl=args.attn_impl,
    )

    mesh = None
    if args.mesh_data != 1 or args.mesh_model != 1:
        from mmtg_tpu.parallel.mesh import make_mesh

        dp = args.mesh_data or max(len(jax.devices()) // args.mesh_model, 1)
        mesh = make_mesh((dp, args.mesh_model))
        decode_batch = max(args.batch_size // args.n_samples, 1) * args.n_samples
        if decode_batch % dp:
            raise ValueError(
                f"decode batch {decode_batch} (batch_size // n_samples * "
                f"n_samples) must divide over the data axis ({dp}); "
                f"adjust --batch_size"
            )
        logger.info("Decoding on a (%d, %d) (data, model) mesh", dp,
                    args.mesh_model)

    tokenizer = load_tokenizer(args.tokenizer_path)
    test_data = MMTGDataset(args.data_path, tokenizer, dcfg, if_train=False)
    logger.info("Data test loaded: %d rows × %d samples", len(test_data),
                args.n_samples)
    if len(test_data) == 0:
        logger.warning("Empty test set %s — nothing to generate.", args.data_path)
        return

    params = load_params(args.model_path, mcfg)
    logger.info("Loaded model from %s", args.model_path)
    table = jnp.asarray(
        load_token_embedding_table(args.token_emb_path, len(tokenizer),
                                   dcfg.wenlan_emb_size)
    )
    const = {"wenlan_table": table}

    rows_per_batch = max(args.batch_size // args.n_samples, 1)
    rng = jax.random.PRNGKey(args.seed)
    outputs: List[str] = []
    t0 = time.time()
    tokens_generated = 0
    for lo in range(0, len(test_data), rows_per_batch):
        rows = [test_data[i] for i in range(lo, min(lo + rows_per_batch, len(test_data)))]
        # pad the final batch to static shape
        n_pad = rows_per_batch - len(rows)
        batch = replicate_batch(rows + [rows[-1]] * n_pad, args.n_samples)
        if mesh is not None:
            # Per-sample PRNG streams keyed on the GLOBAL sample index:
            # tokens depend only on (seed, global index), so the outputs
            # are identical across mesh shapes (and match any future
            # re-bucketing of the run) — decoding.generate_sharded's
            # row_seeds contract (tests/test_sharding.py).
            from mmtg_tpu.decoding import generate_sharded

            base = lo * args.n_samples
            seeds = jnp.arange(
                base, base + rows_per_batch * args.n_samples, dtype=jnp.int32
            )
            toks = np.asarray(generate_sharded(
                params, const, mcfg, dcfg, gcfg, batch, rng, mesh,
                row_seeds=seeds,
            ))
        else:
            rng, sub = jax.random.split(rng)
            toks = np.asarray(
                generate_batch(params, const, mcfg, dcfg, gcfg, batch, sub))
        tokens_generated += toks.shape[0] * gcfg.length
        for r in range(len(rows) * args.n_samples):
            # one sample per output line: byte-level BPE vocabs can decode
            # to literal line breaks (newline bytes, \x85, U+2028, ...),
            # which would split a sample across lines in save_samples_path
            text = postprocess_tokens(toks[r], tokenizer)
            outputs.append(" ".join(text.splitlines()) if text else text)
    dt = time.time() - t0
    logger.info("Generated %d sequences (%.1f tokens/s) in %.1fs",
                len(outputs), tokens_generated / dt, dt)

    if args.save_samples and args.save_samples_path:
        os.makedirs(os.path.dirname(args.save_samples_path) or ".", exist_ok=True)
        with open(args.save_samples_path, "w", encoding="utf-8") as f:
            for line in outputs:
                f.write(line + "\n")
        logger.info("Wrote %s", args.save_samples_path)
    else:
        for line in outputs[: 3 * args.n_samples]:
            print(line)


if __name__ == "__main__":
    main()
