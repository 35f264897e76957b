"""Interactive REPL (reference ``predict.py:147-272`` parity).

Prompts for a test-set index, prints the topic and ``n_samples`` sampled
lyrics. The reference's disabled embedding-swap probe (``predict.py:244-268``,
dead behind ``while 0:``) is implemented for real behind ``--swap_probe``:
it swaps the image/text embeddings of two steps and regenerates, testing
the model's sensitivity to experience order. Also fixes the reference's
fatal import of the nonexistent ``EXPTeller`` (``predict.py:25``).
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
from mmtg_tpu.decoding import generate as generate_batch
from mmtg_tpu.decoding import postprocess_tokens
from mmtg_tpu.generate import load_params, replicate_batch


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MMTG TPU interactive REPL")
    p.add_argument("--device_ids", default="0,1", type=str, help="parity no-op")
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--model_path", default="", type=str)
    p.add_argument("--tokenizer_path", default="", type=str)
    p.add_argument("--token_emb_path", default="./vocab/token_id2emb_dict.pkl", type=str)
    p.add_argument("--temperature", default=1.1, type=float)
    p.add_argument("--topk", default=10, type=int)
    p.add_argument("--topp", default=0.7, type=float)
    p.add_argument("--repetition_penalty", default=1.5, type=float)
    p.add_argument("--n_samples", default=5, type=int)
    p.add_argument("--cache_dtype", default="auto",
                   choices=["auto", "model", "int8", "int4"])
    p.add_argument("--weight_dtype", default="auto",
                   choices=["auto", "model", "int8"],
                   help="decode-matmul weight precision; 'auto' → int8 at "
                        "REPL batch sizes (n_samples <= 32: the "
                        "weight-read-bound latency regime)")
    p.add_argument("--topk_impl", default="exact", choices=["exact", "approx"])
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "pallas", "fused", "xla"],
                   help="decode attention: per-layer Pallas kernels, the "
                        "whole-step megakernel, or XLA")
    p.add_argument("--swap_probe", action="store_true",
                   help="also generate with two experience steps swapped")
    p.add_argument("--swap_steps", default="1,3", type=str)
    return p


def _swap_steps(row: Dict[str, np.ndarray], i: int, j: int) -> Dict[str, np.ndarray]:
    out = {k: np.array(v) for k, v in row.items()}
    for key in ("img_embs", "r_embs"):
        out[key][[i, j]] = out[key][[j, i]]
    return out


def main(argv=None) -> None:
    args = build_arg_parser().parse_args(argv)
    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from mmtg_tpu.bpe import load_tokenizer
    from mmtg_tpu.data import MMTGDataset, load_token_embedding_table

    mcfg, dcfg = ModelConfig(), DataConfig()
    gcfg = GenerateConfig(
        temperature=args.temperature,
        top_k=args.topk,
        top_p=args.topp,
        repetition_penalty=args.repetition_penalty,
        length=dcfg.max_seq_length,
        cache_dtype=args.cache_dtype,
        weight_dtype=args.weight_dtype,
        topk_impl=args.topk_impl,
        attn_impl=args.attn_impl,
    )
    tokenizer = load_tokenizer(args.tokenizer_path)
    params = load_params(args.model_path, mcfg)
    const = {
        "wenlan_table": jnp.asarray(
            load_token_embedding_table(
                args.token_emb_path, len(tokenizer), dcfg.wenlan_emb_size
            )
        )
    }
    test_data = MMTGDataset(args.data_path, tokenizer, dcfg, if_train=False)
    print(f"Loaded {len(test_data)} test rows. Enter an index (or 'q' to quit).")

    rng = jax.random.PRNGKey(args.seed)
    swap_i, swap_j = (int(x) for x in args.swap_steps.split(","))

    def show(row, label):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        batch = replicate_batch([row], args.n_samples)
        toks = np.asarray(generate_batch(params, const, mcfg, dcfg, gcfg, batch, sub))
        for r in range(args.n_samples):
            print(f"  [{label} {r}] {postprocess_tokens(toks[r], tokenizer)}")

    while True:
        try:
            raw = input("idx> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if raw.lower() in ("q", "quit", "exit"):
            break
        if not raw.isdigit() or int(raw) >= len(test_data):
            print(f"Please enter an index in [0, {len(test_data)}).")
            continue
        idx = int(raw)
        row = test_data[idx]
        print(f"topic: {test_data.topics[idx]}")
        show(row, "sample")
        if args.swap_probe:
            print(f"— swap probe: steps {swap_i} ↔ {swap_j} —")
            show(_swap_steps(row, swap_i, swap_j), "swapped")


if __name__ == "__main__":
    main()
