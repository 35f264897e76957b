#!/usr/bin/env python
"""Build a ``token_id2emb_dict.pkl`` side table from an embeddings matrix.

The reference ships its WenLan token-embedding table as a pickled
``{token_id: [2048 floats]}`` dict (reference ``model.py:221-223``,
``README.md:40-45``) but no tool to construct one. This utility converts
a dense ``[vocab, emb]`` matrix (``.npy``, e.g. exported from a
WenLan/BriVL or CLIP text encoder applied to every vocab token) into that
format, so users can build tables for their own vocab/encoder — including
the English/CLIP variant.

Usage:
  python scripts/make_token_emb_table.py --emb embs.npy \
      --vocab vocab.txt --out token_id2emb_dict.pkl
"""

import argparse
import pickle

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--emb", required=True, help="[vocab, emb_dim] .npy matrix")
    p.add_argument("--vocab", required=True, help="vocab.txt (for size check)")
    p.add_argument("--out", required=True, help="output .pkl path")
    args = p.parse_args()

    emb = np.load(args.emb)
    with open(args.vocab, encoding="utf-8") as f:
        vocab_size = sum(1 for line in f if line.strip())
    if emb.shape[0] != vocab_size:
        raise SystemExit(
            f"embedding rows ({emb.shape[0]}) != vocab size ({vocab_size})"
        )
    table = {i: emb[i].astype(np.float32).tolist() for i in range(emb.shape[0])}
    with open(args.out, "wb") as f:
        pickle.dump(table, f)
    print(f"wrote {args.out}: {emb.shape[0]} tokens × {emb.shape[1]} dims")


if __name__ == "__main__":
    main()
