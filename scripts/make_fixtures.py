#!/usr/bin/env python
"""Generate deterministic demo/test fixtures so a fresh clone runs the
full train → generate → evaluate loop with no external data.

Writes (all seeded, reproducible):
  data/train_data_with_ratings.pkl  (32 rated records)
  data/val_data_with_ratings.pkl    (8 rated records)
  data/final_test.pkl               (4 unrated records)
  vocab/token_id2emb_dict.pkl       ({token_id: [2048 floats]} side table,
                                     reference model.py:221-223 schema,
                                     ~109MB — generated, never committed)

The record schema matches the reference pkl contract (MyDataset.py:34-60,
README.md:47-78). Real-data users instead point the CLIs at their own
pkls and build the embedding table with scripts/make_token_emb_table.py.

Usage: python scripts/make_fixtures.py [--root .] [--skip-emb-table]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=".", help="repo root to write under")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--skip-emb-table", action="store_true",
                   help="skip the ~109MB token_id2emb_dict.pkl")
    p.add_argument("--vocab_size", default=13317, type=int)
    p.add_argument("--emb_size", default=2048, type=int)
    args = p.parse_args()

    from mmtg_tpu.data import make_synthetic_records

    rng = np.random.default_rng(args.seed)
    data_dir = os.path.join(args.root, "data")
    os.makedirs(data_dir, exist_ok=True)

    for name, n, train in [
        ("train_data_with_ratings.pkl", 32, True),
        ("val_data_with_ratings.pkl", 8, True),
        ("final_test.pkl", 4, False),
    ]:
        recs = make_synthetic_records(n, rng, emb_size=args.emb_size)
        if not train:
            for r in recs:
                r.pop("rating", None)
        path = os.path.join(data_dir, name)
        with open(path, "wb") as f:
            pickle.dump(recs, f)
        print(f"wrote {path} ({n} records)")

    if not args.skip_emb_table:
        out = os.path.join(args.root, "vocab", "token_id2emb_dict.pkl")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        emb_rng = np.random.default_rng(args.seed + 1)
        table = {
            i: emb_rng.standard_normal(args.emb_size).astype(np.float32)
            for i in range(args.vocab_size)
        }
        with open(out, "wb") as f:
            pickle.dump(table, f)
        print(f"wrote {out} ({args.vocab_size} x {args.emb_size})")


if __name__ == "__main__":
    main()
