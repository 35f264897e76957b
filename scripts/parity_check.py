#!/usr/bin/env python
"""One-command logits-parity harness against a reference checkpoint.

The BASELINE.md north star is bit-faithful logits vs the PyTorch
reference checkpoint (``mmtg_ckpt.pth``). This tool makes that check a
single command for the day the real checkpoint is available — and runs
end-to-end today against any reference-format ``.pth`` (e.g. one written
by ``tests/test_mmtg_parity.py``'s save path, or a synthetic one made
with ``--make-synthetic-ckpt``):

  1. import the ``.pth`` into our JAX param tree
     (``checkpoint.load_reference_checkpoint``, handles the DataParallel
     ``module.`` prefix — reference ``generate.py:188-192`` load path);
  2. load the SAME state dict into the torch side: either the rebuilt
     torch/HF oracle (``mmtg_tpu.oracle``, default) or — the stronger
     check — the reference's OWN ``model.py`` imported verbatim from the
     mount (``--oracle reference-src``, ``mmtg_tpu.ref_source``);
  3. forward fixture batches through both and print a max-abs-diff JSON
     line; exit nonzero if above ``--atol``.

Runs on CPU by default (f32, deterministic; parity is a numerics check,
not a perf check).

Usage:
  python scripts/parity_check.py --ckpt mmtg_ckpt.pth \
      --data data/final_test.pkl --vocab vocab/vocab.txt \
      --token_emb_path vocab/token_id2emb_dict.pkl
  python scripts/parity_check.py --make-synthetic-ckpt /tmp/ckpt.pth \
      --ckpt /tmp/ckpt.pth --data data/final_test.pkl ...
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="reference-format .pth")
    p.add_argument("--data", required=True, help="test/val pkl (reference schema)")
    p.add_argument("--vocab", default="vocab/vocab.txt")
    p.add_argument("--token_emb_path", default="vocab/token_id2emb_dict.pkl")
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--max_batches", default=2, type=int)
    p.add_argument("--atol", default=5e-4, type=float,
                   help="max-abs logits diff to accept (f32 accumulation "
                        "order differs between XLA and torch)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                   help="cpu (default) = deterministic f32 parity")
    p.add_argument("--oracle", default="reconstruction",
                   choices=["reconstruction", "reference-src"],
                   help="torch side: our rebuilt oracle (mmtg_tpu.oracle) "
                        "or the reference's own model.py imported from "
                        "/root/reference/src (mmtg_tpu.ref_source)")
    p.add_argument("--reference_src", default="/root/reference/src",
                   help="reference source dir for --oracle reference-src")
    p.add_argument("--branch", default="all",
                   choices=["train", "infer", "decode", "all"],
                   help="parity surface: teacher-forced train forward "
                        "(model.py:270-288), the divergent inference "
                        "branch (model.py:291-326, batch 1), and/or the "
                        "KV-cached decode step vs per-prefix re-forwards "
                        "(generate.py:117-124)")
    p.add_argument("--decode_prefix", default=26, type=int,
                   help="prefix length for the decode-step check")
    p.add_argument("--make-synthetic-ckpt", default="",
                   help="first write a random reference-format .pth here "
                        "(full-size model) so the harness can self-demo")
    args = p.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import torch

    from mmtg_tpu.checkpoint import load_reference_checkpoint
    from mmtg_tpu.configs import DataConfig, ModelConfig
    from mmtg_tpu.data import MMTGDataset, load_token_embedding_table
    from mmtg_tpu.models.mmtg import mmtg_forward_train
    from mmtg_tpu.oracle import build_oracle, oracle_forward, oracle_forward_infer
    from mmtg_tpu.tokenizer import WordPieceTokenizer

    mcfg, dcfg = ModelConfig(), DataConfig()

    if args.make_synthetic_ckpt:
        oracle = build_oracle(mcfg)
        wrapped = {"module." + k: v for k, v in oracle.state_dict().items()}
        torch.save(
            {"model": wrapped, "args": {}, "model_cfgs": {}},
            args.make_synthetic_ckpt,
        )
        print(f"wrote synthetic reference-format ckpt: {args.make_synthetic_ckpt}",
              file=sys.stderr)

    tokenizer = WordPieceTokenizer.from_file(args.vocab)
    table = load_token_embedding_table(
        args.token_emb_path, len(tokenizer), dcfg.wenlan_emb_size
    )

    # both sides from the SAME .pth
    params = load_reference_checkpoint(args.ckpt, mcfg)
    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw["model"] if isinstance(raw, dict) and "model" in raw else raw
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    if args.oracle == "reference-src":
        from mmtg_tpu import ref_source

        torch_model = ref_source.build_reference_mmtg(
            mcfg, dcfg, table, train_branch=True, src_dir=args.reference_src
        )
    else:
        torch_model = build_oracle(mcfg)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    # HF buffers (attn.bias etc.) are regenerated; real params must all load
    missing = [k for k in missing if not k.endswith((".attn.bias", ".attn.masked_bias"))]
    if missing:
        raise SystemExit(f"oracle missing params from ckpt: {missing[:5]}...")

    def torch_fwd_train(batch):
        """→ (logits np [B, prompt+T, V], kl float), dropout off."""
        if args.oracle == "reference-src":
            from mmtg_tpu import ref_source

            torch_model.train_flag = True
            logits, kl, _ = ref_source.reference_forward(torch_model, batch)
            return logits, kl
        with torch.no_grad():
            logits, kl = oracle_forward(
                torch_model, mcfg, dcfg, batch, table, mcfg.self_att_heads
            )
        return logits.numpy(), float(kl)

    def torch_fwd_infer(batch, prefix):
        """→ logits np for the inference branch on a decode prefix."""
        if args.oracle == "reference-src":
            from mmtg_tpu import ref_source

            torch_model.train_flag = False
            logits, _, _ = ref_source.reference_forward(
                torch_model, batch, targets=prefix
            )
            return logits
        with torch.no_grad():
            return oracle_forward_infer(
                torch_model, mcfg, dcfg, batch, table, prefix
            ).numpy()

    # if_train=False: test pkls carry no ratings; targets are still built
    ds = MMTGDataset(args.data, tokenizer, dcfg, if_train=False)
    const = {"wenlan_table": jnp.asarray(table)}

    report = {"ckpt": args.ckpt, "atol": args.atol, "oracle": args.oracle,
              "branches": {}}
    worst = 0.0

    if args.branch in ("train", "all"):
        results, bworst = [], 0.0
        for bi, batch in enumerate(ds.batches(args.batch_size)):
            if bi >= args.max_batches:
                break
            batch.pop("sample_mask", None)
            ref_logits, ref_kl = torch_fwd_train(batch)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            out = mmtg_forward_train(params, const, mcfg, dcfg, jb,
                                     deterministic=True)
            diff = np.abs(np.asarray(out.logits) - ref_logits)
            kl_diff = abs(float(out.kl_per_sample.mean()) - ref_kl)
            results.append(
                {"batch": bi, "max_abs_logits_diff": float(diff.max()),
                 "mean_abs_logits_diff": float(diff.mean()),
                 "kl_abs_diff": kl_diff}
            )
            bworst = max(bworst, float(diff.max()))
        report["branches"]["train"] = {
            "max_abs_logits_diff": bworst, "per_batch": results,
        }
        worst = max(worst, bworst)

    if args.branch in ("infer", "decode", "all"):
        from mmtg_tpu.configs import GenerateConfig
        from mmtg_tpu.decoding import teacher_forced_decode_logits
        from mmtg_tpu.models.mmtg import mmtg_forward_infer

        # batch 1: the reference's inference branch peeks at element 0
        batch = next(ds.batches(1))
        batch.pop("sample_mask", None)
        K = max(2, args.decode_prefix)
        tokens = np.asarray(batch["targets"])[:, :K].copy()
        tokens[:, 0] = 1  # generation seeds with a bare [#START#]
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        if args.branch in ("infer", "all"):
            ref = torch_fwd_infer(batch, tokens)
            jb_prefix = dict(jb, targets=jnp.asarray(tokens))
            out = mmtg_forward_infer(params, const, mcfg, dcfg, jb_prefix,
                                     type_id_scheme="reference_infer")
            d = float(np.abs(np.asarray(out.logits) - ref).max())
            report["branches"]["infer"] = {
                "max_abs_logits_diff": d, "prefix_len": K,
            }
            worst = max(worst, d)

        if args.branch in ("decode", "all"):
            gcfg = GenerateConfig(type_id_scheme="reference_infer",
                                  attn_impl="xla")
            ours = np.asarray(teacher_forced_decode_logits(
                params, const, mcfg, dcfg, gcfg, jb, jnp.asarray(tokens)
            ))
            d, per_prefix = 0.0, []
            for j in range(0, K, max(K // 6, 1)):
                ref = torch_fwd_infer(batch, tokens[:, : j + 1])
                dj = float(np.abs(ours[:, j] - ref[:, -1]).max())
                per_prefix.append({"prefix_len": j + 1,
                                   "max_abs_logits_diff": dj})
                d = max(d, dj)
            report["branches"]["decode"] = {
                "max_abs_logits_diff": d, "per_prefix": per_prefix,
            }
            worst = max(worst, d)

    report["max_abs_logits_diff"] = worst
    report["ok"] = ok = worst <= args.atol
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
