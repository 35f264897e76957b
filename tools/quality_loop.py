"""Quality-loop system test: full 5-epoch curriculum → generate → eval.

Closes the train→generate→eval loop END TO END with actual learning, on
the CI CPU mesh (no TPU needed): a few-hundred-sample synthetic corpus,
the reference's canonical 5-epoch curriculum schedule (``train.sh:2-6``:
curriculums [1,3] — stage 1 → 2 at epoch 1, → 3 at epoch 3), val-loss
tracked across stage transitions (the reference's only validation,
``train.py:202-233``), generation from the final checkpoint, and
BLEU/distinct metrics from ``mmtg_tpu.eval``.

Also quantifies CACHE-MODE QUALITY: the same prompts and seeds decoded
with model/int8/int4 KV caches; reports cross-mode BLEU (int8/int4
hypotheses scored against the full-precision decode) and distinct-n so
``--cache_dtype`` precision is a measured statement, not an assertion.

Writes ``docs/QUALITY_LOOP.json``. Run: ``python tools/quality_loop.py``
(~4 min CPU). A scaled-down version runs in CI (tests/test_quality_loop.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LYRICS_POOL = [
    "青山一道同云雨",
    "明月何曾是两乡",
    "海内存知己",
    "天涯若比邻",
    "长风破浪会有时",
    "直挂云帆济沧海",
    "会当凌绝顶",
    "一览众山小",
]

# --variant english: the same loop at English-variant settings (byte-level
# BPE vocab trained on this pool, CLIP-sized embeddings, english_variant()
# dims). BLEU stays char-level (eval.tokenize_lyric) — consistent between
# hypothesis and reference, which is what cross-mode deltas need.
ENGLISH_POOL = [
    "city lights are calling out my name tonight",
    "we dance until the morning sun comes up",
    "every heartbeat echoes down the empty street",
    "hold me closer while the music plays",
    "summer rain keeps falling on my mind",
    "chasing shadows through the neon glow",
    "your voice is like a melody i know",
    "we were young and running with the wind",
]


def run(
    n_train: int = 240,
    n_val: int = 32,
    epochs: int = 5,
    batch_size: int = 16,
    out_json: str = "docs/QUALITY_LOOP.json",
    seed: int = 0,
    work_dir: str = "/tmp/mmtg_quality_loop",
    gen_seeds: tuple = (7, 8, 9),
    variant: str = "chinese",
) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmtg_tpu.configs import (
        ChannelConfig,
        DataConfig,
        GenerateConfig,
        GPT2Config,
        ModelConfig,
    )
    from mmtg_tpu.data import make_synthetic_records

    os.makedirs(work_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    variant_flags = []
    if variant == "english":
        # english_variant() dims at CI scale: BPE vocab trained on the
        # fixture pool, CLIP-sized (64-d here) embeddings
        from mmtg_tpu.bpe import train_bpe
        from mmtg_tpu.configs import english_variant

        tok = train_bpe(ENGLISH_POOL, vocab_size=600)
        vocab = os.path.join(work_dir, "bpe_vocab")
        tok.save(vocab)
        vocab_size = len(tok)
        mcfg, dcfg = english_variant(clip_dim=64, gpt2_vocab=vocab_size)
        mcfg = dataclasses.replace(
            mcfg,
            topic=dataclasses.replace(mcfg.topic, hidden_dim=32),
            image=dataclasses.replace(mcfg.image, hidden_dim=32),
            text=dataclasses.replace(mcfg.text, hidden_dim=32),
            self_att_hidden_size=32,
            gpt2=GPT2Config(vocab_size=vocab_size, n_positions=256,
                            n_ctx=250, n_embd=64, n_layer=2, n_head=4),
        )
        pool = ENGLISH_POOL
        variant_flags = ["--variant", "english", "--clip_dim", "64"]
    else:
        # CI-sized but fully wired model (2L GPT-2); real vocab
        vocab_size = 13317
        dcfg = DataConfig(wenlan_emb_size=64)
        mcfg = ModelConfig(
            topic=ChannelConfig(input_dim=64, hidden_dim=32, type="MLP"),
            image=ChannelConfig(input_dim=64, hidden_dim=32),
            text=ChannelConfig(input_dim=64, hidden_dim=32),
            self_att_hidden_size=32,
            self_att_heads=4,
            mm_att_out_dim=64,
            gpt2=GPT2Config(vocab_size=vocab_size, n_positions=256,
                            n_ctx=250, n_embd=64, n_layer=2, n_head=4),
        )
        pool = LYRICS_POOL
        vocab = os.path.join(os.path.dirname(__file__), "..", "vocab",
                             "vocab.txt")

    # corpus: ratings spanning 1-5 so every curriculum stage keeps samples
    train_recs = make_synthetic_records(
        n_train, rng, emb_size=64, lyrics_pool=pool
    )
    val_recs = make_synthetic_records(
        n_val, rng, emb_size=64, lyrics_pool=pool
    )
    test_recs = make_synthetic_records(
        4, rng, emb_size=64, lyrics_pool=pool
    )
    ref_lines = ["，".join(r["lyrics"]) for r in test_recs]
    for r in test_recs:
        r.pop("rating")
    paths = {}
    for name, recs in [("train", train_recs), ("val", val_recs),
                       ("test", test_recs)]:
        paths[name] = os.path.join(work_dir, f"{name}.pkl")
        with open(paths[name], "wb") as f:
            pickle.dump(recs, f)
    emb_path = os.path.join(work_dir, "emb.pkl")
    with open(emb_path, "wb") as f:
        pickle.dump({i: rng.standard_normal(64).astype(np.float32)
                     for i in range(vocab_size)}, f)

    # ---- 5-epoch curriculum train (reference train.sh schedule) ----------
    from mmtg_tpu.train import main as train_main

    save = os.path.join(work_dir, "ckpt")
    log = os.path.join(work_dir, "train.log")
    for p in (log,):
        if os.path.exists(p):
            os.remove(p)
    final_val = train_main(
        [
            "--batch_size", str(batch_size), "--val_batch_size", "16",
            "--epochs", str(epochs), "--lr", "3e-4",
            "--curriculums", "[1,3]", "--log_interval", "5",
            "--val_interval_ratio", "0.5",
            "--train_data_path", paths["train"],
            "--val_data_path", paths["val"],
            "--vocab_path", vocab, "--token_emb_path", emb_path,
            "--save_model", "--save_path", save, "--log_path", log,
            "--alpha", "0.2", "--dtype", "float32",
            "--mesh_data", "1", "--mesh_model", "1",
        ] + variant_flags,
        mcfg=mcfg,
        dcfg=dcfg,
    )

    # per-epoch end-of-epoch val losses from the training log
    val_curve = []
    with open(log, encoding="utf-8") as f:
        for line in f:
            m = re.search(r"End eval of epoch (\d+)\. Val\. Loss: ([0-9.]+)", line)
            if m:
                val_curve.append(float(m.group(2)))
    assert len(val_curve) == epochs, (len(val_curve), epochs)

    # learning across stage transitions: final < first, and the loss at
    # each stage boundary improves on the first epoch of that stage's
    # predecessor
    learned = val_curve[-1] < val_curve[0]

    # ---- generate from the final checkpoint: cache modes × seeds ---------
    # Multiple seeds serve two purposes: (a) the across-seed spread of each
    # mode's corpus metrics is the fixture's noise floor, so a quantized
    # mode's corpus-BLEU delta can be read against it; (b) fp-vs-fp across
    # seeds is the DIVERGENCE CONTROL — temp-1.1/top-k sampling is chaotic,
    # so two fp trajectories from different seeds disagree too, and a
    # quantized mode's same-seed BLEU-vs-fp must be compared to that scale
    # (not to 1.0) before calling it degradation.
    from mmtg_tpu.eval import corpus_bleu, distinct_n, tokenize_lyric
    from mmtg_tpu.generate import main as generate_main

    seeds = list(gen_seeds)
    outs = {}  # mode -> {seed -> lines}
    modes = {
        "model": [],
        "int8": ["--cache_dtype", "int8"],
        "int4": ["--cache_dtype", "int4"],
        # the serving-default candidate: int8 cache + weight-only int8
        "int8_w8": ["--cache_dtype", "int8", "--weight_dtype", "int8"],
        # recall-0.99 approx top-k — the measured English-vocab serving
        # lever (+16% at 50,257, docs/PERF.md); quantify its quality cost
        "topk_approx": ["--topk_impl", "approx"],
    }
    for mode, extra in modes.items():
        outs[mode] = {}
        for s in seeds:
            out_path = os.path.join(work_dir, f"samples_{mode}_s{s}.txt")
            generate_main(
                [
                    "--data_path", paths["test"], "--model_path", save,
                    "--tokenizer_path", vocab, "--token_emb_path", emb_path,
                    "--batch_size", "8", "--n_samples", "2", "--seed", str(s),
                    "--save_samples", "--save_samples_path", out_path,
                ] + variant_flags + extra,
                mcfg=mcfg,
                dcfg=dcfg,
            )
            with open(out_path, encoding="utf-8") as f:
                outs[mode][s] = [l.rstrip("\n") for l in f]

    def metrics_for(lines, ref_lines_for_bleu):
        hyps = [tokenize_lyric(l) for l in lines]
        k = len(lines) // len(ref_lines_for_bleu)
        refs = [[tokenize_lyric(r)] for r in ref_lines_for_bleu for _ in range(k)]
        return {
            "bleu": corpus_bleu(hyps, refs, max_n=2),
            "distinct1": distinct_n(hyps, 1),
            "distinct2": distinct_n(hyps, 2),
        }

    def mean_std(vals):
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
                "per_seed": [float(v) for v in vals]}

    def corpus_summary(mode):
        per_seed = [metrics_for(outs[mode][s], ref_lines) for s in seeds]
        return {
            "bleu2": mean_std([m["bleu"]["bleu2"] for m in per_seed]),
            "distinct2": mean_std([m["distinct2"] for m in per_seed]),
            f"seed{seeds[0]}_full": per_seed[0],
        }

    report = {
        "config": {
            "n_train": n_train, "epochs": epochs, "batch_size": batch_size,
            "curriculums": [1, 3],
            "model": f"2L/4H/64d GPT-2, vocab {vocab_size}",
            "variant": variant,
            "gen_seeds": seeds,
            # honesty marker: no lyric corpus or WenLan embeddings exist
            # in this environment, so the loop learns/evaluates on
            # synthetic fixtures — it certifies the PIPELINE (learning
            # happens, quantized modes track fp), not lyric quality
            "data": "synthetic fixtures (data.make_synthetic_records); "
                    "no real corpus available in this environment",
        },
        "val_loss_curve": val_curve,
        "final_val_loss": float(final_val),
        "learned": bool(learned),
        # corpus-side quality per mode: mean±std over seeds — the std IS
        # the fixture noise floor for reading cross-mode deltas
        "gen_vs_corpus": {m: corpus_summary(m) for m in outs},
        # cache-mode similarity: quantized decode scored against the
        # full-precision decode of the SAME prompts and seed
        "cache_mode_vs_fp": {
            m: metrics_for(outs[m][seeds[0]], outs["model"][seeds[0]])
            for m in ("int8", "int4", "int8_w8", "topk_approx")
        },
        # divergence control: fp-vs-fp across seeds — the BLEU scale that
        # pure sampling-trajectory divergence produces with IDENTICAL
        # numerics; a quantized mode's vs-fp BLEU at or above this level
        # indicates divergence, not degradation
        "fp_seed_divergence_control": {
            f"seed{s}_vs_seed{seeds[0]}": metrics_for(
                outs["model"][s], outs["model"][seeds[0]]
            )["bleu"]["bleu2"]
            for s in seeds[1:]
        },
    }
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(json.dumps(report, indent=2, ensure_ascii=False))
    return report


def run_pack_ab(
    n_train: int = 240,
    n_val: int = 32,
    epochs: int = 3,
    batch_size: int = 16,
    out_json: str = "docs/QUALITY_LOOP_PACK.json",
    seed: int = 0,
    work_dir: str = "/tmp/mmtg_quality_pack",
) -> dict:
    """Packing quality check: the SAME synthetic corpus trained twice —
    parity vs ``--pack_sequences`` — with the (always-parity, unpacked)
    validation loss as the common yardstick. Packing changes the train
    objective's token accounting (mmtg_tpu/pack.py contract); this loop
    verifies the packed objective still LEARNS the parity-measured task
    (falling val loss, final within range of parity's)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mmtg_tpu.configs import ChannelConfig, DataConfig, GPT2Config, ModelConfig
    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.train import main as train_main

    os.makedirs(work_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab_size = 13317
    dcfg = DataConfig(wenlan_emb_size=64)
    mcfg = ModelConfig(
        topic=ChannelConfig(input_dim=64, hidden_dim=32, type="MLP"),
        image=ChannelConfig(input_dim=64, hidden_dim=32),
        text=ChannelConfig(input_dim=64, hidden_dim=32),
        self_att_hidden_size=32,
        self_att_heads=4,
        mm_att_out_dim=64,
        gpt2=GPT2Config(vocab_size=vocab_size, n_positions=256,
                        n_ctx=250, n_embd=64, n_layer=2, n_head=4),
    )
    vocab = os.path.join(os.path.dirname(__file__), "..", "vocab",
                         "vocab.txt")
    paths = {}
    for name, n in [("train", n_train), ("val", n_val)]:
        recs = make_synthetic_records(n, rng, emb_size=64,
                                      lyrics_pool=LYRICS_POOL)
        paths[name] = os.path.join(work_dir, f"{name}.pkl")
        with open(paths[name], "wb") as f:
            pickle.dump(recs, f)
    emb_path = os.path.join(work_dir, "emb.pkl")
    with open(emb_path, "wb") as f:
        pickle.dump({i: rng.standard_normal(64).astype(np.float32)
                     for i in range(vocab_size)}, f)

    def train_once(tag, extra):
        log = os.path.join(work_dir, f"train_{tag}.log")
        if os.path.exists(log):
            os.remove(log)
        final_val = train_main(
            [
                "--batch_size", str(batch_size), "--val_batch_size", "16",
                "--epochs", str(epochs), "--lr", "3e-4",
                "--curriculums", "[0,0]", "--log_interval", "5",
                "--val_interval_ratio", "1.0",
                "--train_data_path", paths["train"],
                "--val_data_path", paths["val"],
                "--vocab_path", vocab, "--token_emb_path", emb_path,
                "--log_path", log, "--alpha", "0.2", "--dtype", "float32",
                "--mesh_data", "1", "--mesh_model", "1",
            ] + extra,
            mcfg=mcfg,
            dcfg=dcfg,
        )
        curve = []
        with open(log, encoding="utf-8") as f:
            for line in f:
                m = re.search(
                    r"End eval of epoch (\d+)\. Val\. Loss: ([0-9.]+)", line)
                if m:
                    curve.append(float(m.group(2)))
        return float(final_val), curve

    parity_final, parity_curve = train_once("parity", [])
    packed_final, packed_curve = train_once(
        "packed", ["--pack_sequences", "--pack_row_len", "256"])
    report = {
        "config": {"n_train": n_train, "epochs": epochs,
                   "batch_size": batch_size,
                   "note": "synthetic fixtures; val loss is the PARITY "
                           "objective for both runs (eval is never "
                           "packed), so the curves are comparable"},
        "parity": {"final_val": parity_final, "val_curve": parity_curve},
        "packed": {"final_val": packed_final, "val_curve": packed_curve},
        "both_learned": bool(parity_curve[-1] < parity_curve[0]
                             and packed_curve[-1] < packed_curve[0]),
    }
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="chinese",
                    choices=["chinese", "english"])
    ap.add_argument("--pack_ab", action="store_true",
                    help="run the parity-vs-packed training A/B instead "
                         "of the full quality loop")
    a = ap.parse_args()
    if a.pack_ab:
        run_pack_ab()
        sys.exit(0)
    run(
        variant=a.variant,
        out_json=("docs/QUALITY_LOOP_EN.json" if a.variant == "english"
                  else "docs/QUALITY_LOOP.json"),
        work_dir=f"/tmp/mmtg_quality_loop_{a.variant}",
    )
