"""Scaled-down quality-loop system test (full artifact:
``tools/quality_loop.py`` → ``docs/QUALITY_LOOP.json``).

Proves train→generate→eval closes end-to-end WITH LEARNING: a multi-epoch
curriculum run on a synthetic corpus must decrease val loss across a
stage transition, and generation + metrics must run from the final
checkpoint (the reference's only validation is val-loss selection,
``train.py:202-233``)."""

import json
import os


def test_quality_loop_scaled_down(tmp_path):
    from tools.quality_loop import run

    report = run(
        n_train=48,
        n_val=16,
        epochs=2,
        batch_size=8,
        out_json=str(tmp_path / "quality.json"),
        work_dir=str(tmp_path / "work"),
        gen_seeds=(7, 8),
    )
    assert report["learned"], report["val_loss_curve"]
    assert len(report["val_loss_curve"]) == 2
    # generation + metrics ran for every cache mode, across seeds
    for mode in ("model", "int8", "int4"):
        d2 = report["gen_vs_corpus"][mode]["distinct2"]
        assert 0.0 <= d2["mean"] <= 1.0
        assert len(d2["per_seed"]) == 2
    # int8 cache must stay near-identical to the fp decode on a trained
    # model (the committed full artifact measures BLEU2 1.0; allow wiggle
    # for the scaled-down run)
    assert report["cache_mode_vs_fp"]["int8"]["bleu"]["bleu2"] > 0.8
    # the divergence control exists: fp-vs-fp across seeds
    assert "seed8_vs_seed7" in report["fp_seed_divergence_control"]


def test_committed_quality_artifact_is_current():
    """docs/QUALITY_LOOP.json (the committed full-size artifact) carries
    a decreasing val curve and the cache-mode quality table."""
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "QUALITY_LOOP.json")
    with open(path, encoding="utf-8") as f:
        rep = json.load(f)
    assert rep["learned"]
    curve = rep["val_loss_curve"]
    assert curve[-1] < curve[0]
    assert rep["cache_mode_vs_fp"]["int8"]["bleu"]["bleu2"] >= 0.99
    assert rep["cache_mode_vs_fp"]["int4"]["bleu"]["bleu2"] >= 0.5
