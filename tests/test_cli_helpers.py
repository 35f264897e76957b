"""CLI helper units: batch replication, checkpoint-path dispatch, arg
parsers — the glue the e2e drive exercises but can't isolate."""

import numpy as np
import pytest

from mmtg_tpu.generate import build_arg_parser as gen_parser
from mmtg_tpu.generate import load_params, replicate_batch
from mmtg_tpu.predict import _swap_steps
from mmtg_tpu.predict import build_arg_parser as pred_parser


def test_replicate_batch_order():
    rows = [
        {
            "topic_ids": np.full(3, i),
            "tpw_attention_mask": np.ones(3),
            "tpw_type_ids": np.ones(3),
            "topic_emb": np.full(4, i, np.float32),
            "img_embs": np.zeros((5, 4), np.float32),
            "r_embs": np.zeros((5, 4), np.float32),
        }
        for i in range(2)
    ]
    out = replicate_batch(rows, n_samples=3)
    ids = np.asarray(out["topic_ids"])[:, 0]
    # row-major: each row repeated n_samples times consecutively
    np.testing.assert_array_equal(ids, [0, 0, 0, 1, 1, 1])


def test_load_params_missing_orbax(tmp_path):
    from mmtg_tpu.configs import ModelConfig

    with pytest.raises(FileNotFoundError):
        load_params(str(tmp_path / "nope"), ModelConfig())


def test_generate_parser_reference_flags():
    # canonical generate.sh flag set parses (incl. the parity no-ops)
    args = gen_parser().parse_args([
        "--device_ids", "0,1", "--CUDA_VISIBLE_DEVICES", "0,1",
        "--batch_size", "32", "--seed", "42", "--num_workers", "4",
        "--data_path", "x.pkl", "--model_path", "m", "--tokenizer_path", "v",
        "--temperature", "1.1", "--topk", "10", "--topp", "0.7",
        "--repetition_penalty", "1.5", "--n_samples", "10",
        "--save_samples", "--save_samples_path", "res/test.txt",
    ])
    assert args.topk == 10 and args.save_samples


def test_generate_empty_test_set_exits_cleanly(tmp_path, reference_vocab_path):
    """An empty test pickle logs a warning and returns (no IndexError on
    rows[-1], no model load needed)."""
    import pickle

    from mmtg_tpu.generate import main as gen_main

    empty_pkl = tmp_path / "empty.pkl"
    with open(empty_pkl, "wb") as f:
        pickle.dump([], f)
    gen_main(
        [
            "--data_path", str(empty_pkl),
            "--model_path", str(tmp_path / "nonexistent"),
            "--tokenizer_path", reference_vocab_path,
        ]
    )  # must not raise


def test_generate_cli_mesh_parallel(tmp_path, tiny_model_cfg, tiny_data_cfg,
                                    reference_vocab_path, rng):
    """--mesh_data/--mesh_model: the batch generator decodes through
    generate_sharded on a virtual (data, model) mesh, and the written
    samples are IDENTICAL across mesh shapes (per-sample PRNG streams
    keyed on the global sample index) — the TPU answer to the reference's
    ``nn.DataParallel`` (generate.py:191)."""
    import dataclasses
    import pickle

    import jax

    from mmtg_tpu.checkpoint import save_reference_checkpoint
    from mmtg_tpu.configs import GPT2Config
    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.generate import main as gen_main
    from mmtg_tpu.models.mmtg import init_mmtg_params

    mcfg = dataclasses.replace(
        tiny_model_cfg,
        gpt2=GPT2Config(vocab_size=13317, n_positions=256, n_embd=48,
                        n_layer=2, n_head=4),
    )
    records = make_synthetic_records(3, rng, emb_size=tiny_data_cfg.wenlan_emb_size)
    test_pkl = tmp_path / "test.pkl"
    with open(test_pkl, "wb") as f:
        pickle.dump(records, f)
    emb_pkl = tmp_path / "emb.pkl"
    table = {i: rng.standard_normal(tiny_data_cfg.wenlan_emb_size).astype("float32")
             for i in range(13317)}
    with open(emb_pkl, "wb") as f:
        pickle.dump(table, f)
    ckpt = tmp_path / "model.pth"
    save_reference_checkpoint(
        str(ckpt), init_mmtg_params(jax.random.PRNGKey(0), mcfg), mcfg)

    texts = {}
    for dp, tp in ((4, 2), (2, 1)):
        out = tmp_path / f"samples_{dp}x{tp}.txt"
        gen_main(
            [
                "--data_path", str(test_pkl), "--model_path", str(ckpt),
                "--tokenizer_path", reference_vocab_path,
                "--token_emb_path", str(emb_pkl),
                "--batch_size", "4", "--n_samples", "2",
                "--mesh_data", str(dp), "--mesh_model", str(tp),
                "--save_samples", "--save_samples_path", str(out),
            ],
            mcfg=mcfg, dcfg=tiny_data_cfg,
        )
        texts[(dp, tp)] = out.read_text(encoding="utf-8")
    assert len(texts[(4, 2)].splitlines()) == 6  # 3 rows x 2 samples
    assert texts[(4, 2)] == texts[(2, 1)]


def test_generate_cli_mesh_divisibility_error(tmp_path, reference_vocab_path):
    """A decode batch that doesn't divide over the data axis fails fast
    with a clear message (not a shard_map shape error mid-run)."""
    import pickle

    import pytest as _pytest

    from mmtg_tpu.generate import main as gen_main

    test_pkl = tmp_path / "test.pkl"
    with open(test_pkl, "wb") as f:
        pickle.dump([{"topic": "x"}], f)
    with _pytest.raises(ValueError, match="data axis"):
        gen_main([
            "--data_path", str(test_pkl), "--model_path", "unused",
            "--tokenizer_path", reference_vocab_path,
            "--batch_size", "6", "--n_samples", "2", "--mesh_data", "4",
        ])


def test_swap_probe_swaps_only_embeddings():
    row = {
        "img_embs": np.arange(10, dtype=np.float32).reshape(5, 2),
        "r_embs": np.arange(10, 20, dtype=np.float32).reshape(5, 2),
        "topic_emb": np.zeros(2, np.float32),
    }
    out = _swap_steps(row, 1, 3)
    np.testing.assert_array_equal(out["img_embs"][1], row["img_embs"][3])
    np.testing.assert_array_equal(out["img_embs"][3], row["img_embs"][1])
    np.testing.assert_array_equal(out["r_embs"][1], row["r_embs"][3])
    np.testing.assert_array_equal(out["topic_emb"], row["topic_emb"])
    # original untouched
    assert row["img_embs"][1, 0] == 2.0


def test_predict_parser_defaults():
    args = pred_parser().parse_args(["--data_path", "x", "--model_path", "m",
                                     "--tokenizer_path", "v"])
    assert args.n_samples == 5 and not args.swap_probe


def test_train_cli_end_to_end_tiny(tmp_path, tiny_model_cfg, tiny_data_cfg,
                                   reference_vocab_path, rng):
    """Drive mmtg_tpu.train.main() with a tiny injected model: curriculum
    stages, val/save cadence, Orbax best+epoch artifacts."""
    import pickle

    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.train import main as train_main

    records = make_synthetic_records(12, rng, emb_size=tiny_data_cfg.wenlan_emb_size)
    train_pkl = tmp_path / "train.pkl"
    with open(train_pkl, "wb") as f:
        pickle.dump(records, f)
    # real-vocab-sized emb table so tokenized ids resolve without clamping
    emb_pkl = tmp_path / "emb.pkl"
    table = {i: rng.standard_normal(tiny_data_cfg.wenlan_emb_size).astype("float32")
             for i in range(13317)}
    with open(emb_pkl, "wb") as f:
        pickle.dump(table, f)

    import dataclasses

    from mmtg_tpu.configs import GPT2Config

    mcfg = dataclasses.replace(
        tiny_model_cfg,
        gpt2=GPT2Config(vocab_size=13317, n_positions=256, n_embd=48,
                        n_layer=2, n_head=4),
    )
    save = tmp_path / "ckpt"
    val = train_main(
        [
            "--batch_size", "4", "--val_batch_size", "4", "--epochs", "2",
            "--lr", "1e-3", "--curriculums", "[1,2]", "--log_interval", "2",
            "--train_data_path", str(train_pkl),
            "--val_data_path", str(train_pkl),
            "--vocab_path", reference_vocab_path,
            "--token_emb_path", str(emb_pkl),
            "--save_model", "--save_path", str(save),
            "--alpha", "0.2", "--dtype", "float32",
            "--mesh_data", "1", "--mesh_model", "1",
        ],
        mcfg=mcfg,
        dcfg=tiny_data_cfg,
    )
    import math
    import os

    assert math.isfinite(val)
    assert os.path.isdir(save / "orbax")  # epoch stream


def test_train_cli_resume(tmp_path, tiny_model_cfg, tiny_data_cfg,
                          reference_vocab_path, rng):
    """--resume restores the Orbax epoch stream and continues training."""
    import dataclasses
    import pickle

    from mmtg_tpu.configs import GPT2Config
    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.train import main as train_main

    records = make_synthetic_records(8, rng, emb_size=tiny_data_cfg.wenlan_emb_size)
    train_pkl = tmp_path / "train.pkl"
    with open(train_pkl, "wb") as f:
        pickle.dump(records, f)
    emb_pkl = tmp_path / "emb.pkl"
    table = {i: rng.standard_normal(tiny_data_cfg.wenlan_emb_size).astype("float32")
             for i in range(13317)}
    with open(emb_pkl, "wb") as f:
        pickle.dump(table, f)
    mcfg = dataclasses.replace(
        tiny_model_cfg,
        gpt2=GPT2Config(vocab_size=13317, n_positions=256, n_embd=48,
                        n_layer=2, n_head=4),
    )
    save = tmp_path / "ckpt"
    common = [
        "--batch_size", "4", "--epochs", "1", "--lr", "1e-3",
        "--curriculums", "[0,0]", "--log_interval", "5",
        "--train_data_path", str(train_pkl), "--val_data_path", str(train_pkl),
        "--vocab_path", reference_vocab_path, "--token_emb_path", str(emb_pkl),
        "--save_model", "--save_path", str(save), "--dtype", "float32",
        "--mesh_data", "1", "--mesh_model", "1",
    ]
    train_main(common, mcfg=mcfg, dcfg=tiny_data_cfg)
    from mmtg_tpu.checkpoint import restore_train_state
    from mmtg_tpu.train import create_train_state
    from mmtg_tpu.configs import TrainConfig
    import jax
    import os

    # step count after run 1 = 2 steps (8 samples / bs 4)
    template, _ = create_train_state(
        jax.random.PRNGKey(0), mcfg, TrainConfig(), 1, 10
    )
    _, step1 = restore_train_state(os.path.join(str(save), "orbax"), template)
    assert step1 == 2

    # resume with the SAME epoch budget: training already completed, so
    # the epoch loop must not replay epoch 0 (start_epoch fix) — no-op
    train_main(common + ["--resume"], mcfg=mcfg, dcfg=tiny_data_cfg)
    _, step_same = restore_train_state(os.path.join(str(save), "orbax"), template)
    assert step_same == 2

    # resume with a raised epoch budget: continues from epoch 1, saving
    # a later step
    common2 = list(common)
    common2[common2.index("--epochs") + 1] = "2"
    train_main(common2 + ["--resume"], mcfg=mcfg, dcfg=tiny_data_cfg)
    _, step2 = restore_train_state(os.path.join(str(save), "orbax"), template)
    assert step2 == 4
