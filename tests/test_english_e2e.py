"""English-variant end-to-end drive: BPE vocab → train → generate → eval.

The reference frames English adaptation as supported but ships nothing
for it (reference ``README.md:19-20``, ``:86``): CLIP embeddings replace
WenLan, an English GPT-2 (byte-level BPE) replaces the Chinese one. This
test proves the WHOLE English pipeline actually runs: a byte-level BPE
vocab trained on an English corpus, English fixture records, CLIP-sized
embeddings, the ``--variant english`` CLI surface, training with the
curriculum objective, batched decode, readable-English post-processing,
and BLEU/distinct metrics — all on the CI CPU mesh.
"""

import dataclasses
import json
import os
import pickle

import numpy as np
import pytest

ENGLISH_CORPUS = [
    "city lights are calling out my name tonight",
    "we dance until the morning sun comes up",
    "every heartbeat echoes down the empty street",
    "hold me closer while the music plays",
    "summer rain keeps falling on my mind",
    "chasing shadows through the neon glow",
    "your voice is like a melody I know",
    "we were young and running with the wind",
    "golden hours fade into the night",
    "take my hand and never let it go",
]

CLIP_DIM = 64


@pytest.fixture(scope="module")
def english_setup(tmp_path_factory):
    """BPE vocab dir + English pkl fixtures + CLIP-sized emb table."""
    from mmtg_tpu.bpe import train_bpe
    from mmtg_tpu.data import make_synthetic_records

    root = tmp_path_factory.mktemp("english")
    tok = train_bpe(ENGLISH_CORPUS, vocab_size=600)
    vocab_dir = root / "bpe_vocab"
    tok.save(str(vocab_dir))

    rng = np.random.default_rng(0)
    records = make_synthetic_records(
        12, rng, emb_size=CLIP_DIM, lyrics_pool=ENGLISH_CORPUS
    )
    with open(root / "train.pkl", "wb") as f:
        pickle.dump(records, f)
    test_records = make_synthetic_records(
        2, rng, emb_size=CLIP_DIM, lyrics_pool=ENGLISH_CORPUS, topic="city"
    )
    for r in test_records:
        r.pop("rating")
    with open(root / "test.pkl", "wb") as f:
        pickle.dump(test_records, f)

    table = {i: rng.standard_normal(CLIP_DIM).astype("float32")
             for i in range(len(tok))}
    with open(root / "emb.pkl", "wb") as f:
        pickle.dump(table, f)
    return root, tok


@pytest.fixture(scope="module")
def english_cfgs(english_setup):
    """english_variant() dims with a CI-sized GPT-2 (2L instead of 12L)."""
    from mmtg_tpu.configs import GPT2Config, english_variant

    _, tok = english_setup
    mcfg, dcfg = english_variant(clip_dim=CLIP_DIM, gpt2_vocab=len(tok))
    # shrink ONLY the decoder depth/width for CI speed; every English-
    # variant dimension decision (CLIP channel dims, projector sizes,
    # vocab) comes from english_variant() itself
    mcfg = dataclasses.replace(
        mcfg,
        topic=dataclasses.replace(mcfg.topic, hidden_dim=32),
        image=dataclasses.replace(mcfg.image, hidden_dim=32),
        text=dataclasses.replace(mcfg.text, hidden_dim=32),
        self_att_hidden_size=32,
        gpt2=GPT2Config(vocab_size=len(tok), n_positions=256, n_ctx=250,
                        n_embd=48, n_layer=2, n_head=4),
    )
    return mcfg, dcfg


def test_english_variant_dims():
    from mmtg_tpu.configs import english_variant

    mcfg, dcfg = english_variant(clip_dim=512, gpt2_vocab=50257)
    assert mcfg.topic.input_dim == 512
    assert mcfg.image.input_dim == 512
    assert mcfg.mm_att_out_dim == 512
    assert mcfg.gpt2.vocab_size == 50257
    assert dcfg.wenlan_emb_size == 512


def test_english_train_generate_eval(english_setup, english_cfgs, tmp_path):
    root, tok = english_setup
    mcfg, dcfg = english_cfgs
    from mmtg_tpu.eval import evaluate_files
    from mmtg_tpu.generate import main as generate_main
    from mmtg_tpu.train import main as train_main

    save = tmp_path / "ckpt"
    val = train_main(
        [
            "--variant", "english", "--clip_dim", str(CLIP_DIM),
            "--batch_size", "4", "--val_batch_size", "4", "--epochs", "1",
            "--lr", "1e-3", "--curriculums", "[0,0]", "--log_interval", "2",
            "--train_data_path", str(root / "train.pkl"),
            "--val_data_path", str(root / "train.pkl"),
            "--vocab_path", str(root / "bpe_vocab"),
            "--token_emb_path", str(root / "emb.pkl"),
            "--save_model", "--save_path", str(save),
            "--alpha", "0.2", "--dtype", "float32",
            "--mesh_data", "1", "--mesh_model", "1",
        ],
        mcfg=mcfg,
        dcfg=dcfg,
    )
    assert np.isfinite(val)
    assert os.path.isdir(save / "orbax")

    out = tmp_path / "samples.txt"
    generate_main(
        [
            "--variant", "english", "--clip_dim", str(CLIP_DIM),
            "--data_path", str(root / "test.pkl"),
            "--model_path", str(save),
            "--tokenizer_path", str(root / "bpe_vocab"),
            "--token_emb_path", str(root / "emb.pkl"),
            "--batch_size", "4", "--n_samples", "2",
            "--save_samples", "--save_samples_path", str(out),
        ],
        mcfg=mcfg,
        dcfg=dcfg,
    )
    lines = out.read_text(encoding="utf-8").splitlines()
    assert len(lines) == 4  # 2 test rows x 2 samples

    # readable English, not the BPE byte alphabet: every char in the
    # output decodes to ASCII/printable via the byte decoder already
    joined = "".join(lines)
    assert "Ġ" not in joined and "Ċ" not in joined

    metrics = evaluate_files(str(out))
    assert 0.0 <= metrics["distinct1"] <= 1.0
    assert 0.0 <= metrics["distinct2"] <= 1.0


def test_english_postprocess_readable(english_setup):
    """BPE rows decode through the byte alphabet: spaces and words come
    back as typed, sentences '，'-joined (generate.py:222-235 semantics)."""
    from mmtg_tpu.decoding import postprocess_tokens

    _, tok = english_setup
    line = "hold me closer"
    ids = (
        [tok.vocab["[#START#]"]]
        + tok.encode(line)
        + [tok.vocab["[#EOS#]"]]
        + [tok.vocab["[#START#]"]]
        + tok.encode("golden hours")
        + [tok.vocab["[#EOS#]"], tok.sep_token_id]
    )
    assert postprocess_tokens(ids, tok) == "hold me closer，golden hours"
