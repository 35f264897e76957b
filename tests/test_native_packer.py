"""Native C++ corpus packer (``wp_pack_rows``): bit-level parity of every
token column against the pure-Python framing in ``mmtg_tpu.data``
(`encode_topic`/`encode_lyrics` — reference ``MyDataset.py:62-118``),
plus the fallback behavior for corpora outside the framing contract."""

import numpy as np
import pytest

from mmtg_tpu.configs import DataConfig
from mmtg_tpu.data import MMTGDataset
from mmtg_tpu.tokenizer import WordPieceTokenizer

TOKEN_KEYS = (
    "topic_ids",
    "tpw_attention_mask",
    "tpw_type_ids",
    "targets",
    "attention_mask",
    "type_ids",
)


def _records(n=6, seq_len=5, rng=None):
    """Synthetic records stressing the framing edge cases: topic longer
    than 15 tokens, sentences over 20 tokens (truncation), scrub targets
    (ascii/NBSP/ideographic spaces INSIDE words — the scrub must join
    them before tokenization), mixed CJK/Latin/accents, empty sentence."""
    rng = rng or np.random.default_rng(0)
    topics = [
        "雪山",
        "一个非常非常长的主题词超过十五个词元需要被截断的情况测试",  # > 15 tokens
        "mixed Topic 雪山 English",
        "accentué café",
        "标点……、！？",
        "",
    ]
    sent_pool = [
        "青山一道同云雨",
        "明月何曾是两乡" * 5,  # > 20 tokens → truncation
        "hello wo rld 天涯",  # ascii spaces joined by scrub
        "海内\xa0存知己",  # NBSP joined by scrub
        "长风　破浪会有时",  # ideographic space joined by scrub
        "",  # empty sentence → all-pad frame
        "tab\there and\nnewline",
        "naïve café 直挂云帆",
    ]
    recs = []
    for i in range(n):
        rec = {
            "topic": topics[i % len(topics)],
            "topic_emb": rng.standard_normal(2048).astype(np.float32),
            "lyrics": [
                sent_pool[(i + j) % len(sent_pool)] for j in range(2 * seq_len)
            ],
            "rating": float(1 + (i % 5)),
        }
        for k in range(seq_len):
            rec[f"img_{k}_emb"] = rng.standard_normal(2048).astype(np.float32)
            rec[f"r_{k}_emb"] = rng.standard_normal(2048).astype(np.float32)
        recs.append(rec)
    return recs


@pytest.fixture(scope="module")
def tok_native(reference_vocab_path):
    tk = WordPieceTokenizer.from_file(reference_vocab_path, use_native=True)
    if tk.native is None or not tk.native.supports_pack_rows:
        pytest.skip("native packer unavailable (no toolchain?)")
    return tk


@pytest.fixture(scope="module")
def tok_python(reference_vocab_path):
    return WordPieceTokenizer.from_file(reference_vocab_path, use_native=False)


def test_packed_columns_bit_identical(tok_native, tok_python):
    recs = _records()
    cfg = DataConfig()
    ds_native = MMTGDataset.from_records(recs, tok_native, cfg, if_train=True)
    ds_python = MMTGDataset.from_records(recs, tok_python, cfg, if_train=True)
    a, b = ds_native.arrays(), ds_python.arrays()
    for k in TOKEN_KEYS:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # the non-token columns are unaffected by the packer path
    np.testing.assert_array_equal(a["rating"], b["rating"])
    np.testing.assert_allclose(a["topic_emb"], b["topic_emb"])


def test_nonuniform_sentence_count_falls_back(tok_native, tok_python):
    """A corpus outside the 2-sentences-per-step contract must take the
    Python path (same behavior with either tokenizer)."""
    recs = _records(n=2)
    recs[1]["lyrics"] = recs[1]["lyrics"] + ["额外的一句"]  # 11 sentences
    # the Python path raises on a framing-contract violation (shape
    # mismatch writing the row) — native and python must agree on that
    with pytest.raises(ValueError):
        MMTGDataset.from_records(recs, tok_python, DataConfig(), if_train=True)
    with pytest.raises(ValueError):
        MMTGDataset.from_records(recs, tok_native, DataConfig(), if_train=True)


def test_pack_rows_direct_shapes(tok_native):
    out = tok_native.native.pack_rows(
        ["雪山"], [["青山一道同云雨"] * 10],
        topic_len=15, max_sent=20,
        pad_id=0, start_id=1, eos_id=2, sep_id=102,
    )
    assert out["topic_ids"].shape == (1, 15)
    assert out["targets"].shape == (1, 221)
    # frame structure: position 0 START, 21 EOS, 220 SEP
    assert out["targets"][0, 0] == 1
    assert out["targets"][0, 21] == 2
    assert out["targets"][0, 220] == 102
    assert out["attention_mask"][0, 220] == 1
    assert out["type_ids"][0, 0] == 0
