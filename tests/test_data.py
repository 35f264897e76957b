"""Framing-rule golden tests (reference MyDataset.py:62-118 contract)."""

import numpy as np

from mmtg_tpu.configs import DataConfig
from mmtg_tpu.data import (
    MMTGDataset,
    encode_lyrics,
    encode_topic,
    load_token_embedding_table,
    make_synthetic_records,
)

CFG = DataConfig()


def test_topic_framing(tokenizer):
    ids, mask, types = encode_topic(tokenizer, "雪山", CFG)
    assert len(ids) == len(mask) == len(types) == 15
    # "主题词：" is 4 chars + 2 topic chars = 6 real tokens
    assert sum(mask) == 6
    assert mask[:6] == [1] * 6 and mask[6:] == [0] * 9
    assert types == mask  # type 1 on real tokens, 0 on pad
    assert ids[6:] == [tokenizer.pad_token_id] * 9


def test_topic_truncation(tokenizer):
    ids, mask, types = encode_topic(tokenizer, "一" * 30, CFG)
    assert len(ids) == 15 and sum(mask) == 15


def test_lyrics_frame_layout(tokenizer):
    lyrics = ["青山一道同云雨"] * 10  # 7 chars per sentence
    ids, mask, types = encode_lyrics(tokenizer, lyrics, CFG)
    assert len(ids) == len(mask) == len(types) == 221
    # Per-sentence 22-token frame: [#START#] content(7) pad(13) [#EOS#]
    for s in range(10):
        base = s * 22
        assert ids[base] == 1, f"sentence {s} must open with [#START#]"
        assert ids[base + 21] == 2, f"sentence {s} must close with [#EOS#]"
        assert mask[base] == 1 and mask[base + 21] == 1
        assert types[base] == 0 and types[base + 21] == 0
        assert mask[base + 1 : base + 8] == [1] * 7
        assert mask[base + 8 : base + 21] == [0] * 13
        # pair type: pair p -> p+1 except pair 4 -> 1 (call-back)
        pair = s // 2
        expected_type = 1 if pair == 4 else pair + 1
        assert types[base + 1 : base + 8] == [expected_type] * 7
        assert types[base + 8 : base + 21] == [0] * 13
    assert ids[220] == tokenizer.sep_token_id
    assert mask[220] == 1 and types[220] == 0


def test_lyrics_truncation(tokenizer):
    lyrics = ["一" * 40] * 10  # longer than max_sent_length=20
    ids, mask, types = encode_lyrics(tokenizer, lyrics, CFG)
    assert len(ids) == 221
    assert sum(mask[:22]) == 22  # START + 20 content + EOS all real


def test_dataset_shapes(tokenizer, rng):
    records = make_synthetic_records(7, rng)
    ds = MMTGDataset.from_records(records, tokenizer, CFG, if_train=True)
    assert len(ds) == 7
    item = ds[0]
    assert item["topic_ids"].shape == (15,)
    assert item["topic_emb"].shape == (2048,)
    assert item["img_embs"].shape == (5, 2048)
    assert item["r_embs"].shape == (5, 2048)
    assert item["targets"].shape == (221,)
    assert item["attention_mask"].shape == (221,)
    assert item["type_ids"].shape == (221,)
    assert "rating" in item


def test_batches_static_shapes(tokenizer, rng):
    records = make_synthetic_records(5, rng)
    ds = MMTGDataset.from_records(records, tokenizer, CFG, if_train=True)
    batches = list(ds.batches(batch_size=4))
    assert len(batches) == 2
    for b in batches:
        assert b["targets"].shape == (4, 221)
    assert b["sample_mask"].tolist() == [1.0, 0.0, 0.0, 0.0]


def test_embedding_table_roundtrip(tmp_path, rng):
    import pickle

    table = {i: rng.standard_normal(8).astype(np.float32) for i in range(10)}
    p = tmp_path / "emb.pkl"
    with open(p, "wb") as f:
        pickle.dump(table, f)
    dense = load_token_embedding_table(str(p), vocab_size=12, emb_size=8)
    assert dense.shape == (12, 8)
    np.testing.assert_allclose(dense[3], table[3])
    np.testing.assert_allclose(dense[11], 0.0)  # missing ids are zero


def test_dataset_from_pkl_file(tmp_path, tokenizer, rng):
    """MMTGDataset loads the reference pkl format from disk (the
    constructor path the CLIs use; from_records covers the rest)."""
    import pickle

    records = make_synthetic_records(3, rng)
    p = tmp_path / "data.pkl"
    with open(p, "wb") as f:
        pickle.dump(records, f)
    ds = MMTGDataset(str(p), tokenizer, CFG, if_train=True)
    assert len(ds) == 3
    assert ds.topics == [r["topic"] for r in records]
    np.testing.assert_allclose(ds[1]["topic_emb"], records[1]["topic_emb"])


def test_scores_side_column_surfaced(tokenizer, rng):
    """Test-set ``score_0..score_4`` human annotations (reference
    README.md:66-78, carried by the data but unused by reference code)
    are surfaced as a ``scores`` side column — and kept OUT of the model
    batch."""
    from mmtg_tpu.configs import DataConfig
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    dcfg = DataConfig(wenlan_emb_size=16)
    recs = make_synthetic_records(3, rng, emb_size=16)
    for r in recs:
        r.pop("rating")
    for k in range(5):
        recs[0][f"score_{k}"] = k + 1.0
    recs[1]["score_2"] = 3.0  # partial annotations allowed
    ds = MMTGDataset.from_records(recs, tokenizer, dcfg, if_train=False)
    np.testing.assert_array_equal(ds.scores[0], [1.0, 2.0, 3.0, 4.0, 5.0])
    assert ds.scores[1][2] == 3.0 and np.isnan(ds.scores[1][0])
    assert np.isnan(ds.scores[2]).all()
    batch = next(ds.batches(batch_size=3))
    assert "scores" not in batch and "score_0" not in batch
