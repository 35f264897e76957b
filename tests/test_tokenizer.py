"""WordPiece tokenizer parity vs HF BertTokenizer over the MMTG vocab."""

import pytest

CASES = [
    "主题词：雪山",
    "青山一道同云雨，明月何曾是两乡。",
    "Hello world, this is MiXeD case! 123",
    "天涯若比邻 with english words",
    "accentué café naïve",
    "标点……、！？symbols#@$",
    "",
    "   ",
    "一" * 50,
]


def test_special_ids(tokenizer):
    assert tokenizer.pad_token_id == 0
    assert tokenizer.convert_tokens_to_ids("[#START#]") == 1
    assert tokenizer.convert_tokens_to_ids("[#EOS#]") == 2
    assert tokenizer.convert_tokens_to_ids("[UNK]") == 100
    assert tokenizer.sep_token_id == 102


@pytest.mark.parametrize("text", CASES)
def test_hf_parity(tokenizer, reference_vocab_path, text):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer.from_pretrained(reference_vocab_path)
    assert tokenizer.tokenize(text) == hf.tokenize(text)
    ours = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(text))
    theirs = hf.convert_tokens_to_ids(hf.tokenize(text))
    assert ours == theirs


def test_roundtrip(tokenizer):
    ids = tokenizer.convert_tokens_to_ids(tokenizer.tokenize("明月几时有"))
    toks = tokenizer.convert_ids_to_tokens(ids)
    assert all(isinstance(t, str) for t in toks)
    assert len(toks) == len(ids)


def test_unknown_maps_to_unk(tokenizer):
    ids = tokenizer.convert_tokens_to_ids(["<<not-in-vocab>>"])
    assert ids == [tokenizer.unk_token_id]
