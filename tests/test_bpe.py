"""Byte-level BPE tokenizer (English variant): oracle parity vs HF
``GPT2Tokenizer`` / the ``regex`` GPT-2 pattern, round-trips, trained-vocab
invariants, and dataset-framing compatibility.

The reference frames the English adaptation as supported (reference
``README.md:19-20``, ``:86``); an English GPT-2 requires byte-level BPE,
which ``mmtg_tpu/bpe.py`` implements from scratch. These tests prove the
scratch implementation IS GPT-2 BPE: same pre-tokenization, same byte
alphabet, same merge semantics as HuggingFace's tokenizer given identical
vocab/merges files.
"""

import numpy as np
import pytest

from mmtg_tpu.bpe import (
    MMTG_SPECIALS,
    ByteLevelBPETokenizer,
    bytes_to_unicode,
    load_tokenizer,
    pretokenize,
    train_bpe,
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "I'm sure we'll've been there; don't you think so?",
    "In 2022, 13317 tokens cost $4.50 each!!",
    "  leading and   internal   spaces\tand\ttabs\n newlines \n\n",
    "naive cafe resume — déjà vu, 北京 123 ABC",
    "hello world hello world hello hello",
    "subword tokenization splits unknown words into pieces",
    "CamelCase and snake_case and kebab-case identifiers",
]

HELDOUT = [
    "An unseen sentence with words like tokenizer and falcon.",
    "she'd say: \"costs 99 dollars?!\"  trailing spaces   ",
    "mixed 中文 and English text with émojis 🎵 and NBSP",
    "",
    " ",
    "'s't at string start",
    "word",
    "    ",
    "a\nb\n\nc",
]


# ---------------------------------------------------------------------------
# pre-tokenization vs the real GPT-2 regex
# ---------------------------------------------------------------------------


def _regex_pretokenize(text):
    regex = pytest.importorskip("regex")
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    return regex.findall(pat, text)


@pytest.mark.parametrize("text", CORPUS + HELDOUT)
def test_pretokenize_matches_gpt2_regex(text):
    assert pretokenize(text) == _regex_pretokenize(text)


def test_pretokenize_edge_cases_vs_regex():
    cases = [
        "don't",
        "'",
        "''",
        "'S 'T 'RE",  # uppercase: contractions are case-sensitive
        "x'll y'd z've",
        "1'2",
        "a  b",  # double space: \s+(?!\S) yields ' ' then ' b'
        "a \tb",
        "  word",  # NBSP is \s for the regex module
        "ー日本語テスト",  # non-ASCII letters
        "½⅓ numbers in \\p{N}",  # No category includes fractions
        "🎵🎵 notes",
        "tab\t\ttab",
        "end space ",
        "end spaces   ",
    ]
    for text in cases:
        assert pretokenize(text) == _regex_pretokenize(text), repr(text)


def test_bytes_to_unicode_matches_hf():
    transformers = pytest.importorskip("transformers")
    from transformers.models.gpt2.tokenization_gpt2 import (
        bytes_to_unicode as hf_b2u,
    )

    assert bytes_to_unicode() == hf_b2u()


# ---------------------------------------------------------------------------
# trained-vocab invariants
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trained():
    return train_bpe(CORPUS, vocab_size=512)


def test_trained_specials_pinned(trained):
    for tok, i in MMTG_SPECIALS.items():
        assert trained.vocab[tok] == i
    assert trained.pad_token_id == 0
    assert trained.sep_token_id == 102
    assert trained.unk_token_id == 100


def test_trained_vocab_dense_and_sized(trained):
    # a tiny corpus may exhaust mergeable pairs before vocab_size; the id
    # space must still be dense (specials pinned, no holes)
    assert len(trained) <= 512
    # dense id space: specials pinned, alphabet+merges fill every gap
    assert sorted(trained.vocab.values()) == list(range(len(trained)))


def test_roundtrip_on_corpus_and_heldout(trained):
    # byte-level: EVERY string round-trips exactly (no UNK possible for
    # content — single bytes are always in the alphabet)
    for text in CORPUS + HELDOUT:
        ids = trained.encode(text)
        assert trained.decode(ids) == text, repr(text)


def test_trained_compresses(trained):
    text = CORPUS[0]
    n_bytes = len(text.encode("utf-8"))
    assert len(trained.encode(text)) < n_bytes


# ---------------------------------------------------------------------------
# HF GPT2Tokenizer oracle: same files -> same ids
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_pair(trained, tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("bpe_vocab")
    trained.save(str(d))
    hf = transformers.GPT2Tokenizer(
        str(d / "vocab.json"), str(d / "merges.txt"), unk_token="[UNK]"
    )
    return trained, hf


@pytest.mark.parametrize("idx", range(len(CORPUS + HELDOUT)))
def test_encode_matches_hf(hf_pair, idx):
    ours, hf = hf_pair
    text = (CORPUS + HELDOUT)[idx]
    assert ours.encode(text) == hf.encode(text), repr(text)


def test_tokenize_matches_hf_tokens(hf_pair):
    ours, hf = hf_pair
    for text in CORPUS + HELDOUT:
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_save_load_roundtrip(trained, tmp_path):
    trained.save(str(tmp_path))
    loaded = ByteLevelBPETokenizer.from_dir(str(tmp_path))
    for text in CORPUS + HELDOUT:
        assert loaded.encode(text) == trained.encode(text)


def test_load_tokenizer_polymorphic(trained, tmp_path, reference_vocab_path):
    trained.save(str(tmp_path))
    t = load_tokenizer(str(tmp_path))
    assert isinstance(t, ByteLevelBPETokenizer)
    from mmtg_tpu.tokenizer import WordPieceTokenizer

    t2 = load_tokenizer(reference_vocab_path)
    assert isinstance(t2, WordPieceTokenizer)


# ---------------------------------------------------------------------------
# dataset-framing compatibility (English pipeline drop-in)
# ---------------------------------------------------------------------------


def test_dataset_framing_with_bpe(trained):
    """The 22-token sentence frame (`MyDataset.py:89-110`) is
    vocab-independent: BPE-tokenized English lyrics produce the same
    START/EOS/PAD skeleton the WordPiece pipeline does."""
    from mmtg_tpu.configs import DataConfig
    from mmtg_tpu.data import encode_lyrics

    dcfg = DataConfig()
    sents = [f"english lyric line number {i}" for i in range(10)]
    ids, mask, types = encode_lyrics(trained, sents, dcfg)
    F = dcfg.sent_frame_length
    assert len(ids) == dcfg.max_seq_length + 1
    for s in range(10):
        assert ids[s * F] == MMTG_SPECIALS["[#START#]"]
        assert ids[s * F + F - 1] == MMTG_SPECIALS["[#EOS#]"]
    assert ids[-1] == MMTG_SPECIALS["[SEP]"]
    # content tokens are real BPE ids (not UNK — byte alphabet covers all).
    # NB: the reference scrubs ALL whitespace from source text
    # (`MyDataset.py:94-95`) — faithful here too, so compare against the
    # scrubbed encoding.
    from mmtg_tpu.data import _scrub

    content = trained.encode(_scrub(sents[0]))[: dcfg.max_sent_length]
    body = ids[1 : 1 + len(content)]
    assert body == content
    assert all(i not in (0, 100) for i in body)
