"""Native C++ WordPiece: id-level parity vs the pure-Python tokenizer
over the real MMTG vocab, plus a packing-throughput sanity check."""

import time

import pytest

from mmtg_tpu.native import load_native_tokenizer

CASES = [
    "主题词：雪山",
    "青山一道同云雨，明月何曾是两乡。",
    "Hello world, this is MiXeD case! 123",
    "天涯若比邻 with english words",
    "accentué café naïve",
    "标点……、！？symbols#@$",
    "山月不知心底事，水风空落眼前花",
    "[UNK]-ish ☃ emoji 🎵 and rare chars",
    "",
    "   ",
    "一" * 50,
    "full　width　space and，fullwidth！punct？",
]


@pytest.fixture(scope="module")
def native(reference_vocab_path):
    tk = load_native_tokenizer(reference_vocab_path)
    if tk is None:
        pytest.skip("native tokenizer unavailable (no toolchain?)")
    return tk


def test_vocab_size(native, tokenizer):
    assert native.vocab_size == len(tokenizer)


@pytest.mark.parametrize("text", CASES)
def test_id_parity(native, tokenizer, text):
    py_ids = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(text))
    cc_ids = native.tokenize_to_ids(text)
    assert cc_ids == py_ids, (text, cc_ids, py_ids)


def test_throughput_faster_than_python(native, tokenizer):
    corpus = [c for c in CASES if c.strip()] * 200
    t0 = time.perf_counter()
    for s in corpus:
        tokenizer.convert_tokens_to_ids(tokenizer.tokenize(s))
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in corpus:
        native.tokenize_to_ids(s)
    t_cc = time.perf_counter() - t0
    # the point of the native path: meaningfully faster packing
    assert t_cc < t_py, (t_cc, t_py)
