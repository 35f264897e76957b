"""Native C++ byte-level BPE (native/bpe.cc): id-level parity vs the
pure-Python encoder (mmtg_tpu/bpe.py) on a trained vocab, the HF
``ensure_ascii`` vocab.json escape format, and a packing-throughput
sanity check. Mirrors tests/test_native_tokenizer.py for the English
variant's host hot path."""

import json
import os
import time

import pytest

from mmtg_tpu.bpe import ByteLevelBPETokenizer, train_bpe
from mmtg_tpu.native import load_native_bpe

CORPUS = [
    "The moon hangs low over the silver city",
    "I've been walking through the rain all night",
    "don't stop believing, hold on to that feeling",
    "We'll dance until the morning light 123 times",
    "shadows fall across the water's edge",
    "Every heart beats in 4/4 time tonight!",
    "la la la, sing it again   and again",
    "cold wind, warm hands, and a long road home",
]

CASES = [
    "The moon hangs low over the silver city",
    "I've got 99 problems but the rhythm ain't one",
    "don't you forget about me...",
    "MiXeD CaSe WoRdS and CAPS",
    "numbers 12345 then words then 67.89 decimals",
    "punctuation!!! ??? ;;; ,,, ---",
    "  leading and   multiple   spaces  ",
    "tab\tand\nnewline\r\nmix",
    "contractions: I'm you're we've they'll he'd she's can't",
    "'s 't 're at token start",
    "unicode: café naïve résumé",
    "",
    " ",
    "a",
    "word",
    "trailing space ",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tk = train_bpe(CORPUS, vocab_size=420)
    d = tmp_path_factory.mktemp("bpe_native")
    tk.save(str(d))
    return str(d)


@pytest.fixture(scope="module")
def pair(trained):
    py = ByteLevelBPETokenizer.from_files(
        os.path.join(trained, "vocab.json"),
        os.path.join(trained, "merges.txt"),
        use_native=False,
    )
    native = load_native_bpe(
        os.path.join(trained, "vocab.json"), os.path.join(trained, "merges.txt")
    )
    if native is None:
        pytest.skip("native BPE unavailable (no toolchain?)")
    return py, native


def test_vocab_size(pair):
    py, native = pair
    assert native.vocab_size == len(py)


@pytest.mark.parametrize("text", CASES)
def test_id_parity(pair, text):
    py, native = pair
    assert native.encode(text) == py.encode(text), text


def test_corpus_roundtrip_parity(pair):
    py, native = pair
    for text in CORPUS:
        ids = native.encode(text)
        assert ids == py.encode(text)
        # byte-level BPE is lossless on in-alphabet text
        assert py.decode(ids, skip_special_tokens=False) == text


def test_ascii_escaped_vocab_json(pair, trained, tmp_path):
    """HF ships vocab.json with ensure_ascii=True (the byte alphabet
    appears as \\uXXXX escapes) — the C++ parser must read both forms."""
    py, _ = pair
    with open(os.path.join(trained, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    esc = tmp_path / "vocab.json"
    with open(esc, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=True)
    native = load_native_bpe(str(esc), os.path.join(trained, "merges.txt"))
    assert native is not None
    for text in CASES:
        assert native.encode(text) == py.encode(text), text


def test_encode_fast_path_wired(trained):
    """from_files attaches the native encoder and encode() routes
    through it with identical output."""
    tk = ByteLevelBPETokenizer.from_files(
        os.path.join(trained, "vocab.json"),
        os.path.join(trained, "merges.txt"),
        use_native=True,
    )
    if tk.native is None:
        pytest.skip("native BPE unavailable")
    ref = ByteLevelBPETokenizer.from_files(
        os.path.join(trained, "vocab.json"),
        os.path.join(trained, "merges.txt"),
        use_native=False,
    )
    for text in CASES:
        assert tk.encode(text) == ref.encode(text)


def test_throughput_sanity(pair):
    """Not a benchmark — just proves the native path isn't pathologically
    slow (it exists to beat Python packing time on large corpora)."""
    py, native = pair
    text = " ".join(CORPUS)
    t0 = time.perf_counter()
    for _ in range(200):
        native.encode(text)
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        py.convert_tokens_to_ids(py.tokenize(text))
    py_dt = time.perf_counter() - t0
    assert native_dt < py_dt * 2, (native_dt, py_dt)
