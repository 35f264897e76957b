"""ctypes bindings for the native (C++) tokenizers.

Loads ``native/libwordpiece.so`` / ``native/libbpe.so`` (building them
with ``make`` on first use if a toolchain is available) and exposes
tokenizers with the same id output as the pure-Python
:class:`mmtg_tpu.tokenizer.WordPieceTokenizer` /
:class:`mmtg_tpu.bpe.ByteLevelBPETokenizer`. Falls back cleanly: the
loaders return ``None`` when a library can't be built/loaded, and
callers keep using the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwordpiece.so")
_BPE_LIB_PATH = os.path.join(_NATIVE_DIR, "libbpe.so")


def _build_if_missing(path: str) -> bool:
    if os.path.exists(path):
        return True
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.SubprocessError, FileNotFoundError):
        return False
    return os.path.exists(path)


def _ensure_lib() -> Optional[ctypes.CDLL]:
    if not _build_if_missing(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize_ids.restype = ctypes.c_int32
    lib.wp_tokenize_ids.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.wp_vocab_size.restype = ctypes.c_int32
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib._mmtg_has_pack_rows = _bind_pack_rows(lib)
    if not lib._mmtg_has_pack_rows:
        # a stale libwordpiece.so from before the packer — rebuild once and
        # retry; if the rebuild can't happen, keep the library (the
        # tokenizer fast path still works) with the packer disabled
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-B", "-s", "libwordpiece.so"],
                check=True, capture_output=True, timeout=120,
            )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [ctypes.c_char_p]
            lib.wp_free.argtypes = [ctypes.c_void_p]
            lib.wp_tokenize_ids.restype = ctypes.c_int32
            lib.wp_tokenize_ids.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.wp_vocab_size.restype = ctypes.c_int32
            lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
            lib._mmtg_has_pack_rows = _bind_pack_rows(lib)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            pass
    return lib


def _bind_pack_rows(lib: ctypes.CDLL) -> bool:
    """Bind ``wp_pack_rows`` if the loaded .so exports it (a stale library
    built before the packer doesn't — that must NOT take down the
    still-working tokenizer fast path)."""
    try:
        fn = lib.wp_pack_rows
    except AttributeError:
        return False
    _i32p = ctypes.POINTER(ctypes.c_int32)
    fn.restype = ctypes.c_int32
    fn.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),  # topics
        ctypes.POINTER(ctypes.c_char_p),  # lyrics, row-major [n, n_sents]
        ctypes.c_int32, ctypes.c_int32,   # n, n_sents
        ctypes.c_int32, ctypes.c_int32,   # topic_len, max_sent
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # ids
        _i32p, _i32p, _i32p,              # topic_ids/mask/type
        _i32p, _i32p, _i32p,              # targets/mask/type_ids
        ctypes.c_int32,                   # n_threads (0 = auto)
    ]
    return True


def _ensure_bpe_lib() -> Optional[ctypes.CDLL]:
    if not _build_if_missing(_BPE_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_BPE_LIB_PATH)
    except OSError:
        return None
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_encode_ids.restype = ctypes.c_int32
    lib.bpe_encode_ids.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.bpe_vocab_size.restype = ctypes.c_int32
    lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
    return lib


class NativeWordPiece:
    """Thin handle over the C++ tokenizer; produces token *ids* directly."""

    def __init__(self, lib: ctypes.CDLL, handle: int):
        self._lib = lib
        self._h = handle
        self._buf = (ctypes.c_int32 * 4096)()

    def __del__(self):
        try:
            if self._h:
                self._lib.wp_free(self._h)
        except Exception:
            pass

    @property
    def vocab_size(self) -> int:
        return self._lib.wp_vocab_size(self._h)

    @property
    def supports_pack_rows(self) -> bool:
        """False when the loaded .so predates ``wp_pack_rows`` (callers
        fall back to the Python framing; the tokenize fast path is
        unaffected)."""
        return bool(getattr(self._lib, "_mmtg_has_pack_rows", False))

    def tokenize_to_ids(self, text: str) -> List[int]:
        n = self._lib.wp_tokenize_ids(
            self._h, text.encode("utf-8"), self._buf, len(self._buf)
        )
        if n < 0:
            raise RuntimeError("native tokenizer handle invalid")
        return list(self._buf[:n])

    def pack_rows(
        self,
        topics: List[str],
        lyrics: List[List[str]],
        topic_len: int,
        max_sent: int,
        pad_id: int,
        start_id: int,
        eos_id: int,
        sep_id: int,
        n_threads: int = 0,
    ):
        """Pack all token columns for ``n`` samples in ONE native call
        (threaded in C++; see ``wp_pack_rows`` in native/wordpiece.cc).

        ``lyrics`` is ``[n][n_sents]`` — every sample must carry the same
        sentence count. Returns a dict of int32 arrays: ``topic_ids``,
        ``tpw_attention_mask``, ``tpw_type_ids`` ``[n, topic_len]`` and
        ``targets``, ``attention_mask``, ``type_ids``
        ``[n, n_sents*(max_sent+2)+1]``."""
        if not self.supports_pack_rows:
            raise RuntimeError(
                "loaded libwordpiece.so does not export wp_pack_rows "
                "(stale build?) — rebuild with `make -C native -B`"
            )
        import numpy as np

        n = len(topics)
        n_sents = len(lyrics[0]) if lyrics else 0
        if any(len(ls) != n_sents for ls in lyrics):
            raise ValueError("pack_rows needs a uniform sentence count")
        tlen = n_sents * (max_sent + 2) + 1
        enc_topics = [t.encode("utf-8") for t in topics]
        enc_lyrics = [s.encode("utf-8") for ls in lyrics for s in ls]
        c_topics = (ctypes.c_char_p * n)(*enc_topics)
        c_lyrics = (ctypes.c_char_p * (n * n_sents))(*enc_lyrics)
        out = {
            "topic_ids": np.zeros((n, topic_len), np.int32),
            "tpw_attention_mask": np.zeros((n, topic_len), np.int32),
            "tpw_type_ids": np.zeros((n, topic_len), np.int32),
            "targets": np.zeros((n, tlen), np.int32),
            "attention_mask": np.zeros((n, tlen), np.int32),
            "type_ids": np.zeros((n, tlen), np.int32),
        }

        def ptr(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        rc = self._lib.wp_pack_rows(
            self._h, c_topics, c_lyrics, n, n_sents, topic_len, max_sent,
            pad_id, start_id, eos_id, sep_id,
            ptr(out["topic_ids"]), ptr(out["tpw_attention_mask"]),
            ptr(out["tpw_type_ids"]), ptr(out["targets"]),
            ptr(out["attention_mask"]), ptr(out["type_ids"]), n_threads,
        )
        if rc != 0:
            raise RuntimeError("native pack_rows failed")
        return out


def load_native_tokenizer(vocab_path: str) -> Optional[NativeWordPiece]:
    """Best-effort load; ``None`` means use the pure-Python tokenizer."""
    lib = _ensure_lib()
    if lib is None:
        return None
    handle = lib.wp_create(vocab_path.encode("utf-8"))
    if not handle:
        return None
    return NativeWordPiece(lib, handle)


class NativeBPE:
    """Thin handle over the C++ byte-level BPE; produces token ids."""

    def __init__(self, lib: ctypes.CDLL, handle: int):
        self._lib = lib
        self._h = handle
        self._buf = (ctypes.c_int32 * 8192)()

    def __del__(self):
        try:
            if self._h:
                self._lib.bpe_free(self._h)
        except Exception:
            pass

    @property
    def vocab_size(self) -> int:
        return self._lib.bpe_vocab_size(self._h)

    def encode(self, text: str) -> List[int]:
        n = self._lib.bpe_encode_ids(
            self._h, text.encode("utf-8"), self._buf, len(self._buf)
        )
        if n < 0:
            raise RuntimeError("native BPE handle invalid")
        return list(self._buf[:n])


def load_native_bpe(vocab_json: str, merges_txt: str) -> Optional[NativeBPE]:
    """Best-effort load; ``None`` means use the pure-Python BPE."""
    lib = _ensure_bpe_lib()
    if lib is None:
        return None
    handle = lib.bpe_create(
        vocab_json.encode("utf-8"), merges_txt.encode("utf-8")
    )
    if not handle:
        return None
    return NativeBPE(lib, handle)
