"""ctypes bridge to the native (C++) batch word encoder.

Drop-in acceleration for WordTokenizer batch encoding (the per-batch host
path feeding the device); exact same output as the pure-Python encoder,
cross-checked in tests.  Falls back transparently when the library is
unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                         "native", "lib", "libtokenizer.so")


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.isfile(_LIB_PATH):
        build = os.path.join(os.path.dirname(os.path.dirname(_LIB_PATH)), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True, timeout=120)
        except Exception as e:
            logger.info("native tokenizer unavailable (%s)", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tok_new.restype = ctypes.c_void_p
    lib.tok_free.argtypes = [ctypes.c_void_p]
    lib.tok_load_vocab.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   np.ctypeslib.ndpointer(np.int64), ctypes.c_int64]
    lib.tok_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32),
    ]
    return lib


_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def is_available() -> bool:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _load()
        _TRIED = True
    return _LIB is not None


class NativeWordEncoder:
    """Batch encoder over a word vocab list (index == token id)."""

    def __init__(self, vocab: List[str]):
        assert is_available()
        self._lib = _LIB
        self._handle = self._lib.tok_new()
        # the C side consumes concatenated utf-8 words + offsets
        offsets = np.zeros(len(vocab) + 1, np.int64)
        enc = [w.encode("utf-8") for w in vocab]
        flat = b"".join(enc)
        for i, w in enumerate(enc):
            offsets[i + 1] = offsets[i] + len(w)
        self._lib.tok_load_vocab(self._handle, flat, offsets, len(vocab))

    def encode_batch(self, captions: List[str], max_len: int,
                     bos: int = 2, eos: int = 3, unk: int = 1, pad: int = 0) -> np.ndarray:
        # tokenizer.cc splits on space/tab/newline only; Python's
        # str.split() splits on ALL whitespace (\r, \x0b, unicode spaces).
        # Normalize here so both paths tokenize identically — the module
        # contract is exact-same-output as the Python fallback.
        captions = [" ".join(c.split()) for c in captions]
        enc = [c.encode("utf-8") for c in captions]
        flat = b"".join(enc)
        offsets = np.zeros(len(enc) + 1, np.int64)
        for i, c in enumerate(enc):
            offsets[i + 1] = offsets[i] + len(c)
        out = np.empty((len(enc), max_len), np.int32)
        self._lib.tok_encode_batch(self._handle, flat, offsets, len(enc),
                                   bos, eos, unk, pad, max_len, out)
        return out

    def __del__(self):
        try:
            self._lib.tok_free(self._handle)
        except Exception:
            pass
