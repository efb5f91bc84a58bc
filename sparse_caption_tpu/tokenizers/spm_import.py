"""SentencePiece ``.model`` vocabulary importer (no sentencepiece dependency).

The reference trains SentencePiece tokenizers and its published checkpoints'
embedding rows are ordered by the SP vocabulary (reference
``tokenizer.py:418-430``, pad=0 unk=1 bos=2 eos=3). To load such a
checkpoint here, the vocabulary ORDER must be imported — this module parses
the SP ``ModelProto`` protobuf wire format directly (only the ``pieces``
field is needed) and writes this framework's word-tokenizer artifact with
the identical id ordering.

Wire format (sentencepiece_model.proto):
    ModelProto { repeated SentencePiece pieces = 1; ... }
    SentencePiece { optional string piece = 1; optional float score = 2;
                    optional Type type = 3; }  # 2=UNKNOWN 3=CONTROL
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

_SPECIAL_MAP = {"<s>": "<bos>", "</s>": "<eos>", "<pad>": "<pad>", "<unk>": "<unk>"}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _skip_field(buf: bytes, i: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        _, i = _read_varint(buf, i)
        return i
    if wire_type == 1:  # fixed64
        return i + 8
    if wire_type == 2:  # length-delimited
        n, i = _read_varint(buf, i)
        return i + n
    if wire_type == 5:  # fixed32
        return i + 4
    raise ValueError(f"unsupported protobuf wire type {wire_type}")


def _parse_piece(buf: bytes) -> Tuple[str, int]:
    """One SentencePiece message -> (piece string, type)."""
    i, piece, ptype = 0, "", 1  # type default NORMAL=1
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            n, i = _read_varint(buf, i)
            piece = buf[i: i + n].decode("utf-8")
            i += n
        elif field == 3 and wt == 0:
            ptype, i = _read_varint(buf, i)
        else:
            i = _skip_field(buf, i, wt)
    return piece, ptype


def parse_sentencepiece_model(path: str) -> List[str]:
    """Ordered piece strings from an SP ``.model`` file (id = list index)."""
    with open(path, "rb") as f:
        buf = f.read()
    pieces: List[str] = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:  # ModelProto.pieces
            n, i = _read_varint(buf, i)
            piece, _ = _parse_piece(buf[i: i + n])
            pieces.append(piece)
            i += n
        else:
            i = _skip_field(buf, i, wt)
    if not pieces:
        raise ValueError(f"no SentencePiece pieces found in {path}")
    return pieces


def pieces_to_word_vocab(pieces: List[str]) -> List[str]:
    """SP pieces -> this framework's word vocab: strip the SP word-boundary
    marker (U+2581) and map SP control names to the local special names.

    Only word-level SP models import cleanly: stripping the marker must be
    injective, because the word tokenizer maps string -> LAST id, so a
    collision would silently re-map every earlier duplicate's embedding
    row. Raises on duplicates (e.g. a subword model containing both
    '▁dog' and 'dog') instead of corrupting ids."""
    vocab = []
    for p in pieces:
        if p in _SPECIAL_MAP:
            vocab.append(_SPECIAL_MAP[p])
        else:
            vocab.append(p.lstrip("▁"))
    seen: dict = {}
    dups = []
    for i, w in enumerate(vocab):
        if w in seen or not w:
            dups.append((seen.get(w), i, w))
        seen.setdefault(w, i)
    if dups:
        raise ValueError(
            f"SentencePiece vocab collapses to duplicate/empty words after marker "
            f"stripping (first few: {dups[:5]}): not a word-level model — import "
            "it with the matching subword tokenizer instead")
    return vocab


def write_word_vocab_artifact(vocab: List[str], tokenizer_dir: str) -> str:
    """Write the word-tokenizer artifact with exactly this id ordering."""
    os.makedirs(tokenizer_dir, exist_ok=True)
    out = os.path.join(tokenizer_dir, "word.vocab.json")
    with open(out, "w") as f:
        json.dump({"model_type": "word", "vocab": list(vocab)}, f)
    return out
