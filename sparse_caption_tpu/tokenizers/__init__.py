"""Tokenizer registry.

Parity surface: reference ``sparse_caption/tokenizer.py:32-66`` (registry) and
the concrete tokenizers registered there ("word", "radix", "character").
The reference backs everything with the SentencePiece C++ wheel; this rebuild
ships its own vocabulary model (JSON artifact + optional C++ fast encoder in
``native/``) because the TPU training path only ever uses the *word*-level
model family (word / radix / char), for which SentencePiece reduces to a
frequency-capped vocabulary over whitespace tokens with fixed special ids
``pad=0, unk=1, bos=2, eos=3`` (reference ``tokenizer.py:424-426``).
"""

from sparse_caption_tpu.registry import Registry

TOKENIZER_REGISTRY: Registry = Registry("tokenizer")
register_tokenizer = TOKENIZER_REGISTRY.register


def get_tokenizer(name: str):
    TOKENIZER_REGISTRY.import_all("sparse_caption_tpu.tokenizers")
    return TOKENIZER_REGISTRY.get(name.lower())


from sparse_caption_tpu.tokenizers.base import Tokenizer  # noqa: E402,F401
