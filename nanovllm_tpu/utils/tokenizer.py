"""Tokenization: real HF tokenizers, with a byte-level fallback.

The reference's tokenizer is a char-code placeholder
(src/engine/llm_engine.rs:219-230); the real capability (HF `tokenizers`,
its declared dep) is implemented here via the `tokenizers` library, loading
`tokenizer.json` from the model dir. When a model dir has no tokenizer files
(synthetic test/bench models), a deterministic byte-level tokenizer keeps
the engine fully functional.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional


class ByteTokenizer:
    """Deterministic fallback: UTF-8 bytes as ids 0..255, eos = 256."""

    vocab_size = 257
    eos_token_id = 256

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: List[int]) -> str:
        return bytes(i for i in ids if 0 <= i < 256).decode("utf-8", errors="replace")


class HFTokenizer:
    """Wraps `tokenizers.Tokenizer` from the model dir's tokenizer.json."""

    def __init__(self, model_dir: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
        self.vocab_size = self._tok.get_vocab_size()
        self.eos_token_id = self._read_eos(model_dir)

    def _read_eos(self, model_dir: str) -> Optional[int]:
        for fname in ("generation_config.json", "config.json"):
            path = os.path.join(model_dir, fname)
            if os.path.isfile(path):
                with open(path) as f:
                    eos = json.load(f).get("eos_token_id")
                if isinstance(eos, list):
                    return eos[0] if eos else None
                if eos is not None:
                    return eos
        return None

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)


def load_tokenizer(model_dir: str):
    if os.path.isfile(os.path.join(model_dir, "tokenizer.json")):
        return HFTokenizer(model_dir)
    return ByteTokenizer()
