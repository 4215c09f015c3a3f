"""Tokenizer interface: HF-backed in production, deterministic toy in tests.

The reference depends on each model's HF tokenizer (llama sentencepiece,
Qwen's tiktoken BPE, InternLM2 sentencepiece). Tokenization is host-side CPU
work in both designs; this module only defines the seam so processors are
testable without checkpoint downloads.
"""

from __future__ import annotations

import re
from typing import Optional, Protocol, Sequence


class Tokenizer(Protocol):
    bos_token_id: Optional[int]
    eos_token_id: Optional[int]
    pad_token_id: Optional[int]
    vocab_size: int

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]: ...

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str: ...


class HFTokenizer:
    """Adapter over a transformers tokenizer loaded from a local path."""

    def __init__(self, tokenizer):
        self.tok = tokenizer
        self.bos_token_id = tokenizer.bos_token_id
        self.eos_token_id = tokenizer.eos_token_id
        self.pad_token_id = (
            tokenizer.pad_token_id
            if tokenizer.pad_token_id is not None
            else tokenizer.unk_token_id
        )
        self.vocab_size = len(tokenizer)

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(path, **kw))

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        return self.tok.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode(ids, skip_special_tokens=skip_special_tokens)

    def convert_token_to_id(self, token: str) -> int:
        return self.tok.convert_tokens_to_ids(token)


class ToyTokenizer:
    """Deterministic word-level tokenizer for hermetic tests.

    Splits on whitespace + punctuation; each distinct word hashes into the
    vocab. Special tokens occupy the top of the id space. It intentionally has
    a sentencepiece-like quirk: a word following another token can tokenize
    differently than standalone (exercises the merge-boundary handling in the
    processor — the subtlety behind the reference's min/max guards,
    /root/reference/src/vlrlhf/models/InstructBlip/__init__.py:268).
    """

    def __init__(self, vocab_size: int = 4096, specials: dict | None = None):
        self.vocab_size = vocab_size
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self._specials = {
            "<image>": 3,
            "<unk>": 4,
            "<|im_start|>": 5,
            "<|im_end|>": 6,
        }
        if specials:
            self._specials.update(specials)
        self._n_reserved = 16
        self._inv = {v: k for k, v in self._specials.items()}

    def _word_id(self, word: str) -> int:
        import zlib

        h = zlib.crc32(word.encode()) % (self.vocab_size - self._n_reserved)
        return h + self._n_reserved

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids = [self.bos_token_id] if add_special_tokens else []
        # split keeping special token strings intact
        pat = "|".join(re.escape(s) for s in self._specials)
        parts = re.split(f"({pat})", text) if self._specials else [text]
        for part in parts:
            if part in self._specials:
                ids.append(self._specials[part])
                continue
            for w in re.findall(r"\w+|[^\w\s]", part):
                ids.append(self._word_id(w))
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i in self._inv:
                if not skip_special_tokens:
                    out.append(self._inv[i])
            elif i >= self._n_reserved:
                out.append(f"w{i}")
            elif not skip_special_tokens:
                out.append(f"<{i}>")
        return " ".join(out)

    def convert_token_to_id(self, token: str) -> int:
        return self._specials.get(token, 4)
