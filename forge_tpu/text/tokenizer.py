"""CLIP BPE tokenizer wrapper (offline, vocab files discovered at runtime).

Uses transformers' CLIPTokenizer (a library, works fully offline given
vocab.json + merges.txt) but never downloads: vocab assets are resolved from
FORGE_TPU_TOKENIZER_DIR, a models/tokenizer directory, or any bundled HF
config tree (the reference ships several under backend/huggingface/*/tokenizer).
"""

from __future__ import annotations

import functools
import glob
import os
from typing import List, Optional

_SEARCH_GLOBS = [
    os.environ.get("FORGE_TPU_TOKENIZER_DIR", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "assets", "clip_tokenizer"),
    "/root/reference/backend/huggingface/*/*/tokenizer",
    "/root/reference/backend/huggingface/*/tokenizer",
]


def find_tokenizer_dir() -> Optional[str]:
    for pattern in _SEARCH_GLOBS:
        if not pattern:
            continue
        for cand in sorted(glob.glob(pattern)):
            if os.path.exists(os.path.join(cand, "vocab.json")) and os.path.exists(
                os.path.join(cand, "merges.txt")
            ):
                return cand
    return None


class ClipTokenizer:
    """Minimal interface over the BPE vocab: ids without special tokens,
    plus the special ids the chunking engine needs."""

    def __init__(self, vocab_file: Optional[str] = None, merges_file: Optional[str] = None):
        if vocab_file is None:
            d = find_tokenizer_dir()
            if d is None:
                raise FileNotFoundError(
                    "no CLIP tokenizer assets found; set FORGE_TPU_TOKENIZER_DIR "
                    "to a directory containing vocab.json + merges.txt"
                )
            vocab_file = os.path.join(d, "vocab.json")
            merges_file = os.path.join(d, "merges.txt")
        from transformers import CLIPTokenizer as _HFClipTokenizer

        self._tok = _HFClipTokenizer(vocab_file=vocab_file, merges_file=merges_file)
        self.bos = self._tok.bos_token_id
        self.eos = self._tok.eos_token_id
        self.vocab_size = len(self._tok)
        self.comma = self._tok.convert_tokens_to_ids(",</w>")

    @functools.lru_cache(maxsize=4096)
    def ids(self, text: str) -> tuple:
        return tuple(self._tok(text, add_special_tokens=False)["input_ids"])

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids)


@functools.lru_cache(maxsize=1)
def default_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()
