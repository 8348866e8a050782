"""Kolors text engine: ChatGLM3 encoder wrapper.

The conditioning contract follows the Kwai-Kolors pipeline the reference
bundles the config for: context = penultimate-block hidden states, pooled =
the final real token of the last block (models/chatglm.py).

Tokenization: the ChatGLM sentencepiece model is loaded from
models/kolors_tokenizer (or KOLORS_TOKENIZER_DIR) via transformers when
present; without it a deterministic byte-level fallback keeps synthetic
checkpoints and tests runnable (no egress in this environment to fetch the
real vocab)."""

from __future__ import annotations

import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.chatglm import chatglm_apply


class ChatGLMTextEngine:
    def __init__(self, params: Any, max_length: int = 256,
                 tokenizer_dir: Optional[str] = None):
        self.params = params
        self.max_length = max_length
        self._jit_cache = {}
        wte = params["transformer"]["embedding"]["word_embeddings"]["weight"]
        self.vocab_size = wte.shape[0]
        self.head_dim = 128 if wte.shape[1] % 128 == 0 else 32
        self.tokenizer = self._load_tokenizer(
            tokenizer_dir or os.environ.get("KOLORS_TOKENIZER_DIR",
                                            "models/kolors_tokenizer"))

    @staticmethod
    def _load_tokenizer(path: str):
        if not os.path.isdir(path):
            return None
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path, trust_remote_code=True)
        except Exception:
            return None

    def _tokenize(self, prompts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        L = self.max_length
        ids = np.zeros((len(prompts), L), np.int32)
        mask = np.zeros((len(prompts), L), np.int32)
        for i, text in enumerate(prompts):
            if self.tokenizer is not None:
                toks = self.tokenizer(text, truncation=True,
                                      max_length=L)["input_ids"]
            else:  # deterministic byte-level fallback
                toks = [2] + [(b % (self.vocab_size - 8)) + 8
                              for b in text.encode("utf8")][: L - 1]
            ids[i, : len(toks)] = toks[:L]
            mask[i, : len(toks)] = 1
            if not text.strip():
                mask[i, 0] = 1  # empty prompt still attends to itself
        return ids, mask

    def __call__(self, prompts: List[str], max_chunks=None):
        ids, mask = self._tokenize(prompts)
        key = ids.shape
        fn = self._jit_cache.get(key)
        if fn is None:
            import functools

            fn = jax.jit(functools.partial(chatglm_apply, head_dim=self.head_dim))
            self._jit_cache[key] = fn
        context, pooled = fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return context, pooled
