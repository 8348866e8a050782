"""T5 text-processing engine (Flux / SD3.x).

Equivalent of the reference's T5TextProcessingEngine
(backend/text_processing/t5_engine.py:19-158): emphasis-weighted T5 encoding
with variable-length tokenization padded to a configurable minimum. No
75-token chunking — T5 takes the whole prompt in one window.
"""

from __future__ import annotations

import functools
import glob
import os
from typing import Any, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import t5_apply
from .emphasis import parse_prompt_attention

_T5_SEARCH_GLOBS = [
    os.environ.get("FORGE_TPU_T5_TOKENIZER", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "assets", "t5_tokenizer"),
    "/root/reference/backend/huggingface/*/*/tokenizer_2",
    "/root/reference/backend/huggingface/*/*/tokenizer_3",
]


@functools.lru_cache(maxsize=1)
def find_t5_tokenizer():
    for pattern in _T5_SEARCH_GLOBS:
        if not pattern:
            continue
        for cand in sorted(glob.glob(pattern)):
            tj = os.path.join(cand, "tokenizer.json")
            if os.path.exists(tj):
                from transformers import T5TokenizerFast

                return T5TokenizerFast(tokenizer_file=tj)
    raise FileNotFoundError(
        "no T5 tokenizer assets found; set FORGE_TPU_T5_TOKENIZER to a "
        "directory containing tokenizer.json"
    )


class T5TextEngine:
    def __init__(self, params: Mapping[str, Any], max_length: int = 512,
                 num_heads: int = 64, emphasis_mode: str = "Original"):
        self.params = params
        self.max_length = max_length
        self.num_heads = num_heads
        self.emphasis_mode = emphasis_mode
        self.tokenizer = find_t5_tokenizer()
        self._jit_cache = {}

    def __call__(self, prompts: List[str]):
        """→ z [B, max_length, D] (no pooled output — T5 has none)."""
        tok = self.tokenizer
        batch_ids = np.zeros((len(prompts), self.max_length), np.int32)  # pad id 0
        batch_mults = np.ones((len(prompts), self.max_length), np.float32)
        for i, prompt in enumerate(prompts):
            parsed = parse_prompt_attention(prompt)
            ids: List[int] = []
            mults: List[float] = []
            for text, weight in parsed:
                if text == "BREAK" and weight == -1.0:
                    continue
                seg = tok(text, add_special_tokens=False)["input_ids"]
                ids += seg
                mults += [weight] * len(seg)
            ids = ids[: self.max_length - 1] + [1]  # EOS
            mults = mults[: self.max_length - 1] + [1.0]
            batch_ids[i, : len(ids)] = ids
            batch_mults[i, : len(mults)] = mults

        key = batch_ids.shape
        fn = self._jit_cache.get(key)
        if fn is None:
            from ..runtime.aot import aot_jit

            fn = aot_jit(self._encode_core,
                         key=("t5_encode", self.num_heads, key))
            self._jit_cache[key] = fn
        return fn(self.params, jnp.asarray(batch_ids), jnp.asarray(batch_mults))

    def _encode_core(self, params, ids, mults):
        mask = ids != 0
        mask = mask.at[:, 0].set(True)  # empty prompt still attends to itself
        z = t5_apply(params, ids, num_heads=self.num_heads, attention_mask=mask)
        if self.emphasis_mode == "Original":
            original_mean = z.mean()
            z = z * mults[..., None].astype(z.dtype)
            new_mean = z.mean()
            z = z * jnp.where(new_mean == 0, 1.0, original_mean / new_mean)
        elif self.emphasis_mode == "No norm":
            z = z * mults[..., None].astype(z.dtype)
        return z
