"""Classic (CLIP) text-processing engine: prompt string → conditioning tensor.

Equivalent of the reference's ClassicTextProcessingEngine
(backend/text_processing/classic_engine.py:252): emphasis parse → 75-token
chunks → per-chunk CLIP encode (with clip-skip, textual-inversion splices,
fp32 token/position embeddings) → emphasis application → chunk concat.
Returns (cond [B, 77·n, D], pooled [B, Dp]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import ClipConfig, clip_text_apply, clip_pooled_projection
from ..ops import nn
from .chunking import CHUNK_LEN, tokenize_line
from .emphasis import apply_emphasis


@dataclasses.dataclass
class TextEncoderOptions:
    clip_skip: int = 1
    emphasis_mode: str = "Original"
    layer: str = "last"  # "last" (clip-skip aware) | "hidden" (SDXL penultimate)
    layer_idx: int = -2  # used when layer == "hidden"
    final_layer_norm: bool = True
    comma_padding_backtrack: int = 20
    pooled_projection: bool = False  # CLIP-G text_projection
    which_embedding: str = "l"  # textual-inversion slot (l or g)


class ClassicTextEngine:
    def __init__(
        self,
        params: Mapping[str, Any],
        tokenizer,
        options: Optional[TextEncoderOptions] = None,
        embedding_db=None,
        cfg: Optional[ClipConfig] = None,
    ):
        self.params = params
        self.tokenizer = tokenizer
        self.opts = options or TextEncoderOptions()
        self.embedding_db = embedding_db
        self.cfg = cfg
        self._encode_cache = {}

    def tokenize_batch(self, prompts: List[str]):
        lookup = None
        if self.embedding_db is not None:
            lookup = lambda toks, off: self.embedding_db.find(toks, off, self.opts.which_embedding)
        all_chunks = []
        max_chunks = 1
        for prompt in prompts:
            chunks, _ = tokenize_line(
                prompt,
                self.tokenizer,
                comma_padding_backtrack=self.opts.comma_padding_backtrack,
                embedding_lookup=lookup,
            )
            all_chunks.append(chunks)
            max_chunks = max(max_chunks, len(chunks))
        return all_chunks, max_chunks

    def __call__(self, prompts: List[str], max_chunks: Optional[int] = None):
        """Encode prompts → (cond [B, 77·n, D], pooled [B, Dp]).

        `max_chunks` lets the caller equalize cond/uncond lengths (the
        reference pads the shorter one, processing.py uses shared chunking).
        """
        all_chunks, natural_max = self.tokenize_batch(prompts)
        n_chunks = max(natural_max, max_chunks or 1)

        bos, eos = self.tokenizer.bos, self.tokenizer.eos
        empty_tokens = [bos] + [eos] * (CHUNK_LEN + 1)

        tokens = np.full((len(prompts), n_chunks, CHUNK_LEN + 2), eos, dtype=np.int32)
        mults = np.ones((len(prompts), n_chunks, CHUNK_LEN + 2), dtype=np.float32)
        fixes = []  # (b, chunk, offset, vectors)
        for b, chunks in enumerate(all_chunks):
            for ci in range(n_chunks):
                if ci < len(chunks):
                    ch = chunks[ci]
                    tokens[b, ci] = [bos] + ch.tokens + [eos]
                    mults[b, ci] = [1.0] + ch.multipliers + [1.0]
                    for off, vec in ch.fixes:
                        fixes.append((b, ci, off + 1, vec))
                else:
                    tokens[b, ci] = empty_tokens

        flat_tokens = jnp.asarray(tokens.reshape(-1, CHUNK_LEN + 2))
        flat_mults = jnp.asarray(mults.reshape(-1, CHUNK_LEN + 2))
        z, pooled = self._encode(flat_tokens, flat_mults, fixes, tokens.shape)
        b, n = tokens.shape[0], tokens.shape[1]
        z = z.reshape(b, n * (CHUNK_LEN + 2), -1)
        pooled = pooled.reshape(b, n, -1)[:, 0]  # pooled from first chunk
        return z, pooled

    def _encode(self, flat_tokens, flat_mults, fixes, shape):
        """Whole encode path is one jitted program per (shape, options) key;
        params are traced args so LoRA-patched trees reuse the executable.
        Textual-inversion splices modify input embeddings host-side first."""
        o = self.opts
        input_embeds = None
        if fixes:
            b, n, L = shape
            emb_table = self.params["text_model"]["embeddings"]["token_embedding"]["weight"]
            ie = np.asarray(
                jnp.take(emb_table, flat_tokens, axis=0), dtype=np.float32
            ).reshape(b, n, L, -1)
            for (bb, ci, off, vec) in fixes:
                k = min(vec.shape[0], L - off)
                ie[bb, ci, off : off + k] = vec[:k, : ie.shape[-1]]
            input_embeds = jnp.asarray(ie.reshape(b * n, L, -1))

        key = (flat_tokens.shape, input_embeds is not None, o.emphasis_mode,
               o.layer, o.layer_idx, o.final_layer_norm, o.clip_skip, o.pooled_projection)
        fn = self._encode_cache.get(key)
        if fn is None:
            from ..runtime.aot import aot_jit

            if input_embeds is not None:
                fn = aot_jit(lambda params, toks, mults, ie: self._encode_core(params, toks, mults, ie),
                             key=("clip_encode", self.cfg, key))
            else:
                fn = aot_jit(lambda params, toks, mults: self._encode_core(params, toks, mults, None),
                             key=("clip_encode", self.cfg, key))
            self._encode_cache[key] = fn
        if input_embeds is not None:
            return fn(self.params, flat_tokens, flat_mults, input_embeds)
        return fn(self.params, flat_tokens, flat_mults)

    def _encode_core(self, params, flat_tokens, flat_mults, input_embeds):
        o = self.opts
        final, hiddens, _ = clip_text_apply(
            params, tokens=flat_tokens, input_embeds=input_embeds, cfg=self.cfg
        )
        if o.layer == "hidden":
            z = hiddens[o.layer_idx]
            if o.final_layer_norm:
                z = nn.layer_norm(z, params["text_model"]["final_layer_norm"])
        elif o.clip_skip > 1:
            z = nn.layer_norm(hiddens[-o.clip_skip], params["text_model"]["final_layer_norm"])
        else:
            z = final

        z = apply_emphasis(z, flat_mults, o.emphasis_mode)

        # pooled always from the true final layer at EOT
        eot = jnp.argmax(flat_tokens, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eot]
        if o.pooled_projection:
            pooled = clip_pooled_projection(params, pooled)
        return z, pooled
