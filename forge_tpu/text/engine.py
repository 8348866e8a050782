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
        z, pooled = self._encode(flat_tokens, fixes, tokens.shape)
        z = apply_emphasis(z, jnp.asarray(mults.reshape(-1, CHUNK_LEN + 2)), self.opts.emphasis_mode)
        b, n = tokens.shape[0], tokens.shape[1]
        z = z.reshape(b, n * (CHUNK_LEN + 2), -1)
        pooled = pooled.reshape(b, n, -1)[:, 0]  # pooled from first chunk
        return z, pooled

    def _encode(self, flat_tokens, fixes, shape):
        emb_table = self.params["text_model"]["embeddings"]["token_embedding"]["weight"]
        input_embeds = jnp.take(emb_table, flat_tokens, axis=0)
        if fixes:
            b, n, L = shape
            ie = np.asarray(input_embeds, dtype=np.float32).reshape(b, n, L, -1)
            for (bb, ci, off, vec) in fixes:
                k = min(vec.shape[0], L - off)
                ie[bb, ci, off : off + k] = vec[:k, : ie.shape[-1]]
            input_embeds = jnp.asarray(ie.reshape(b * n, L, -1))

        final, hiddens, _ = clip_text_apply(
            self.params, tokens=flat_tokens, input_embeds=input_embeds, cfg=self.cfg
        )

        o = self.opts
        if o.layer == "hidden":
            z = hiddens[o.layer_idx]
            if o.final_layer_norm:
                z = nn.layer_norm(z, self.params["text_model"]["final_layer_norm"])
        elif o.clip_skip > 1:
            z = nn.layer_norm(
                hiddens[-o.clip_skip], self.params["text_model"]["final_layer_norm"]
            )
        else:
            z = final

        # pooled always from the true final layer at EOT
        eot = jnp.argmax(flat_tokens, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eot]
        if o.pooled_projection:
            pooled = clip_pooled_projection(self.params, pooled)
        return z, pooled
