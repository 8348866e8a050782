"""CLIP text encoder as a pure function over HF `text_model.*` keys.

Equivalent of the reference's IntegratedCLIP (backend/nn/clip.py) +
transformers CLIPTextModel: causal transformer with quick-gelu (CLIP-L/H) or
gelu (open_clip bigG) MLPs, clip-skip via hidden-state selection, pooled
output at the EOT token with optional text projection (CLIP-G). open_clip
checkpoints are converted to this key space at load (core/loader.py), which
re-expresses the behavior of the reference's transformers_convert
(backend/state_dict.py:43-83).

Supports `input_embeds` injection so textual-inversion embeddings can be
spliced into the token stream before encoding (the reference does this with a
wrapper module, backend/text_processing/classic_engine.py:23).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    num_heads: int = 12
    act: str = "quick_gelu"  # clip-l/h: quick_gelu; open_clip bigG: gelu

    @staticmethod
    def for_width(width: int) -> "ClipConfig":
        if width == 768:  # CLIP-L
            return ClipConfig(num_heads=12, act="quick_gelu")
        if width == 1024:  # CLIP-H (SD2)
            return ClipConfig(num_heads=16, act="gelu")
        if width == 1280:  # CLIP-bigG (SDXL)
            return ClipConfig(num_heads=20, act="gelu")
        # non-standard width (tiny test models): assume 64-dim heads
        return ClipConfig(num_heads=max(width // 64, 1), act="quick_gelu")


def _mlp(p: Mapping[str, Any], x: jax.Array, act: str) -> jax.Array:
    h = nn.linear(x, p["fc1"])
    h = nn.quick_gelu(h) if act == "quick_gelu" else nn.gelu(h)
    return nn.linear(h, p["fc2"])


def _self_attn(p: Mapping[str, Any], x: jax.Array, heads: int, mask: jax.Array) -> jax.Array:
    q = nn.linear(x, p["q_proj"])
    k = nn.linear(x, p["k_proj"])
    v = nn.linear(x, p["v_proj"])
    out = attention(q, k, v, heads=heads, mask=mask, impl="xla")
    return nn.linear(out, p["out_proj"])


def clip_text_apply(
    params: Mapping[str, Any],
    tokens: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,
    cfg: Optional[ClipConfig] = None,
    num_hidden_override: Optional[int] = None,
) -> Tuple[jax.Array, List[jax.Array], jax.Array]:
    """tokens [B, L] int32 (or pre-built input_embeds [B, L, D]).

    Returns (final_hidden [B,L,D], per-layer hidden states [num_layers+1],
    pooled_pre_projection [B,D]). hidden_states[i] is the input to layer i;
    hidden_states[-1] is the (pre-final-LN) output of the last layer, so
    clip-skip k selects hidden_states[-k] like the reference (`:135-139`).
    """
    tm = params["text_model"]
    emb = tm["embeddings"]
    width = emb["token_embedding"]["weight"].shape[1]
    cfg = cfg or ClipConfig.for_width(width)

    if input_embeds is None:
        input_embeds = jnp.take(emb["token_embedding"]["weight"], tokens, axis=0)
    seq = input_embeds.shape[1]
    x = input_embeds + emb["position_embedding"]["weight"][:seq]

    causal = jnp.tril(jnp.ones((seq, seq), dtype=bool))[None, None]
    layers = tm["encoder"]["layers"]
    n_layers = num_hidden_override or len(layers)

    hiddens = [x]
    for i in range(n_layers):
        lp = layers[str(i)]
        x = x + _self_attn(lp["self_attn"], nn.layer_norm(x, lp["layer_norm1"]), cfg.num_heads, causal)
        x = x + _mlp(lp["mlp"], nn.layer_norm(x, lp["layer_norm2"]), cfg.act)
        hiddens.append(x)

    final = nn.layer_norm(x, tm["final_layer_norm"])

    if tokens is not None:
        # EOT = highest token id in CLIP vocab; argmax of ids finds it.
        eot = jnp.argmax(tokens, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eot]
    else:
        pooled = final[:, -1]
    return final, hiddens, pooled


def clip_pooled_projection(params: Mapping[str, Any], pooled: jax.Array) -> jax.Array:
    """Apply text_projection (CLIP-G pooled path); identity if absent."""
    proj = params.get("text_projection")
    if proj is None:
        return pooled
    return jnp.einsum(
        "bd,od->bo", pooled, proj["weight"].astype(pooled.dtype), precision=nn._PRECISION
    )
