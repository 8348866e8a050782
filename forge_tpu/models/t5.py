"""T5 encoder (T5-XXL for Flux/SD3) as a pure function.

Behavioral twin of the reference's IntegratedT5 (backend/nn/t5.py:73-213):
RMSNorm pre-norms, relative attention bias (block 0 owns the bucket table),
gated-GELU DenseReluDense, no attention scaling (T5 convention), f32 norm
statistics. Keys mirror the HF layout found inside flux/sd3 merged
checkpoints (shared.weight, encoder.block.N.layer.{0,1}.*).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _rms(p, x):
    return nn.rms_norm(x, p["weight"], eps=1e-6)


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing, [qlen, klen] int32."""
    context_position = np.arange(qlen)[:, None]
    memory_position = np.arange(klen)[None, :]
    relative_position = memory_position - context_position

    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def t5_attention(p: Mapping[str, Any], x: jax.Array, bias: jax.Array, heads: int) -> jax.Array:
    b, l, _ = x.shape
    q = nn.linear(x, {"weight": p["q"]["weight"]})
    k = nn.linear(x, {"weight": p["k"]["weight"]})
    v = nn.linear(x, {"weight": p["v"]["weight"]})
    d = q.shape[-1] // heads
    qh = q.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    # T5: no 1/sqrt(d) scaling; additive relative bias
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32,
                   precision=nn._PRECISION)
    s = s + bias.astype(jnp.float32)
    prob = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", prob, vh, precision=nn._PRECISION)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, heads * d)
    return nn.linear(out, {"weight": p["o"]["weight"]})


def t5_apply(
    params: Mapping[str, Any],
    tokens: jax.Array,  # [B, L] int32
    num_heads: int = 64,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """→ final hidden states [B, L, D]."""
    emb = params["shared"]["weight"]
    x = jnp.take(emb, tokens, axis=0)
    l = tokens.shape[1]

    blocks = params["encoder"]["block"]
    rel = blocks["0"]["layer"]["0"]["SelfAttention"]["relative_attention_bias"]["weight"]
    num_heads = rel.shape[1]  # definitive — the bias table is per-head
    buckets = jnp.asarray(relative_position_buckets(l, l))
    bias = jnp.take(rel, buckets, axis=0).transpose(2, 0, 1)[None]  # [1,H,L,L]
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask[:, None, None, :], 0.0, -1e9)

    for i in range(len(blocks)):
        bp = blocks[str(i)]["layer"]
        sa = bp["0"]
        x = x + t5_attention(sa["SelfAttention"], _rms(sa["layer_norm"], x), bias, num_heads)
        ff = bp["1"]
        h = _rms(ff["layer_norm"], x)
        dr = ff["DenseReluDense"]
        gated = nn.gelu(nn.linear(h, {"weight": dr["wi_0"]["weight"]})) * nn.linear(
            h, {"weight": dr["wi_1"]["weight"]}
        )
        # fp16-era activation clamp (reference t5.py fp16_fix) is unnecessary
        # in bf16/f32, which share f32 dynamic range.
        x = x + nn.linear(gated, {"weight": dr["wo"]["weight"]})

    return _rms(params["encoder"]["final_layer_norm"], x)
