"""ChatGLM3 transformer in JAX — the Kolors text encoder.

Re-expression of the text encoder the reference bundles the config for
(backend/huggingface/Kwai-Kolors/Kolors/text_encoder — THUDM ChatGLM3-6B):
RMSNorm pre-norm blocks, multi-query attention (2 kv groups), partial rotary
(first half of the head dim, interleaved pairs), SwiGLU MLP with the gate and
up projections fused in dense_h_to_4h, causal masking.

Everything is derived from the checkpoint: hidden width from
embedding.word_embeddings, head/kv-group counts from the fused
query_key_value projection shape (head_dim 128 per the published config).

Kolors conditioning (Kwai-Kolors pipeline_stable_diffusion_xl_chatglm_256.py):
context = hidden_states[-2] (output of the penultimate block), pooled = the
final token of the last block's output — both returned by `chatglm_apply`.
"""

from __future__ import annotations

from typing import Any, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

def _rotary(x: jax.Array, positions: jax.Array) -> jax.Array:
    """ChatGLM partial rotary: the first half of each head rotates in
    interleaved (even, odd) pairs; the second half passes through."""
    b, h, L, d = x.shape
    rot, rest = x[..., : d // 2], x[..., d // 2:]
    pairs = rot.reshape(b, h, L, d // 4, 2)
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d // 2, 2, dtype=jnp.float32) / (d // 2)))
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]  # [L, d/4]
    cos = jnp.cos(ang)[None, None, :, :]
    sin = jnp.sin(ang)[None, None, :, :]
    x0, x1 = pairs[..., 0], pairs[..., 1]
    rot_out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return jnp.concatenate([rot_out.reshape(b, h, L, d // 2), rest], axis=-1)


def chatglm_apply(
    params: Mapping[str, Any],
    ids: jax.Array,                      # [B, L] int32
    attention_mask: Optional[jax.Array] = None,  # [B, L] 1 = attend
    head_dim: int = 128,                 # chatglm3-6b; smaller for tests
) -> Tuple[jax.Array, jax.Array]:
    """→ (context [B, L, hidden] from the penultimate block,
         pooled [B, hidden] = last real token of the final block)."""
    emb_tree = params["transformer"]["embedding"]["word_embeddings"]
    layers = params["transformer"]["encoder"]["layers"]
    wte = emb_tree["weight"]
    hidden = wte.shape[1]
    n_heads = hidden // head_dim
    b, L = ids.shape

    h = wte[ids]
    positions = jnp.arange(L)
    causal = jnp.tril(jnp.ones((L, L), bool))
    mask = causal[None, None]
    if attention_mask is not None:
        mask = jnp.logical_and(mask, attention_mask[:, None, None, :].astype(bool))

    per_layer: List[jax.Array] = []
    n_layers = len(layers)
    for li in range(n_layers):
        lp = layers[str(li)]
        x = nn.rms_norm(h, lp["input_layernorm"]["weight"], eps=1e-5)
        qkv = nn.linear(x, lp["self_attention"]["query_key_value"])
        kv_dim = (qkv.shape[-1] - hidden) // 2
        kv_heads = max(kv_dim // head_dim, 1)
        q = qkv[..., :hidden].reshape(b, L, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = qkv[..., hidden: hidden + kv_dim].reshape(b, L, kv_heads, head_dim).transpose(0, 2, 1, 3)
        v = qkv[..., hidden + kv_dim:].reshape(b, L, kv_heads, head_dim).transpose(0, 2, 1, 3)
        q = _rotary(q, positions)
        k = _rotary(k, positions)
        if kv_heads != n_heads:  # multi-query: broadcast kv groups
            reps = n_heads // kv_heads
            k = jnp.repeat(k, reps, axis=1)
            v = jnp.repeat(v, reps, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(head_dim)
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, L, hidden)
        h = h + nn.linear(o, lp["self_attention"]["dense"])
        x = nn.rms_norm(h, lp["post_attention_layernorm"]["weight"], eps=1e-5)
        up = nn.linear(x, lp["mlp"]["dense_h_to_4h"])
        gate, val = jnp.split(up, 2, axis=-1)
        h = h + nn.linear(nn.silu(gate) * val, lp["mlp"]["dense_4h_to_h"])
        per_layer.append(h)

    final = params["transformer"]["encoder"]["final_layernorm"]
    last = nn.rms_norm(per_layer[-1], final["weight"], eps=1e-5)
    context = per_layer[-2] if n_layers >= 2 else last
    if attention_mask is not None:
        idx = jnp.maximum(jnp.sum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    else:
        idx = jnp.full((b,), L - 1, jnp.int32)
    pooled = last[jnp.arange(b), idx]
    return context, pooled
