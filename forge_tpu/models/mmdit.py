"""SD3.x MMDiT as a pure function.

Behavioral twin of the reference's MMDiTX (backend/nn/mmditx.py:740-970):
2×2 conv patchify + cropped learned positional grid, joint transformer blocks
(context_block + x_block "dismantled" pairs sharing one attention), adaLN
modulation from timestep+pooled embeddings, optional per-block QK RMSNorm and
x-only self-attn2 (SD3.5-large), modulated final layer + unpatchify.

Key space mirrors checkpoints: x_embedder.proj, pos_embed, t_embedder.mlp,
y_embedder.mlp, context_embedder, joint_blocks.N.{context_block,x_block}.*,
final_layer.*.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    num_heads: int = 24  # hidden // 64
    pos_embed_max_size: int = 192


def _modulation(p: Mapping[str, Any], c: jax.Array, n: int):
    out = nn.linear(nn.silu(c), p["adaLN_modulation"]["1"])
    return jnp.split(out[:, None, :], n, axis=-1)


def _attn_qkv(p: Mapping[str, Any], x: jax.Array, heads: int):
    qkv = nn.linear(x, p["qkv"])
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, heads, -1)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    if "ln_q" in p:  # SD3.5 RMSNorm on q/k
        q = nn.rms_norm(q, p["ln_q"]["weight"])
        k = nn.rms_norm(k, p["ln_k"]["weight"])
    return q, k, v


def _attend(q, k, v):
    from ..ops.attention import default_impl, xla_attention
    from ..ops.flash_attention import flash_attention

    scale = 1.0 / (q.shape[-1] ** 0.5)
    if default_impl() == "flash":
        out = flash_attention(q, k, v, scale=scale)
    else:
        out = xla_attention(q, k, v, scale=scale)
    b, h, l, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _mlp(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    return nn.linear(nn.gelu(nn.linear(x, p["fc1"])), p["fc2"])


def joint_block(p: Mapping[str, Any], context, x, c, heads: int):
    cb, xb = p["context_block"], p["x_block"]
    pre_only = "proj" not in cb["attn"]

    if pre_only:
        c_shift, c_scale = _modulation(cb, c, 2)
    else:
        c_shift, c_scale, c_gate, c_shift2, c_scale2, c_gate2 = _modulation(cb, c, 6)

    has_attn2 = "attn2" in xb
    n_mod = 9 if has_attn2 else 6
    xm = _modulation(xb, c, n_mod)

    ctx_norm = nn.layer_norm(context) * (1 + c_scale) + c_shift
    cq, ck, cv = _attn_qkv(cb["attn"], ctx_norm, heads)

    x_norm = nn.layer_norm(x) * (1 + xm[1]) + xm[0]
    xq, xk, xv = _attn_qkv(xb["attn"], x_norm, heads)

    q = jnp.concatenate([cq, xq], axis=2)
    k = jnp.concatenate([ck, xk], axis=2)
    v = jnp.concatenate([cv, xv], axis=2)
    out = _attend(q, k, v)
    l_ctx = context.shape[1]
    ctx_attn, x_attn = out[:, :l_ctx], out[:, l_ctx:]

    if has_attn2:
        # SD3.5-large x-only self attention fused into the same block
        x2_norm = nn.layer_norm(x) * (1 + xm[7]) + xm[6]
        q2, k2, v2 = _attn_qkv(xb["attn2"], x2_norm, heads)
        x_attn2 = _attend(q2, k2, v2)
        x = x + xm[2] * nn.linear(x_attn, xb["attn"]["proj"]) + xm[8] * nn.linear(x_attn2, xb["attn2"]["proj"])
        x_mlp_in = nn.layer_norm(x) * (1 + xm[4]) + xm[3]
        x = x + xm[5] * _mlp(xb["mlp"], x_mlp_in)
    else:
        x = x + xm[2] * nn.linear(x_attn, xb["attn"]["proj"])
        x_mlp_in = nn.layer_norm(x) * (1 + xm[4]) + xm[3]
        x = x + xm[5] * _mlp(xb["mlp"], x_mlp_in)

    if pre_only:
        return None, x
    context = context + c_gate * nn.linear(ctx_attn, cb["attn"]["proj"])
    ctx_mlp_in = nn.layer_norm(context) * (1 + c_scale2) + c_shift2
    context = context + c_gate2 * _mlp(cb["mlp"], ctx_mlp_in)
    return context, x


def _cropped_pos_embed(pos_embed: jax.Array, hh: int, ww: int, max_size: int) -> jax.Array:
    grid = pos_embed.reshape(1, max_size, max_size, -1)
    top = (max_size - hh) // 2
    left = (max_size - ww) // 2
    crop = jax.lax.dynamic_slice(grid, (0, top, left, 0), (1, hh, ww, grid.shape[-1]))
    return crop.reshape(1, hh * ww, -1)


def mmdit_apply(
    params: Mapping[str, Any],
    x: jax.Array,  # [B, h, w, 16] NHWC latent
    timesteps: jax.Array,  # [B] (σ·1000 flow convention)
    context: jax.Array,  # [B, L, 4096] (clip_l+g padded ⊕ T5)
    y: jax.Array,  # [B, 2048] pooled clip_l‖clip_g
    cfg: Optional[MMDiTConfig] = None,
) -> jax.Array:
    hidden = params["x_embedder"]["proj"]["bias"].shape[0]
    if cfg is None:
        cfg = MMDiTConfig(num_heads=hidden // 64)
    b, h, w, c_in = x.shape
    ps = cfg.patch_size
    hh, ww = h // ps, w // ps

    img = jax.lax.conv_general_dilated(
        x, params["x_embedder"]["proj"]["weight"].astype(x.dtype),
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=nn._PRECISION,
    ) + params["x_embedder"]["proj"]["bias"].astype(x.dtype)
    img = img.reshape(b, hh * ww, hidden)

    if "pos_embed" in params:
        # infer the trained grid side from the buffer itself (sd3-medium 192,
        # sd3.5-large 384, tiny test models smaller)
        max_size = int(round(float(np.sqrt(params["pos_embed"].shape[1]))))
        pe = _cropped_pos_embed(params["pos_embed"], hh, ww, max_size)
        img = img + pe.astype(img.dtype)

    t_emb = nn.timestep_embedding(timesteps.astype(jnp.float32), 256, dtype=jnp.float32)
    c = nn.linear(
        nn.silu(nn.linear(t_emb.astype(img.dtype), params["t_embedder"]["mlp"]["0"])),
        params["t_embedder"]["mlp"]["2"],
    )
    if y is not None and "y_embedder" in params:
        yv = nn.linear(
            nn.silu(nn.linear(y.astype(img.dtype), params["y_embedder"]["mlp"]["0"])),
            params["y_embedder"]["mlp"]["2"],
        )
        c = c + yv

    ctx = nn.linear(context.astype(img.dtype), params["context_embedder"])

    blocks = params["joint_blocks"]
    for i in range(len(blocks)):
        ctx, img = joint_block(blocks[str(i)], ctx, img, c, cfg.num_heads)

    fl = params["final_layer"]
    shift, scale = jnp.split(nn.linear(nn.silu(c), fl["adaLN_modulation"]["1"])[:, None, :], 2, axis=-1)
    img = nn.layer_norm(img) * (1 + scale) + shift
    out = nn.linear(img, fl["linear"])  # [B, hh*ww, ps*ps*c_in]
    out = out.reshape(b, hh, ww, ps, ps, c_in).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c_in)
    return out
