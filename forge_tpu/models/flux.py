"""Flux (double/single-stream MMDiT) as a pure function.

Behavioral twin of the reference's IntegratedFluxTransformer2DModel
(backend/nn/flux.py:326): 2×2 patchified latents + T5 text tokens through 19
double-stream blocks (separate img/txt weights, joint attention) and 38
single-stream blocks, with 3-axis RoPE (EmbedND, flux.py:75), QK RMSNorm,
adaLN modulation from (timestep ⊕ guidance ⊕ CLIP-pooled) vectors, and
distilled-CFG guidance embedding (flux.py:372-398).

Parameter tree mirrors checkpoint keys (double_blocks.N.*, single_blocks.N.*,
img_in, txt_in, time_in, vector_in, guidance_in, final_layer.*). Head dim is
128 — lane-perfect for the Pallas flash kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    num_heads: int = 24
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    guidance_embed: bool = True  # flux-dev; schnell has none
    patch_size: int = 2


# ---------------------------------------------------------------------------
# RoPE


def rope_freqs(pos: jax.Array, dim: int, theta: int) -> jax.Array:
    """pos [..., L] → [..., L, dim/2, 2] (cos, sin) at flux frequencies."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)  # [dim/2]
    out = pos.astype(jnp.float32)[..., None] * omega  # [..., L, dim/2]
    return jnp.stack([jnp.cos(out), jnp.sin(out)], axis=-1)


def embed_nd(ids: jax.Array, axes_dim, theta: int) -> jax.Array:
    """ids [B, L, n_axes] → [B, L, D/2, 2] concatenated per-axis rope tables."""
    parts = [rope_freqs(ids[..., i], axes_dim[i], theta) for i in range(len(axes_dim))]
    return jnp.concatenate(parts, axis=-2)


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x [B, H, L, D], freqs [B, L, D/2, 2] → rotated x."""
    b, h, l, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, l, d // 2, 2)
    cos = freqs[:, None, :, :, 0]
    sin = freqs[:, None, :, :, 1]
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([cos * x1 - sin * x2, sin * x1 + cos * x2], axis=-1)
    return out.reshape(b, h, l, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# building blocks


def _mlp_embedder(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    return nn.linear(nn.silu(nn.linear(x, p["in_layer"])), p["out_layer"])


def _modulation(p: Mapping[str, Any], vec: jax.Array, n: int):
    out = nn.linear(nn.silu(vec), p["lin"])
    return jnp.split(out[:, None, :], n, axis=-1)  # n × [B,1,D]


def _qk_norm(p: Mapping[str, Any], q: jax.Array, k: jax.Array):
    q = nn.rms_norm(q, p["query_norm"]["scale"])
    k = nn.rms_norm(k, p["key_norm"]["scale"])
    return q, k


def _split_qkv(qkv: jax.Array, heads: int):
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, heads, -1)
    return (
        qkv[:, :, 0].transpose(0, 2, 1, 3),
        qkv[:, :, 1].transpose(0, 2, 1, 3),
        qkv[:, :, 2].transpose(0, 2, 1, 3),
    )  # each [B,H,L,D]


def _joint_attention(q, k, v, pe):
    """q/k/v [B,H,L,D] with rope pe [B,L,D/2,2] → [B, L, H*D]."""
    from ..ops.flash_attention import flash_attention
    from ..ops.attention import xla_attention, default_impl

    q = apply_rope(q, pe)
    k = apply_rope(k, pe)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if default_impl() == "flash":
        out = flash_attention(q, k, v, scale=scale)
    else:
        out = xla_attention(q, k, v, scale=scale)
    b, h, l, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def double_block(p: Mapping[str, Any], img, txt, vec, pe, cfg: FluxConfig):
    img_m1_shift, img_m1_scale, img_m1_gate, img_m2_shift, img_m2_scale, img_m2_gate = _modulation(p["img_mod"], vec, 6)
    txt_m1_shift, txt_m1_scale, txt_m1_gate, txt_m2_shift, txt_m2_scale, txt_m2_gate = _modulation(p["txt_mod"], vec, 6)

    img_modulated = nn.layer_norm(img) * (1 + img_m1_scale) + img_m1_shift
    img_qkv = nn.linear(img_modulated, p["img_attn"]["qkv"])
    iq, ik, iv = _split_qkv(img_qkv, cfg.num_heads)
    iq, ik = _qk_norm(p["img_attn"]["norm"], iq, ik)

    txt_modulated = nn.layer_norm(txt) * (1 + txt_m1_scale) + txt_m1_shift
    txt_qkv = nn.linear(txt_modulated, p["txt_attn"]["qkv"])
    tq, tk, tv = _split_qkv(txt_qkv, cfg.num_heads)
    tq, tk = _qk_norm(p["txt_attn"]["norm"], tq, tk)

    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    attn = _joint_attention(q, k, v, pe)
    txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

    img = img + img_m1_gate * nn.linear(img_attn, p["img_attn"]["proj"])
    img_mlp_in = nn.layer_norm(img) * (1 + img_m2_scale) + img_m2_shift
    img = img + img_m2_gate * nn.linear(
        nn.gelu(nn.linear(img_mlp_in, p["img_mlp"]["0"])), p["img_mlp"]["2"]
    )

    txt = txt + txt_m1_gate * nn.linear(txt_attn, p["txt_attn"]["proj"])
    txt_mlp_in = nn.layer_norm(txt) * (1 + txt_m2_scale) + txt_m2_shift
    txt = txt + txt_m2_gate * nn.linear(
        nn.gelu(nn.linear(txt_mlp_in, p["txt_mlp"]["0"])), p["txt_mlp"]["2"]
    )
    return img, txt


def single_block(p: Mapping[str, Any], x, vec, pe, cfg: FluxConfig):
    shift, scale, gate = _modulation(p["modulation"], vec, 3)
    x_mod = nn.layer_norm(x) * (1 + scale) + shift
    hidden = nn.linear(x_mod, p["linear1"])
    d_model = x.shape[-1]
    qkv, mlp = hidden[..., : 3 * d_model], hidden[..., 3 * d_model:]
    q, k, v = _split_qkv(qkv, cfg.num_heads)
    q, k = _qk_norm(p["norm"], q, k)
    attn = _joint_attention(q, k, v, pe)
    out = nn.linear(jnp.concatenate([attn, nn.gelu(mlp)], axis=-1), p["linear2"])
    return x + gate * out


def final_layer(p: Mapping[str, Any], x, vec):
    shift, scale = jnp.split(nn.linear(nn.silu(vec), p["adaLN_modulation"]["1"])[:, None, :], 2, axis=-1)
    x = nn.layer_norm(x) * (1 + scale) + shift
    return nn.linear(x, p["linear"])


# ---------------------------------------------------------------------------
# full model


def flux_apply(
    params: Mapping[str, Any],
    x: jax.Array,  # [B, h, w, 16] latent (NHWC)
    timesteps: jax.Array,  # [B] in [0, 1000] (σ·1000 flow convention)
    context: jax.Array,  # [B, L_txt, 4096] T5 features
    y: jax.Array,  # [B, 768] CLIP-L pooled
    guidance: Optional[jax.Array] = None,  # [B] distilled-CFG scale
    cfg: FluxConfig = FluxConfig(),
) -> jax.Array:
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hh, ww = h // ps, w // ps

    # 2×2 patchify (reference flux.py:400-422); feature order is
    # channel-major "(c ph pw)" — the layout img_in's trained weights expect
    img = (x.reshape(b, hh, ps, ww, ps, c)
           .transpose(0, 1, 3, 5, 2, 4)
           .reshape(b, hh * ww, c * ps * ps))
    img = nn.linear(img, params["img_in"])
    txt = nn.linear(context, params["txt_in"])

    # timesteps arrive as σ·1000 (flow convention) == flux's internal t·1000
    t_vec = nn.timestep_embedding(timesteps.astype(jnp.float32), 256, dtype=jnp.float32)
    vec = _mlp_embedder(params["time_in"], t_vec.astype(img.dtype))
    if cfg.guidance_embed and "guidance_in" in params:
        if guidance is None:
            guidance = jnp.full((b,), 3.5, jnp.float32)
        g_vec = nn.timestep_embedding(guidance * 1000.0, 256, dtype=jnp.float32)
        vec = vec + _mlp_embedder(params["guidance_in"], g_vec.astype(img.dtype))
    vec = vec + _mlp_embedder(params["vector_in"], y.astype(img.dtype))

    # positional ids: txt tokens at 0, img tokens at (0, i, j)
    l_txt = context.shape[1]
    txt_ids = jnp.zeros((b, l_txt, 3), jnp.float32)
    ii = jnp.repeat(jnp.arange(hh, dtype=jnp.float32), ww)
    jj = jnp.tile(jnp.arange(ww, dtype=jnp.float32), hh)
    img_ids = jnp.stack([jnp.zeros_like(ii), ii, jj], axis=-1)[None].repeat(b, axis=0)
    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    pe = embed_nd(ids, cfg.axes_dim, cfg.theta)

    dbs = params["double_blocks"]
    for i in range(len(dbs)):
        img, txt = double_block(dbs[str(i)], img, txt, vec, pe, cfg)

    x_seq = jnp.concatenate([txt, img], axis=1)
    sbs = params["single_blocks"]
    for i in range(len(sbs)):
        x_seq = single_block(sbs[str(i)], x_seq, vec, pe, cfg)
    img = x_seq[:, l_txt:]

    out = final_layer(params["final_layer"], img, vec)  # [B, hh*ww, c*ps*ps]
    out = (out.reshape(b, hh, ww, c, ps, ps)
           .transpose(0, 1, 4, 2, 5, 3)
           .reshape(b, h, w, c))
    return out
