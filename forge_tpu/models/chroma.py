"""Chroma: Flux variant with pruned modulation (external Approximator).

Behavioral twin of the reference's IntegratedChromaTransformer2DModel
(backend/nn/chroma.py): the per-block adaLN modulations do not come from
(time ⊕ guidance ⊕ pooled) MLPs — a small "distilled_guidance_layer"
Approximator maps [emb16(t·1000) ‖ emb16(0) ‖ emb32(index·1000)] → one
modulation vector per slot. Slot order: singles (3 each: shift/scale/gate),
then img_mod doubles (6), then txt_mod doubles (6), then final (2).
Blocks otherwise match Flux (joint attention, RoPE, QK RMSNorm).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp

from ..ops import nn
from .flux import FluxConfig, _joint_attention, _qk_norm, _split_qkv, embed_nd


def _approximator(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    x = nn.linear(x, p["in_proj"])
    layers, norms = p["layers"], p["norms"]
    for i in range(len(layers)):
        h = nn.rms_norm(x, norms[str(i)]["scale"])
        h = nn.linear(nn.silu(nn.linear(h, layers[str(i)]["in_layer"])), layers[str(i)]["out_layer"])
        x = x + h
    return nn.linear(x, p["out_proj"])


def _emb(t, dim):
    # reference flux.timestep_embedding multiplies t by 1000 internally
    return nn.timestep_embedding(t * 1000.0, dim, dtype=jnp.float32)


def chroma_apply(
    params: Mapping[str, Any],
    x: jax.Array,  # [B, h, w, 16] NHWC latent
    timesteps: jax.Array,  # [B] = σ·1000 (flow convention)
    context: jax.Array,  # [B, L, 4096] T5
    y: Optional[jax.Array] = None,  # unused (chroma has no pooled path)
    guidance: Optional[jax.Array] = None,  # unused (distilled into mods)
    cfg: FluxConfig = FluxConfig(guidance_embed=False),
) -> jax.Array:
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hh, ww = h // ps, w // ps

    # channel-major "(c ph pw)" patch features — the flux-family checkpoint
    # convention (see models/flux.py patchify)
    img = (x.reshape(b, hh, ps, ww, ps, c)
           .transpose(0, 1, 3, 5, 2, 4)
           .reshape(b, hh * ww, c * ps * ps))
    img = nn.linear(img, params["img_in"])
    txt = nn.linear(context, params["txt_in"])

    dbs, sbs = params["double_blocks"], params["single_blocks"]
    nd, ns = len(dbs), len(sbs)
    mod_len = nd * 12 + ns * 3 + 2

    t01 = timesteps.astype(jnp.float32) / 1000.0
    distill_t = _emb(t01, 16)  # [B,16]
    distill_g = _emb(jnp.zeros_like(t01), 16)
    mod_index = _emb(jnp.arange(mod_len, dtype=jnp.float32), 32)  # emb32(arange·1000)
    tg = jnp.concatenate([distill_t, distill_g], axis=-1)[:, None, :].repeat(mod_len, axis=1)
    input_vec = jnp.concatenate([tg, jnp.broadcast_to(mod_index[None], (b, mod_len, 32))], axis=-1)
    mods = _approximator(params["distilled_guidance_layer"], input_vec.astype(img.dtype))

    # slot layout (reference distribute_modulations)
    def slot(i):
        return mods[:, i : i + 1, :]

    idx = 0
    single_mods = []
    for _ in range(ns):
        single_mods.append((slot(idx), slot(idx + 1), slot(idx + 2)))
        idx += 3
    img_mods = []
    for _ in range(nd):
        img_mods.append(((slot(idx), slot(idx + 1), slot(idx + 2)),
                         (slot(idx + 3), slot(idx + 4), slot(idx + 5))))
        idx += 6
    txt_mods = []
    for _ in range(nd):
        txt_mods.append(((slot(idx), slot(idx + 1), slot(idx + 2)),
                         (slot(idx + 3), slot(idx + 4), slot(idx + 5))))
        idx += 6
    final_shift, final_scale = slot(idx), slot(idx + 1)

    l_txt = context.shape[1]
    txt_ids = jnp.zeros((b, l_txt, 3), jnp.float32)
    ii = jnp.repeat(jnp.arange(hh, dtype=jnp.float32), ww)
    jj = jnp.tile(jnp.arange(ww, dtype=jnp.float32), hh)
    img_ids = jnp.stack([jnp.zeros_like(ii), ii, jj], axis=-1)[None].repeat(b, axis=0)
    pe = embed_nd(jnp.concatenate([txt_ids, img_ids], axis=1), cfg.axes_dim, cfg.theta)

    for i in range(nd):
        p = dbs[str(i)]
        (im1s, im1c, im1g), (im2s, im2c, im2g) = img_mods[i]
        (tm1s, tm1c, tm1g), (tm2s, tm2c, tm2g) = txt_mods[i]

        img_mod1 = nn.layer_norm(img) * (1 + im1c) + im1s
        iq, ik, iv = _split_qkv(nn.linear(img_mod1, p["img_attn"]["qkv"]), cfg.num_heads)
        iq, ik = _qk_norm(p["img_attn"]["norm"], iq, ik)
        txt_mod1 = nn.layer_norm(txt) * (1 + tm1c) + tm1s
        tq, tk, tv = _split_qkv(nn.linear(txt_mod1, p["txt_attn"]["qkv"]), cfg.num_heads)
        tq, tk = _qk_norm(p["txt_attn"]["norm"], tq, tk)
        attn = _joint_attention(
            jnp.concatenate([tq, iq], 2), jnp.concatenate([tk, ik], 2),
            jnp.concatenate([tv, iv], 2), pe,
        )
        txt_attn, img_attn = attn[:, :l_txt], attn[:, l_txt:]
        img = img + im1g * nn.linear(img_attn, p["img_attn"]["proj"])
        img_in2 = nn.layer_norm(img) * (1 + im2c) + im2s
        img = img + im2g * nn.linear(jax.nn.gelu(nn.linear(img_in2, p["img_mlp"]["0"]), approximate=True), p["img_mlp"]["2"])
        txt = txt + tm1g * nn.linear(txt_attn, p["txt_attn"]["proj"])
        txt_in2 = nn.layer_norm(txt) * (1 + tm2c) + tm2s
        txt = txt + tm2g * nn.linear(jax.nn.gelu(nn.linear(txt_in2, p["txt_mlp"]["0"]), approximate=True), p["txt_mlp"]["2"])

    x_seq = jnp.concatenate([txt, img], axis=1)
    d_model = x_seq.shape[-1]
    for i in range(ns):
        p = sbs[str(i)]
        ms, mc, mg = single_mods[i]
        x_mod = nn.layer_norm(x_seq) * (1 + mc) + ms
        hidden = nn.linear(x_mod, p["linear1"])
        qkv, mlp = hidden[..., : 3 * d_model], hidden[..., 3 * d_model:]
        q, k, v = _split_qkv(qkv, cfg.num_heads)
        q, k = _qk_norm(p["norm"], q, k)
        attn = _joint_attention(q, k, v, pe)
        out = nn.linear(jnp.concatenate([attn, jax.nn.gelu(mlp, approximate=True)], axis=-1), p["linear2"])
        x_seq = x_seq + mg * out

    img = x_seq[:, l_txt:]
    img = nn.layer_norm(img) * (1 + final_scale) + final_shift
    out = nn.linear(img, params["final_layer"]["linear"])
    return (out.reshape(b, hh, ww, c, ps, ps)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(b, h, w, c))
