"""HAT (Hybrid Attention Transformer) super-resolution network, pure JAX.

Re-implementation of the published HAT architecture (XPixelGroup/HAT
hat_arch.py; the reference loads it via spandrel from modules/hat_model.py):
SwinIR-style residual groups where every block adds a channel-attention conv
branch (CAB, weighted by conv_scale=0.01) to window attention, and each group
ends with an Overlapping Cross-Attention Block (OCAB) whose keys/values come
from enlarged, overlapping windows.

Parameter tree = official checkpoint keys nested: conv_first,
layers.{i}.residual_group.blocks.{j}.{norm1,attn,conv_block.cab,...},
layers.{i}.residual_group.overlap_attn.*, layers.{i}.conv, conv_after_body,
conv_before_upsample, upsample, conv_last. Relative-position index buffers
are recomputed host-side (HAT computes them in forward, they are not stored).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .swinir import _pixel_shuffle, _shift_mask, _window_partition, _window_reverse


@functools.lru_cache(maxsize=8)
def _swin_rel_index(ws: int) -> np.ndarray:
    """Standard Swin relative-position index [ws², ws²] (HAT calculate_rpi_sa)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ws², ws²]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=8)
def _oca_rel_index(ws: int, owin: int) -> np.ndarray:
    """OCAB q(ws)↔kv(owin) relative index [ws², owin²] (calculate_rpi_oca)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(owin), np.arange(owin), indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]  # [2, ws², owin²] ∈ [-(ws-1), owin-1]
    rel = rel.transpose(1, 2, 0) + (ws - 1)  # → [0, ws+owin-2]
    return (rel[:, :, 0] * (ws + owin - 1) + rel[:, :, 1]).astype(np.int32)


def _window_attention(p: Mapping[str, Any], x: jax.Array, ws: int,
                      heads: int, mask=None) -> jax.Array:
    """x: [nW, ws², C]; bias table indexed by the recomputed swin index."""
    nw, l, c = x.shape
    qkv = nn.linear(x, p["qkv"]).reshape(nw, l, 3, heads, c // heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = (q * (c // heads) ** -0.5) @ k.transpose(0, 1, 3, 2)
    idx = _swin_rel_index(ws).reshape(-1)
    bias = jnp.take(p["relative_position_bias_table"], jnp.asarray(idx), axis=0)
    attn = attn + bias.reshape(l, l, -1).transpose(2, 0, 1)[None].astype(attn.dtype)
    if mask is not None:
        m = mask.shape[0]
        attn = attn.reshape(nw // m, m, heads, l, l) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nw, heads, l, l)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, l, c)
    return nn.linear(out, p["proj"])


def _cab(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Channel Attention Block on NHWC (hat_arch.CAB + ChannelAttention)."""
    h = nn.conv2d(x, p["cab"]["0"], padding=1)
    h = jax.nn.gelu(h, approximate=False)
    h = nn.conv2d(h, p["cab"]["2"], padding=1)
    att = p["cab"]["3"]["attention"]
    s = jnp.mean(h, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(nn.conv2d(s, att["1"]))
    s = jax.nn.sigmoid(nn.conv2d(s, att["3"]))
    return h * s


def _hab(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int], ws: int,
         heads: int, shift: int, conv_scale: float = 0.01) -> jax.Array:
    """Hybrid Attention Block: window attention + conv_scale·CAB + MLP."""
    h, w = hw
    b, l, c = x.shape
    shortcut = x
    x = nn.layer_norm(x, p["norm1"]).reshape(b, h, w, c)
    conv_x = _cab(p["conv_block"], x).reshape(b, l, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(h, w, ws, shift))
    else:
        mask = None
    win = _window_partition(x, ws)
    win = _window_attention(p["attn"], win, ws, heads, mask)
    x = _window_reverse(win, ws, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, l, c) + conv_x * conv_scale
    h2 = nn.layer_norm(x, p["norm2"])
    h2 = nn.linear(jax.nn.gelu(nn.linear(h2, p["mlp"]["fc1"]), approximate=False),
                   p["mlp"]["fc2"])
    return x + h2


def _unfold_windows(x: jax.Array, owin: int, stride: int) -> jax.Array:
    """nn.Unfold(kernel=owin, stride=ws, padding=(owin-ws)//2) on NHWC →
    [B·nW, owin², C] with window-major ordering matching torch."""
    b, h, w, c = x.shape
    pad = (owin - stride) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh = h // stride
    nw = w // stride
    idx_h = (np.arange(nh)[:, None] * stride + np.arange(owin)[None, :])  # [nh,owin]
    idx_w = (np.arange(nw)[:, None] * stride + np.arange(owin)[None, :])
    x = x[:, idx_h]            # [b, nh, owin, W+2p, c]
    x = x[:, :, :, idx_w]      # [b, nh, owin, nw, owin, c]
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [b, nh, nw, owin, owin, c]
    return x.reshape(b * nh * nw, owin * owin, c)


def _ocab(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int], ws: int,
          heads: int, overlap_ratio: float) -> jax.Array:
    """Overlapping Cross-Attention Block (hat_arch.OCAB)."""
    h, w = hw
    b, l, c = x.shape
    owin = int(overlap_ratio * ws) + ws
    shortcut = x
    x = nn.layer_norm(x, p["norm1"]).reshape(b, h, w, c)
    qkv = nn.linear(x, p["qkv"]).reshape(b, h, w, 3, c)
    q = qkv[..., 0, :]
    kv = qkv[..., 1:, :].reshape(b, h, w, 2 * c)
    qw = _window_partition(q, ws)  # [nW, ws², C]
    kvw = _unfold_windows(kv, owin, ws)  # [nW, owin², 2C]
    kw, vw = kvw[..., :c], kvw[..., c:]
    d = c // heads
    qh = qw.reshape(-1, ws * ws, heads, d).transpose(0, 2, 1, 3)
    kh = kw.reshape(-1, owin * owin, heads, d).transpose(0, 2, 1, 3)
    vh = vw.reshape(-1, owin * owin, heads, d).transpose(0, 2, 1, 3)
    attn = (qh * d ** -0.5) @ kh.transpose(0, 1, 3, 2)
    idx = _oca_rel_index(ws, owin).reshape(-1)
    bias = jnp.take(p["relative_position_bias_table"], jnp.asarray(idx), axis=0)
    attn = attn + bias.reshape(ws * ws, owin * owin, -1).transpose(2, 0, 1)[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    out = _window_reverse(out, ws, h, w).reshape(b, l, c)
    x = shortcut + nn.linear(out, p["proj"])
    h2 = nn.layer_norm(x, p["norm2"])
    h2 = nn.linear(jax.nn.gelu(nn.linear(h2, p["mlp"]["fc1"]), approximate=False),
                   p["mlp"]["fc2"])
    return x + h2


def _rhag(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int], ws: int,
          heads: int, overlap_ratio: float) -> jax.Array:
    """Residual Hybrid Attention Group: HABs (alternating shift) + OCAB + conv."""
    h, w = hw
    res = x
    g = p["residual_group"]
    blocks = g["blocks"]
    for j in range(len(blocks)):
        shift = 0 if j % 2 == 0 else ws // 2
        x = _hab(blocks[str(j)], x, hw, ws, heads, shift)
    x = _ocab(g["overlap_attn"], x, hw, ws, heads, overlap_ratio)
    b, l, c = x.shape
    img = nn.conv2d(x.reshape(b, h, w, c), p["conv"], padding=1)
    return res + img.reshape(b, l, c)


def hat_apply(params: Mapping[str, Any], img: jax.Array, window_size: int = 16,
              heads: int = 6, scale: int = 4,
              overlap_ratio: float = 0.5) -> jax.Array:
    """img [B,H,W,3] in [0,1] → upscaled [B,sH,sW,3] (HAT.forward)."""
    mean = jnp.asarray([0.4488, 0.4371, 0.4040], img.dtype)
    b, h0, w0, _ = img.shape
    ws = window_size
    ph = (ws - h0 % ws) % ws
    pw = (ws - w0 % ws) % ws
    x = jnp.pad(img - mean, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    h, w = h0 + ph, w0 + pw

    x = nn.conv2d(x, params["conv_first"], padding=1)
    c = x.shape[-1]
    feat = x
    tokens = x.reshape(b, h * w, c)
    if "patch_embed" in params and "norm" in params["patch_embed"]:
        tokens = nn.layer_norm(tokens, params["patch_embed"]["norm"])
    layers = params["layers"]
    for i in range(len(layers)):
        tokens = _rhag(layers[str(i)], tokens, (h, w), ws, heads, overlap_ratio)
    tokens = nn.layer_norm(tokens, params["norm"])
    body = nn.conv2d(tokens.reshape(b, h, w, c), params["conv_after_body"], padding=1)
    x = body + feat

    x = nn.conv2d(x, params["conv_before_upsample"]["0"], padding=1)
    x = jax.nn.leaky_relu(x, 0.01)
    ups = params["upsample"]
    for key in sorted(ups, key=int):
        if "weight" in ups[key] and ups[key]["weight"].ndim == 4:
            x = nn.conv2d(x, ups[key], padding=1)
            x = _pixel_shuffle(x, 2 if scale in (2, 4, 8) else 3)
    x = nn.conv2d(x, params["conv_last"], padding=1)
    out = x + mean
    return out[:, : h0 * scale, : w0 * scale]


def load_hat(path: str) -> Dict[str, Any]:
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = load_state_dict(path)
    for wrap in ("params_ema", "params"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
            break
    sd = {k: v for k, v in sd.items()
          if not (k.endswith("attn_mask") or k.endswith("relative_position_index"))}
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})


def infer_hat_meta(params: Mapping[str, Any]) -> Dict[str, Any]:
    """(window size, heads, scale, overlap_ratio) from checkpoint shapes."""
    blk = params["layers"]["0"]["residual_group"]["blocks"]["0"]["attn"]
    table = blk["relative_position_bias_table"]
    ws = (int(np.sqrt(table.shape[0])) + 1) // 2
    heads = int(table.shape[1])
    oca = params["layers"]["0"]["residual_group"]["overlap_attn"]
    # table side = ws + owin - 1 with owin = ws·(1+ratio)
    side = int(np.sqrt(oca["relative_position_bias_table"].shape[0]))
    owin = side + 1 - ws
    ratio = (owin - ws) / ws
    n_shuffles = sum(1 for k, v in params["upsample"].items()
                     if isinstance(v, dict) and v.get("weight") is not None
                     and v["weight"].ndim == 4)
    return {"window_size": ws, "heads": heads, "scale": 2 ** n_shuffles,
            "overlap_ratio": ratio}


def is_hat(sd: Mapping[str, Any]) -> bool:
    return any("overlap_attn" in k for k in sd)
