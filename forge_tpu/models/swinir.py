"""SwinIR super-resolution network, pure JAX.

Re-implementation of the published SwinIR architecture (JingyunLiang/SwinIR
network_swinir.py; the reference loads it via spandrel from
extensions-builtin/SwinIR/scripts/swinir_model.py): shallow conv → K
Residual Swin Transformer Blocks (window attention with relative position
bias, alternating shifted windows) → conv → residual → upsampler.

Parameter tree = the official checkpoint keys nested (conv_first,
layers.{i}.residual_group.blocks.{j}.*, conv_after_body, upsample /
conv_up1..). Supports the classical 'pixelshuffle' and real-SR
'nearest+conv' upsamplers, detected by key presence. Activations NHWC;
window attention runs as one batched einsum over all windows — XLA tiles it
onto the MXU without a custom kernel (windows are 64 tokens: too small for
flash attention to matter).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(win: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = win.shape[0] // (h * w // ws // ws)
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_bias(p: Mapping[str, Any], ws: int) -> jax.Array:
    """[heads, ws², ws²] from the trained table + precomputed index."""
    table = p["relative_position_bias_table"]  # [(2ws-1)², heads]
    index = p["relative_position_index"].reshape(-1).astype(jnp.int32)
    bias = jnp.take(table, index, axis=0).reshape(ws * ws, ws * ws, -1)
    return bias.transpose(2, 0, 1)


def _window_attention(p: Mapping[str, Any], x: jax.Array, ws: int,
                      heads: int, mask=None) -> jax.Array:
    """x: [nW, L=ws², C]."""
    nw, l, c = x.shape
    qkv = nn.linear(x, p["qkv"]).reshape(nw, l, 3, heads, c // heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [nW,H,L,D]
    q = q * (c // heads) ** -0.5
    attn = q @ k.transpose(0, 1, 3, 2)  # [nW,H,L,L]
    attn = attn + _rel_pos_bias(p, ws)[None].astype(attn.dtype)
    if mask is not None:
        m = mask.shape[0]
        attn = attn.reshape(nw // m, m, heads, l, l) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nw, heads, l, l)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, l, c)
    return nn.linear(out, p["proj"])


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA additive mask [nW, ws², ws²] (network_swinir calculate_mask)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)  # [nW, ws²], pure numpy (trace-safe const)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _swin_block(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int],
                ws: int, heads: int, shift: int) -> jax.Array:
    h, w = hw
    b, l, c = x.shape
    shortcut = x
    x = nn.layer_norm(x, p["norm1"]).reshape(b, h, w, c)
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
    x = shortcut + x.reshape(b, l, c)
    h2 = nn.layer_norm(x, p["norm2"])
    h2 = nn.linear(jax.nn.gelu(nn.linear(h2, p["mlp"]["fc1"]), approximate=False),
                   p["mlp"]["fc2"])
    return x + h2


def _rstb(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int],
          ws: int, heads: int) -> jax.Array:
    """Residual Swin Transformer Block: STLs (alternating shift) + conv."""
    h, w = hw
    res = x
    blocks = p["residual_group"]["blocks"]
    for j in range(len(blocks)):
        shift = 0 if j % 2 == 0 else ws // 2
        x = _swin_block(blocks[str(j)], x, hw, ws, heads, shift)
    b, l, c = x.shape
    img = x.reshape(b, h, w, c)
    img = nn.conv2d(img, p["conv"], padding=1)
    return res + img.reshape(b, l, c)


def swinir_apply(params: Mapping[str, Any], img: jax.Array,
                 window_size: int = 8, heads: int = 6,
                 scale: int = 4) -> jax.Array:
    """img: [B,H,W,3] in [0,1] → upscaled [B,sH,sW,3].

    Mirrors SwinIR.forward: mean-shift, conv_first, forward_features with
    per-RSTB conv residuals, conv_after_body residual, upsample."""
    mean = jnp.asarray([0.4488, 0.4371, 0.4040], img.dtype)
    b, h0, w0, _ = img.shape
    # pad to window multiples (reference check_image_size)
    ph = (window_size - h0 % window_size) % window_size
    pw = (window_size - w0 % window_size) % window_size
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
        tokens = _rstb(layers[str(i)], tokens, (h, w), window_size, heads)
    tokens = nn.layer_norm(tokens, params["norm"])
    body = nn.conv2d(tokens.reshape(b, h, w, c), params["conv_after_body"], padding=1)
    x = body + feat

    if "conv_up1" in params:  # real-SR 'nearest+conv' upsampler
        x = nn.conv2d(x, params["conv_before_upsample"]["0"], padding=1)
        x = jax.nn.leaky_relu(x, 0.01)
        for key in ("conv_up1", "conv_up2")[: 2 if scale == 4 else 1]:
            bb, hh, ww, cc = x.shape
            x = jax.image.resize(x, (bb, hh * 2, ww * 2, cc), "nearest")
            x = jax.nn.leaky_relu(nn.conv2d(x, params[key], padding=1), 0.2)
        x = jax.nn.leaky_relu(nn.conv2d(x, params["conv_hr"], padding=1), 0.2)
        x = nn.conv2d(x, params["conv_last"], padding=1)
    elif "upsample" in params:  # classical pixelshuffle
        x = nn.conv2d(x, params["conv_before_upsample"]["0"], padding=1)
        x = jax.nn.leaky_relu(x, 0.01)
        ups = params["upsample"]
        for key in sorted(ups, key=int):
            if "weight" in ups[key] and ups[key]["weight"].ndim == 4:
                x = nn.conv2d(x, ups[key], padding=1)
                x = _pixel_shuffle(x, 2 if scale in (2, 4, 8) else 3)
        x = nn.conv2d(x, params["conv_last"], padding=1)
    else:  # lightweight: upsample one-step
        x = nn.conv2d(x, params["conv_last"], padding=1)

    out = x + mean
    return out[:, : h0 * scale, : w0 * scale]


def _pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


def load_swinir(path: str) -> Dict[str, Any]:
    """Official .pth → nested HWIO tree; handles the 'params'/'params_ema'
    wrapper of released checkpoints."""
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = load_state_dict(path)
    for wrap in ("params_ema", "params"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
            break
    sd = {k: v for k, v in sd.items()
          if not k.endswith("attn_mask")}  # recomputed per shape
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})


def infer_swinir_meta(params: Mapping[str, Any]) -> Dict[str, int]:
    """(window size, heads, scale) from checkpoint shapes."""
    blk = params["layers"]["0"]["residual_group"]["blocks"]["0"]["attn"]
    table = blk["relative_position_bias_table"]
    ws = (int(np.sqrt(table.shape[0])) + 1) // 2
    heads = int(table.shape[1])
    if "conv_up2" in params:
        scale = 4
    elif "conv_up1" in params:
        scale = 2
    elif "upsample" in params:
        n_shuffles = sum(1 for k, v in params["upsample"].items()
                         if isinstance(v, dict) and v.get("weight") is not None
                         and v["weight"].ndim == 4)
        scale = 2 ** n_shuffles
    else:
        scale = 1
    return {"window_size": ws, "heads": heads, "scale": scale}
