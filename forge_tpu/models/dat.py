"""DAT (Dual Aggregation Transformer, ICCV 2023) super-resolution, pure JAX.

Re-implementation of the published DAT architecture (zhengchen1999/DAT
basicsr/archs/dat_arch.py; the reference loads it via spandrel from
modules/dat_model.py). Blocks alternate between adaptive SPATIAL attention
(rectangular axial windows with a dynamic-position-bias MLP, two orthogonal
branches over split heads) and adaptive CHANNEL attention (transposed
attention with a learned temperature), each fused with a parallel depthwise
conv branch through mutual sigmoid gating (the "adaptive interaction
module"). FFN is the Spatial-Gated Feed-forward Network (SGFN).

Parameter tree = official checkpoint keys nested (conv_first, before_RG.1,
layers.{g}.blocks.{i}.{norm1,attn,norm2,ffn}, layers.{g}.conv,
conv_after_body, upsample, conv_last). Numerics are validated structurally
(shape round-trip on synthetic checkpoints); bit-level parity against
released weights needs weights in the environment.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .swinir import _pixel_shuffle


def _bn(p: Mapping[str, Any], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """BatchNorm2d in eval mode (running stats), NHWC."""
    mean = p["running_mean"].astype(x.dtype)
    var = p["running_var"].astype(x.dtype)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


@functools.lru_cache(maxsize=16)
def _rect_rel_coords(h: int, w: int) -> np.ndarray:
    """Relative coordinates [(2h-1)·(2w-1), 2] (log-spaced as in DAT's
    DynamicPosBias input: plain normalized offsets) and the index map
    [h·w, h·w] into that table."""
    bh = np.arange(1 - h, h)
    bw = np.arange(1 - w, w)
    biases = np.stack(np.meshgrid(bh, bw, indexing="ij")).reshape(2, -1).T
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + np.array([h - 1, w - 1])
    idx = rel[:, :, 0] * (2 * w - 1) + rel[:, :, 1]
    return biases.astype(np.float32), idx.astype(np.int32)


def _dyn_pos_bias(p: Mapping[str, Any], hw: Tuple[int, int], heads: int) -> jax.Array:
    """DynamicPosBias MLP → [heads, L, L] additive bias for a (h×w) window."""
    h, w = hw
    biases, idx = _rect_rel_coords(h, w)
    t = nn.linear(jnp.asarray(biases), p["pos_proj"])
    for stage in ("pos1", "pos2", "pos3"):
        q = p[stage]
        t = nn.linear(jax.nn.relu(nn.layer_norm(t, q["0"])), q["2"])
    # t: [(2h-1)(2w-1), heads]
    bias = jnp.take(t, jnp.asarray(idx.reshape(-1)), axis=0)
    return bias.reshape(h * w, h * w, heads).transpose(2, 0, 1)


def _rect_partition(x: jax.Array, rh: int, rw: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // rh, rh, w // rw, rw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, rh * rw, c)


def _rect_reverse(win: jax.Array, rh: int, rw: int, h: int, w: int) -> jax.Array:
    b = win.shape[0] // (h * w // rh // rw)
    x = win.reshape(b, h // rh, w // rw, rh, rw, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _spatial_branch(p: Mapping[str, Any], qkv: jax.Array, hw: Tuple[int, int],
                    rect: Tuple[int, int], heads: int, shift: bool) -> jax.Array:
    """One axial-window attention branch (dat_arch.Spatial_Attention).
    qkv: [3, B, H, W, Cb]."""
    h, w = hw
    rh, rw = min(rect[0], h), min(rect[1], w)
    _, b, _, _, c = qkv.shape
    d = c // heads
    if shift:
        qkv = jnp.roll(qkv, (-(rh // 2), -(rw // 2)), axis=(2, 3))
    win = jax.vmap(lambda t: _rect_partition(t, rh, rw))(qkv)  # [3,nW,L,Cb]
    q, k, v = win[0], win[1], win[2]
    nw, l, _ = q.shape
    qh = q.reshape(nw, l, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(nw, l, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(nw, l, heads, d).transpose(0, 2, 1, 3)
    attn = (qh * d ** -0.5) @ kh.transpose(0, 1, 3, 2)
    attn = attn + _dyn_pos_bias(p["pos"], (rh, rw), heads)[None].astype(attn.dtype)
    if shift:
        # region mask for the rolled rectangle grid (same construction as
        # swin's shifted mask, generalized to rh×rw windows)
        img = np.zeros((h, w), np.float32)
        cnt = 0
        for hs in (slice(0, -rh), slice(-rh, -(rh // 2) or None), slice(-(rh // 2) or None, None)):
            for wsl in (slice(0, -rw), slice(-rw, -(rw // 2) or None), slice(-(rw // 2) or None, None)):
                img[hs, wsl] = cnt
                cnt += 1
        wins = img.reshape(h // rh, rh, w // rw, rw).transpose(0, 2, 1, 3).reshape(-1, rh * rw)
        diff = wins[:, None, :] - wins[:, :, None]
        mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
        m = mask.shape[0]
        attn = attn.reshape(nw // m, m, heads, l, l) + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nw, heads, l, l)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(nw, l, c)
    out = _rect_reverse(out, rh, rw, h, w)
    if shift:
        out = jnp.roll(out, (rh // 2, rw // 2), axis=(1, 2))
    return out  # [B,H,W,Cb]


def _adaptive_spatial_attn(p: Mapping[str, Any], x: jax.Array,
                           hw: Tuple[int, int], heads: int,
                           split: Tuple[int, int], shift: bool) -> jax.Array:
    h, w = hw
    b, l, c = x.shape
    qkv = nn.linear(x, p["qkv"]).reshape(b, l, 3, c).transpose(2, 0, 1, 3)
    v_img = qkv[2].reshape(b, h, w, c)
    qkv = qkv.reshape(3, b, h, w, c)
    half = c // 2
    x1 = _spatial_branch(p["attns"]["0"], qkv[..., :half], hw,
                         (split[0], split[1]), heads // 2, shift)
    x2 = _spatial_branch(p["attns"]["1"], qkv[..., half:], hw,
                         (split[1], split[0]), heads // 2, shift)
    attened = jnp.concatenate([x1, x2], axis=-1)  # [B,H,W,C]

    # conv branch (depthwise) + mutual gating (adaptive interaction)
    dw = p["dwconv"]
    conv_x = _gelu(_bn(dw["1"], nn.conv2d(v_img, dw["0"], padding=1,
                                          feature_group_count=c)))
    ci = p["channel_interaction"]
    cmap = jnp.mean(conv_x, axis=(1, 2), keepdims=True)
    cmap = nn.conv2d(_gelu(_bn(ci["2"], nn.conv2d(cmap, ci["1"]))), ci["4"])
    si = p["spatial_interaction"]
    smap = nn.conv2d(_gelu(_bn(si["1"], nn.conv2d(attened, si["0"]))), si["3"])
    attened = attened * jax.nn.sigmoid(cmap)
    conv_x = conv_x * jax.nn.sigmoid(smap)
    out = (attened + conv_x).reshape(b, l, c)
    return nn.linear(out, p["proj"])


def _adaptive_channel_attn(p: Mapping[str, Any], x: jax.Array,
                           hw: Tuple[int, int], heads: int) -> jax.Array:
    """Transposed (channel) attention with temperature + conv branch."""
    h, w = hw
    b, l, c = x.shape
    d = c // heads
    qkv = nn.linear(x, p["qkv"]).reshape(b, l, 3, heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))  # [B,H,D,L]
    qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    temp = p["temperature"].reshape(1, heads, 1, 1).astype(x.dtype)
    attn = jax.nn.softmax((qn @ kn.transpose(0, 1, 3, 2)) * temp, axis=-1)  # [B,H,D,D]
    out = (attn @ v).transpose(0, 3, 1, 2).reshape(b, l, c)

    v_img = qkv[:, :, 2].reshape(b, h, w, c)
    dw = p["dwconv"]
    conv_x = _gelu(_bn(dw["1"], nn.conv2d(v_img, dw["0"], padding=1,
                                          feature_group_count=c)))
    # inverse gating vs the spatial block: attention map gates conv via
    # channel stats; attention output gated by the conv spatial map
    ci = p["channel_interaction"]
    cmap = jnp.mean(out.reshape(b, h, w, c), axis=(1, 2), keepdims=True)
    cmap = nn.conv2d(_gelu(_bn(ci["2"], nn.conv2d(cmap, ci["1"]))), ci["4"])
    si = p["spatial_interaction"]
    smap = nn.conv2d(_gelu(_bn(si["1"], nn.conv2d(conv_x, si["0"]))), si["3"])
    out = out * jax.nn.sigmoid(smap.reshape(b, l, 1))
    conv_x = conv_x * jax.nn.sigmoid(cmap)
    out = out + conv_x.reshape(b, l, c)
    return nn.linear(out, p["proj"])


def _sgfn(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Spatial-Gated FFN: fc1 → gelu → split → depthwise-gated product → fc2."""
    h, w = hw
    b, l, _ = x.shape
    t = _gelu(nn.linear(x, p["fc1"]))
    c2 = t.shape[-1] // 2
    x1, x2 = t[..., :c2], t[..., c2:]
    sg = p["sg"]
    x2 = nn.layer_norm(x2, sg["norm"])
    x2 = nn.conv2d(x2.reshape(b, h, w, c2), sg["conv"], padding=1,
                   feature_group_count=c2).reshape(b, l, c2)
    return nn.linear(x1 * x2, p["fc2"])


def _datb(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int], heads: int,
          split: Tuple[int, int], is_channel: bool, shift: bool) -> jax.Array:
    if is_channel:
        x = x + _adaptive_channel_attn(p["attn"], nn.layer_norm(x, p["norm1"]), hw, heads)
    else:
        x = x + _adaptive_spatial_attn(p["attn"], nn.layer_norm(x, p["norm1"]),
                                       hw, heads, split, shift)
    return x + _sgfn(p["ffn"], nn.layer_norm(x, p["norm2"]), hw)


def dat_apply(params: Mapping[str, Any], img: jax.Array, heads: int = 6,
              split: Tuple[int, int] = (8, 32), scale: int = 4) -> jax.Array:
    """img [B,H,W,3] in [0,1] → upscaled [B,sH,sW,3] (DAT.forward).

    Blocks alternate spatial (even) / channel (odd) attention; spatial
    blocks in odd-indexed positions within the group use shifted windows
    (dat_arch DATB rg_idx/b_idx scheduling, reduced to parity)."""
    mean = jnp.asarray([0.4488, 0.4371, 0.4040], img.dtype)
    b, h0, w0, _ = img.shape
    ph = (split[1] - h0 % split[1]) % split[1]
    pw = (split[1] - w0 % split[1]) % split[1]
    x = jnp.pad(img - mean, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    h, w = h0 + ph, w0 + pw

    x = nn.conv2d(x, params["conv_first"], padding=1)
    c = x.shape[-1]
    feat = x
    tokens = x.reshape(b, h * w, c)
    if "before_RG" in params:
        tokens = nn.layer_norm(tokens, params["before_RG"]["1"])
    layers = params["layers"]
    for g in range(len(layers)):
        grp = layers[str(g)]
        res = tokens
        blocks = grp["blocks"]
        for i in range(len(blocks)):
            is_channel = i % 2 == 1
            shift = (i // 2) % 2 == 1
            tokens = _datb(blocks[str(i)], tokens, (h, w), heads, split,
                           is_channel, shift)
        img_t = nn.conv2d(tokens.reshape(b, h, w, c), grp["conv"], padding=1)
        tokens = res + img_t.reshape(b, h * w, c)
    tokens = nn.layer_norm(tokens, params["norm"])
    body = nn.conv2d(tokens.reshape(b, h, w, c), params["conv_after_body"], padding=1)
    x = body + feat

    if "conv_before_upsample" in params:  # pixelshuffle
        x = nn.conv2d(x, params["conv_before_upsample"]["0"], padding=1)
        x = jax.nn.leaky_relu(x, 0.01)
        ups = params["upsample"]
        for key in sorted(ups, key=int):
            if "weight" in ups[key] and ups[key]["weight"].ndim == 4:
                x = nn.conv2d(x, ups[key], padding=1)
                x = _pixel_shuffle(x, 2 if scale in (2, 4, 8) else 3)
        x = nn.conv2d(x, params["conv_last"], padding=1)
    else:  # pixelshuffledirect (UpsampleOneStep): upsample.0 conv + shuffle
        ups = params["upsample"]["0"]
        x = nn.conv2d(x, ups, padding=1)
        x = _pixel_shuffle(x, scale)
    out = x + mean
    return out[:, : h0 * scale, : w0 * scale]


def load_dat(path: str) -> Dict[str, Any]:
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = load_state_dict(path)
    for wrap in ("params_ema", "params"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
            break
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})


def infer_dat_meta(params: Mapping[str, Any]) -> Dict[str, Any]:
    blk = params["layers"]["0"]["blocks"]["1"]["attn"]  # channel block
    heads = int(blk["temperature"].shape[0])
    if "conv_before_upsample" in params:
        n_shuffles = sum(1 for k, v in params["upsample"].items()
                         if isinstance(v, dict) and v.get("weight") is not None
                         and v["weight"].ndim == 4)
        scale = 2 ** n_shuffles
    else:
        out_ch = params["upsample"]["0"]["weight"].shape[-1]
        scale = int(np.sqrt(out_ch // 3))
    return {"heads": heads, "scale": scale}


def is_dat(sd: Mapping[str, Any]) -> bool:
    return any("spatial_interaction" in k for k in sd) and any(
        k.startswith("before_RG") for k in sd)
