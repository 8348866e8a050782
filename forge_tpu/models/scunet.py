"""SCUNet (Swin-Conv UNet) image denoiser, pure JAX.

Re-implementation of the published SCUNet architecture (cszn/SCUNet
models/network_scunet.py; the reference wraps it as the 'ScuNET' upscaler in
extensions-builtin/ScuNET/scripts/scunet_model.py — a scale-1 restoration
model run through the tiled upscaler path).

Structure: conv head → 3 encoder stages (Conv-Trans blocks + stride-2 conv
downsample) → body → 3 decoder stages (stride-2 transpose conv + Conv-Trans
blocks) with UNet additive skips → conv tail. Each Conv-Trans block splits
channels into a residual conv branch and a Swin window-attention branch
(alternating shifted windows), 1×1-mixed on both ends.

Parameter tree = the official checkpoint keys nested (m_head.0,
m_down1.{i}.conv_block/trans_block..., m_body, m_up3..., m_tail.0).
Activations NHWC; window attention runs as batched einsums over windows
(64 tokens/window — MXU-tiled by XLA, no custom kernel needed).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .swinir import _shift_mask, _window_partition, _window_reverse

_WS = 8  # SCUNet is trained with window size 8 throughout


def _rel_bias(params: jax.Array, ws: int) -> jax.Array:
    """relative_position_params [(2ws-1)², heads] → [heads, ws², ws²],
    indexed as network_scunet.WMSA.relative_embedding (2-D coordinate
    difference table, not the flattened Swin index buffer)."""
    heads = params.shape[-1]
    table = params.reshape(2 * ws - 1, 2 * ws - 1, heads).transpose(2, 0, 1)
    cord = np.array([[i, j] for i in range(ws) for j in range(ws)])
    rel = cord[:, None, :] - cord[None, :, :] + ws - 1  # [ws², ws², 2]
    return table[:, rel[:, :, 0], rel[:, :, 1]]  # [heads, ws², ws²]


def _wmsa(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int],
          head_dim: int, shifted: bool) -> jax.Array:
    """Window multi-head self-attention on [B,H,W,C] (type 'W' or 'SW')."""
    b, h, w, c = x.shape
    heads = c // head_dim
    if shifted:
        x = jnp.roll(x, (-(_WS // 2), -(_WS // 2)), axis=(1, 2))
    win = _window_partition(x, _WS)  # [nW, ws², C]
    qkv = nn.linear(win, p["embedding_layer"]).reshape(
        win.shape[0], _WS * _WS, 3, heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = (q @ k.transpose(0, 1, 3, 2)) * head_dim ** -0.5
    attn = attn + _rel_bias(p["relative_position_params"], _WS)[None].astype(attn.dtype)
    if shifted:
        mask = jnp.asarray(_shift_mask(h, w, _WS, _WS // 2))
        m = mask.shape[0]
        attn = attn.reshape(-1, m, heads, _WS * _WS, _WS * _WS) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(-1, heads, _WS * _WS, _WS * _WS)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(win.shape[0], _WS * _WS, c)
    out = nn.linear(out, p["linear"])
    x = _window_reverse(out, _WS, h, w)
    if shifted:
        x = jnp.roll(x, (_WS // 2, _WS // 2), axis=(1, 2))
    return x


def _trans_block(p: Mapping[str, Any], x: jax.Array, head_dim: int,
                 shifted: bool) -> jax.Array:
    """Swin block on NHWC: x + msa(ln1(x)); x + mlp(ln2(x))."""
    hw = x.shape[1:3]
    x = x + _wmsa(p["msa"], nn.layer_norm(x, p["ln1"]), hw, head_dim, shifted)
    h = nn.layer_norm(x, p["ln2"])
    h = nn.linear(jax.nn.gelu(nn.linear(h, p["mlp"]["0"]), approximate=False),
                  p["mlp"]["2"])
    return x + h


def _conv_trans_block(p: Mapping[str, Any], x: jax.Array, conv_dim: int,
                      head_dim: int, shifted: bool) -> jax.Array:
    h = nn.conv2d(x, p["conv1_1"])  # 1×1 mix
    conv_x, trans_x = h[..., :conv_dim], h[..., conv_dim:]
    cb = p["conv_block"]
    c = nn.conv2d(jax.nn.relu(nn.conv2d(conv_x, cb["0"], padding=1)), cb["2"], padding=1)
    conv_x = conv_x + c
    trans_x = _trans_block(p["trans_block"], trans_x, head_dim, shifted)
    res = nn.conv2d(jnp.concatenate([conv_x, trans_x], axis=-1), p["conv1_2"])
    return x + res


def _stage(stage: Mapping[str, Any], x: jax.Array, head_dim: int) -> jax.Array:
    """Run a m_down/m_up/m_body stage: Conv-Trans blocks (alternating W/SW
    by index) with the stride-2 conv / transpose-conv handled by the caller
    (it sits at a numeric key with a bare weight, not a block dict)."""
    for i in sorted((k for k in stage if "conv1_1" in stage[k]), key=int):
        shifted = int(i) % 2 == 1
        conv_dim = stage[i]["conv_block"]["0"]["weight"].shape[-1]
        x = _conv_trans_block(stage[i], x, conv_dim, head_dim, shifted)
    return x


def scunet_apply(params: Mapping[str, Any], img: jax.Array,
                 head_dim: int = 32) -> jax.Array:
    """img [B,H,W,3] in [0,1] → denoised [B,H,W,3] (scale 1).

    Mirrors SCUNet.forward: pad to a multiple of 64, head, three
    downsamples, body, three upsamples with additive skips, tail, crop."""
    b, h0, w0, _ = img.shape
    ph = (64 - h0 % 64) % 64
    pw = (64 - w0 % 64) % 64
    x0 = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

    def down(stage, x):
        x = _stage(stage, x, head_dim)
        dkey = max((k for k in stage if "weight" in stage[k]
                    and "conv1_1" not in stage[k]), key=int)
        return nn.conv2d(x, stage[dkey], stride=2)

    x1 = nn.conv2d(x0, params["m_head"]["0"], padding=1)
    x2 = down(params["m_down1"], x1)
    x3 = down(params["m_down2"], x2)
    x4 = down(params["m_down3"], x3)
    x = _stage(params["m_body"], x4, head_dim)

    def up(stage, x, skip):
        x = nn.conv2d_transpose(x + skip, stage["0"], stride=2)
        return _stage(stage, x, head_dim)

    x = up(params["m_up3"], x, x4)
    x = up(params["m_up2"], x, x3)
    x = up(params["m_up1"], x, x2)
    x = nn.conv2d(x + x1, params["m_tail"]["0"], padding=1)
    return x[:, :h0, :w0]


def load_scunet(path: str) -> Dict[str, Any]:
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = load_state_dict(path)
    for wrap in ("params_ema", "params"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
            break
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})


def infer_scunet_meta(params: Mapping[str, Any]) -> Dict[str, int]:
    """head_dim from the first block: trans branch width / head count."""
    blk = params["m_down1"]["0"]
    half = int(blk["conv_block"]["0"]["weight"].shape[-1])
    heads = int(blk["trans_block"]["msa"]["relative_position_params"].shape[-1])
    return {"head_dim": half // heads}


def is_scunet(sd: Mapping[str, Any]) -> bool:
    return any(k.startswith("m_head.0") for k in sd) and any(
        "trans_block.msa.relative_position_params" in k for k in sd)
