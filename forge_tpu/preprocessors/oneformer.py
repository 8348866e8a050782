"""OneFormer semantic-segmentation annotators (seg_ofade20k / seg_ofcoco).

JAX re-derivation of the reference's OneFormer preprocessor stack
(extensions-builtin/forge_legacy_preprocessors/annotator/oneformer/):

  Swin-L backbone            oneformer/modeling/backbone/swin.py
  MSDeformAttn pixel decoder oneformer/modeling/pixel_decoder/msdeformattn.py
    (deformable sampling:    .../pixel_decoder/ops/functions/ms_deform_attn_func.py
     ms_deform_attn_core_pytorch — the pure-torch fallback the reference
     actually runs; its CUDA op import is commented out)
  task-conditioned masked
  transformer decoder        oneformer/modeling/transformer_decoder/oneformer_transformer_decoder.py
  semantic inference         oneformer/oneformer_model.py:356 (softmax-class ×
                             sigmoid-mask einsum, after sem_seg_postprocess)

Everything is shape-derived from the detectron2 checkpoint ({"model": sd},
keys backbone.* / sem_seg_head.pixel_decoder.* / sem_seg_head.predictor.* /
task_mlp.*), so both published checkpoints load:
  250_16_swin_l_oneformer_ade20k_160k.pth (150 classes, 250 queries)
  150_16_swin_l_oneformer_coco_100ep.pth  (133 classes, 150 queries)
The training-only text branch (text_encoder/text_projector/prompt_ctx) is
dropped at load — inference conditions on the task token alone, exactly as
oneformer_model.py:260-264 does (text encoding is under `if self.training`).

The task string "The task is semantic" is CLIP-BPE tokenized (the reference's
oneformer/data/tokenizer.py == the CLIP vocab our text stack already ships)
and fed through task_mlp as raw float token ids — OneFormer's quirk, kept.

Output: per-pixel palette paint of the argmax class (ADE20K_150_CATEGORIES /
COCO_CATEGORIES colors). The reference routes through detectron2's
matplotlib Visualizer (draw_sem_seg alpha=1), which rasterizes the same
per-class colors via polygon approximation; the per-pixel paint is the exact
version of that map (same colors, no polygon smoothing).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .uniformer import ADE20K_PALETTE

# COCO panoptic (133 = 80 things + 53 stuff) category colors, checkpoint
# class order — dataset constants from detectron2 builtin_meta.COCO_CATEGORIES
COCO_PANOPTIC_PALETTE = np.asarray([
    [220, 20, 60], [119, 11, 32], [0, 0, 142], [0, 0, 230],
    [106, 0, 228], [0, 60, 100], [0, 80, 100], [0, 0, 70],
    [0, 0, 192], [250, 170, 30], [100, 170, 30], [220, 220, 0],
    [175, 116, 175], [250, 0, 30], [165, 42, 42], [255, 77, 255],
    [0, 226, 252], [182, 182, 255], [0, 82, 0], [120, 166, 157],
    [110, 76, 0], [174, 57, 255], [199, 100, 0], [72, 0, 118],
    [255, 179, 240], [0, 125, 92], [209, 0, 151], [188, 208, 182],
    [0, 220, 176], [255, 99, 164], [92, 0, 73], [133, 129, 255],
    [78, 180, 255], [0, 228, 0], [174, 255, 243], [45, 89, 255],
    [134, 134, 103], [145, 148, 174], [255, 208, 186], [197, 226, 255],
    [171, 134, 1], [109, 63, 54], [207, 138, 255], [151, 0, 95],
    [9, 80, 61], [84, 105, 51], [74, 65, 105], [166, 196, 102],
    [208, 195, 210], [255, 109, 65], [0, 143, 149], [179, 0, 194],
    [209, 99, 106], [5, 121, 0], [227, 255, 205], [147, 186, 208],
    [153, 69, 1], [3, 95, 161], [163, 255, 0], [119, 0, 170],
    [0, 182, 199], [0, 165, 120], [183, 130, 88], [95, 32, 0],
    [130, 114, 135], [110, 129, 133], [166, 74, 118], [219, 142, 185],
    [79, 210, 114], [178, 90, 62], [65, 70, 15], [127, 167, 115],
    [59, 105, 106], [142, 108, 45], [196, 172, 0], [95, 54, 80],
    [128, 76, 255], [201, 57, 1], [246, 0, 122], [191, 162, 208],
    [255, 255, 128], [147, 211, 203], [150, 100, 100], [168, 171, 172],
    [146, 112, 198], [210, 170, 100], [92, 136, 89], [218, 88, 184],
    [241, 129, 0], [217, 17, 255], [124, 74, 181], [70, 70, 70],
    [255, 228, 255], [154, 208, 0], [193, 0, 92], [76, 91, 113],
    [255, 180, 195], [106, 154, 176], [230, 150, 140], [60, 143, 255],
    [128, 64, 128], [92, 82, 55], [254, 212, 124], [73, 77, 174],
    [255, 160, 98], [255, 255, 255], [104, 84, 109], [169, 164, 131],
    [225, 199, 255], [137, 54, 74], [135, 158, 223], [7, 246, 231],
    [107, 255, 200], [58, 41, 149], [183, 121, 142], [255, 73, 97],
    [107, 142, 35], [190, 153, 153], [146, 139, 141], [70, 130, 180],
    [134, 199, 156], [209, 226, 140], [96, 36, 108], [96, 96, 96],
    [64, 170, 64], [152, 251, 152], [208, 229, 228], [206, 186, 171],
    [152, 161, 64], [116, 112, 0], [0, 114, 143], [102, 102, 156],
    [250, 141, 255],
], np.uint8)


def _ln(x, p):
    return nn.layer_norm(x, p, eps=1e-5)


def _mha(p: Mapping[str, Any], q, k, v, heads: int,
         bias_add: Optional[jax.Array] = None) -> jax.Array:
    """torch nn.MultiheadAttention (batch-second semantics folded to
    [B, L, C]): fused in_proj split into q/k/v, scaled dot, out_proj.
    bias_add: additive [B_or_1, heads_or_1, Lq, Lk] logit bias (attn_mask)."""
    w = p["in_proj_weight"]
    b = p["in_proj_bias"]
    c = q.shape[-1]
    qw, kw, vw = w[:c], w[c:2 * c], w[2 * c:]
    qb, kb, vb = b[:c], b[c:2 * c], b[2 * c:]
    qq = q @ qw.T + qb
    kk = k @ kw.T + kb
    vv = v @ vw.T + vb
    bt, lq, _ = qq.shape
    lk = kk.shape[1]
    dh = c // heads
    qq = qq.reshape(bt, lq, heads, dh).transpose(0, 2, 1, 3) * dh ** -0.5
    kk = kk.reshape(bt, lk, heads, dh).transpose(0, 2, 1, 3)
    vv = vv.reshape(bt, lk, heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qq, kk,
                        preferred_element_type=jnp.float32)
    if bias_add is not None:
        logits = logits + bias_add
    attn = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, vv)
    o = o.transpose(0, 2, 1, 3).reshape(bt, lq, c)
    return nn.linear(o, p["out_proj"])


def _sine_pos_embed(h: int, w: int, dim: int) -> np.ndarray:
    """PositionEmbeddingSine(normalize=True) → [h, w, dim] (NHWC; the torch
    original returns NCHW) — position_encoding.py:32-55, N_steps = dim//2."""
    steps = dim // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    eps, scale = 1e-6, 2 * np.pi
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    t = np.arange(steps, dtype=np.float32)
    t = 10000.0 ** (2 * (t // 2) / steps)
    px = x[:, :, None] / t
    py = y[:, :, None] / t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], -1).reshape(h, w, steps)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], -1).reshape(h, w, steps)
    return np.concatenate([py, px], axis=-1)


# ---------------------------------------------------------------- Swin-L ---


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(win: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """swin.py BasicLayer.forward attn mask for SW-MSA: [nW, N, N] additive."""
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _swin_block(p: Mapping[str, Any], x: jax.Array, hw: Tuple[int, int],
                ws: int, shift: int) -> jax.Array:
    h, w = hw
    b = x.shape[0]
    c = x.shape[-1]
    heads = p["attn"]["relative_position_bias_table"].shape[-1]
    shortcut = x
    x = _ln(x, p["norm1"]).reshape(b, h, w, c)
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    win = _window_partition(x, ws)  # [nW*B, N, C]
    n = ws * ws
    qkv = nn.linear(win, p["attn"]["qkv"]).reshape(-1, n, 3, heads, c // heads)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * (c // heads) ** -0.5
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    logits = jnp.einsum("whqd,whkd->whqk", q, k,
                        preferred_element_type=jnp.float32)
    bias = p["attn"]["relative_position_bias_table"][
        np.asarray(_rel_pos_index(ws).reshape(-1))
    ].reshape(n, n, heads).transpose(2, 0, 1)
    logits = logits + bias[None]
    if shift:
        m = jnp.asarray(_shift_mask(hp, wp, ws, shift))  # [nW, N, N]
        nw = m.shape[0]
        logits = logits.reshape(-1, nw, heads, n, n) + m[None, :, None]
        logits = logits.reshape(-1, heads, n, n)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("whqk,whkd->whqd", attn, v).transpose(0, 2, 1, 3).reshape(-1, n, c)
    o = nn.linear(o, p["attn"]["proj"])
    x = _window_reverse(o, ws, hp, wp)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :h, :w].reshape(b, h * w, c)
    x = shortcut + x
    h2 = _ln(x, p["norm2"])
    h2 = nn.linear(h2, p["mlp"]["fc1"])
    h2 = nn.gelu(h2)
    return x + nn.linear(h2, p["mlp"]["fc2"])


def _patch_merge(p: Mapping[str, Any], x: jax.Array, hw) -> Tuple[jax.Array, Tuple[int, int]]:
    h, w = hw
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(b, -1, 4 * c)
    x = _ln(x, p["norm"])
    return x @ p["reduction"]["weight"].T, ((h + 1) // 2, (w + 1) // 2)


def swin_features(params: Mapping[str, Any], x: jax.Array) -> Dict[str, jax.Array]:
    """D2SwinTransformer.forward (swin.py:652-680): NHWC input (normalized)
    → {res2..res5} NHWC feature maps. Geometry is shape-derived: depth from
    block count, window from the bias-table rows, heads from its columns."""
    x = nn.conv2d(x, params["patch_embed"]["proj"], stride=params["patch_embed"]["proj"]["weight"].shape[0])
    b, hh, ww, c = x.shape
    x = nn.layer_norm(x, params["patch_embed"]["norm"], eps=1e-5).reshape(b, hh * ww, c)
    outs: Dict[str, jax.Array] = {}
    layers = params["layers"]
    n_stages = len(layers)
    hw = (hh, ww)
    for i in range(n_stages):
        lp = layers[str(i)]
        blocks = lp["blocks"]
        tbl = blocks["0"]["attn"]["relative_position_bias_table"]
        ws = (int(round(tbl.shape[0] ** 0.5)) + 1) // 2
        for j in range(len(blocks)):
            shift = 0 if j % 2 == 0 else ws // 2
            # no shift when a single window covers the map (swin block pads
            # first; torch applies the same roll — identical under full pad)
            x = _swin_block(blocks[str(j)], x, hw, ws, shift)
        key = f"norm{i}"
        if key in params:
            o = _ln(x, params[key])
            outs[f"res{i + 2}"] = o.reshape(b, hw[0], hw[1], -1)
        if "downsample" in lp:
            x, hw = _patch_merge(lp["downsample"], x, hw)
    return outs


# --------------------------------------------- MSDeformAttn pixel decoder ---


def ms_deform_sample(value: jax.Array, spatial_shapes: Sequence[Tuple[int, int]],
                     loc: jax.Array, attn_w: jax.Array) -> jax.Array:
    """ms_deform_attn_core_pytorch (ms_deform_attn_func.py:58-77) in JAX.

    value:  [B, S, M, D] flattened multi-level features (S = Σ H_l·W_l)
    loc:    [B, Lq, M, L, P, 2] sampling locations in [0, 1]
    attn_w: [B, Lq, M, L, P] softmaxed weights
    → [B, Lq, M*D]. grid_sample(align_corners=False, padding zeros):
    pixel x = gx·W − 0.5."""
    bsz, _s, m, d = value.shape
    _, lq, _, nl, npt, _ = loc.shape
    start = 0
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w].reshape(bsz, h, w, m, d)
        v = v.transpose(0, 3, 1, 2, 4).reshape(bsz * m, h * w, d)
        g = loc[:, :, :, lvl]  # [B, Lq, M, P, 2] (x, y)
        gx = g[..., 0] * w - 0.5
        gy = g[..., 1] * h - 0.5
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = gx - x0
        fy = gy - y0
        acc = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                idx = (jnp.clip(yi, 0, h - 1) * w
                       + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
                # [B, Lq, M, P] → gather per (B, M) row
                idx_bm = idx.transpose(0, 2, 1, 3).reshape(bsz * m, lq * npt)
                got = jnp.take_along_axis(v, idx_bm[:, :, None], axis=1)
                got = got.reshape(bsz, m, lq, npt, d)
                wgt = (jnp.where(dx, fx, 1 - fx) * jnp.where(dy, fy, 1 - fy)
                       * ok).transpose(0, 2, 1, 3)  # [B, M, Lq, P]
                acc = acc + got * wgt[..., None]
        sampled.append(acc)  # [B, M, Lq, P, D]
        start += h * w
    out = jnp.stack(sampled, axis=3)  # [B, M, Lq, L, P, D]
    wfull = attn_w.transpose(0, 2, 1, 3, 4)  # [B, M, Lq, L, P]
    out = (out * wfull[..., None]).sum(axis=(3, 4))  # [B, M, Lq, D]
    return out.transpose(0, 2, 1, 3).reshape(bsz, lq, m * d)


def _msdeform_layer(p: Mapping[str, Any], src: jax.Array, pos: jax.Array,
                    refpts: jax.Array, spatial_shapes) -> jax.Array:
    """MSDeformAttnTransformerEncoderLayer.forward (msdeformattn.py:119-130),
    dropout inactive at inference."""
    sa = p["self_attn"]
    q = src + pos
    m_l_p2 = sa["sampling_offsets"]["weight"].shape[0]
    nl = len(spatial_shapes)
    m = 8
    npt = m_l_p2 // (m * nl * 2)
    bsz, s, c = src.shape
    value = nn.linear(src, sa["value_proj"]).reshape(bsz, s, m, c // m)
    off = nn.linear(q, sa["sampling_offsets"]).reshape(bsz, s, m, nl, npt, 2)
    aw = nn.linear(q, sa["attention_weights"]).reshape(bsz, s, m, nl * npt)
    aw = jax.nn.softmax(aw, axis=-1).reshape(bsz, s, m, nl, npt)
    normalizer = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    loc = refpts[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
    attn_out = ms_deform_sample(value, spatial_shapes, loc, aw)
    src = src + nn.linear(attn_out, sa["output_proj"])
    src = _ln(src, p["norm1"])
    h2 = jax.nn.relu(nn.linear(src, p["linear1"]))
    src = src + nn.linear(h2, p["linear2"])
    return _ln(src, p["norm2"])


def _encoder_ref_points(spatial_shapes) -> np.ndarray:
    """get_reference_points (msdeformattn.py:139-152), valid_ratios = 1."""
    pts = []
    for h, w in spatial_shapes:
        ry, rx = np.meshgrid(np.linspace(0.5, h - 0.5, h, dtype=np.float32) / h,
                             np.linspace(0.5, w - 0.5, w, dtype=np.float32) / w,
                             indexing="ij")
        pts.append(np.stack([rx.reshape(-1), ry.reshape(-1)], -1))
    # [1, S, 1, 2] — level dim broadcasts (valid_ratios ≡ 1 ⇒ identical per level)
    return np.concatenate(pts, 0)[None, :, None, :]


def pixel_decoder_apply(p: Mapping[str, Any], feats: Dict[str, jax.Array]):
    """MSDeformAttnPixelDecoder.forward_features (msdeformattn.py:319-358):
    → (mask_features [B,h4,w4,mask_dim], 3 multi-scale maps [1/32,1/16,1/8])."""
    order = ["res5", "res4", "res3"]  # top-down, matching input_proj order
    srcs, poss, shapes = [], [], []
    conv_dim = p["input_proj"]["0"]["0"]["weight"].shape[-1]
    for i, f in enumerate(order):
        x = feats[f]
        proj = p["input_proj"][str(i)]
        x = nn.conv2d(x, proj["0"])
        x = nn.group_norm(x, proj["1"], num_groups=32, eps=1e-5)
        b, h, w, _ = x.shape
        srcs.append(x.reshape(b, h * w, conv_dim))
        pe = jnp.asarray(_sine_pos_embed(h, w, conv_dim))
        poss.append(jnp.broadcast_to(pe.reshape(1, h * w, conv_dim),
                                     (b, h * w, conv_dim))
                    + p["transformer"]["level_embed"][i][None, None])
        shapes.append((h, w))
    src = jnp.concatenate(srcs, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    refpts = jnp.asarray(_encoder_ref_points(shapes))
    enc = p["transformer"]["encoder"]["layers"]
    for i in range(len(enc)):
        src = _msdeform_layer(enc[str(i)], src, pos, refpts, shapes)
    outs = []
    start = 0
    for (h, w) in shapes:
        b = src.shape[0]
        outs.append(src[:, start:start + h * w].reshape(b, h, w, conv_dim))
        start += h * w
    # extra FPN level for res2 (adapter_1 lateral + layer_1 output conv)
    lat = nn.conv2d(feats["res2"], p["adapter_1"])
    lat = nn.group_norm(lat, p["adapter_1"]["norm"], num_groups=32, eps=1e-5)
    up = jax.image.resize(outs[-1], lat.shape, method="bilinear")
    y = nn.conv2d(lat + up, p["layer_1"], padding=1)
    y = jax.nn.relu(nn.group_norm(y, p["layer_1"]["norm"], num_groups=32, eps=1e-5))
    mask_features = nn.conv2d(y, p["mask_features"])
    return mask_features, outs  # outs: [1/32, 1/16, 1/8]


# ------------------------------------------------------ masked decoder ---


def _mlp(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    n = len(p["layers"])
    for i in range(n):
        x = nn.linear(x, p["layers"][str(i)])
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def _class_transformer(p: Mapping[str, Any], mask_features: jax.Array,
                       query_pos: jax.Array, nheads: int) -> jax.Array:
    """transformer.py Transformer.forward with 0 encoder layers, task-token
    tgt init. Caller quirk kept (oneformer_transformer_decoder.py:436-439):
    src = sine PE of mask_features, pos_embed = class_input_proj(mask_features)
    — memory/value is the PE, keys get PE+proj added."""
    b, h, w, c = mask_features.shape
    pe = jnp.asarray(_sine_pos_embed(h, w, c)).reshape(1, h * w, c)
    memory = jnp.broadcast_to(pe, (b, h * w, c))
    pos = p["_class_input_proj_out"]  # [B, HW, C], precomputed by caller
    nq = query_pos.shape[0]
    tgt = jnp.broadcast_to(p["_task_token"], (b, nq, c))
    qp = query_pos[None]
    dec = p["class_transformer"]["decoder"]
    for i in range(len(dec["layers"])):
        lp = dec["layers"][str(i)]
        tgt = tgt + _mha(lp["self_attn"], tgt + qp, tgt + qp, tgt, nheads)
        tgt = _ln(tgt, lp["norm1"])
        tgt = tgt + _mha(lp["multihead_attn"], tgt + qp, memory + pos,
                         memory, nheads)
        tgt = _ln(tgt, lp["norm2"])
        h2 = jax.nn.relu(nn.linear(tgt, lp["linear1"]))
        tgt = _ln(tgt + nn.linear(h2, lp["linear2"]), lp["norm3"])
    return _ln(tgt, dec["norm"])


def _prediction_heads(p, output, mask_features, target_hw, nheads):
    """forward_prediction_heads (oneformer_transformer_decoder.py:495-516)."""
    dec = _ln(output, p["decoder_norm"])
    cls = nn.linear(dec, p["class_embed"])
    memb = _mlp(p["mask_embed"], dec)
    masks = jnp.einsum("bqc,bhwc->bqhw", memb, mask_features)
    am = jax.image.resize(masks, masks.shape[:2] + tuple(target_hw),
                          method="bilinear")
    b, q = am.shape[:2]
    am = jax.nn.sigmoid(am.reshape(b, q, -1)) < 0.5  # True = blocked
    all_blocked = jnp.all(am, axis=-1, keepdims=True)
    am = jnp.where(all_blocked, False, am)
    bias = jnp.where(am, -1e9, 0.0).astype(jnp.float32)[:, None]  # [B,1,Q,HW]
    return cls, masks, bias


def predictor_apply(p: Mapping[str, Any], ms_feats: List[jax.Array],
                    mask_features: jax.Array, task_token: jax.Array,
                    nheads: int = 8):
    """ContrastiveMultiScaleMaskedTransformerDecoder.forward (inference):
    → (pred_logits [B,Q,K+1], pred_masks [B,Q,h4,w4])."""
    hidden = p["query_embed"]["weight"].shape[-1]
    srcs, poss, sizes = [], [], []
    for i, x in enumerate(ms_feats):
        b, h, w, c = x.shape
        sizes.append((h, w))
        pe = jnp.asarray(_sine_pos_embed(h, w, hidden)).reshape(1, h * w, hidden)
        poss.append(jnp.broadcast_to(pe, (b, h * w, hidden)))
        srcs.append(x.reshape(b, h * w, c) + p["level_embed"]["weight"][i][None, None])
    b = srcs[0].shape[0]
    task = _ln(task_token, p["decoder_norm"])  # use_task_norm=True
    cls_proj = nn.conv2d(mask_features, p["class_input_proj"])
    bb, hh, ww, cc = cls_proj.shape
    ct_params = dict(p)
    ct_params["_class_input_proj_out"] = cls_proj.reshape(bb, hh * ww, cc)
    ct_params["_task_token"] = task[:, None] if task.ndim == 2 else task
    out_t = _class_transformer(ct_params, mask_features,
                               p["query_embed"]["weight"][:-1], nheads)
    output = jnp.concatenate([out_t, ct_params["_task_token"]], axis=1)
    qp = p["query_embed"]["weight"][None]
    layers_sa = p["transformer_self_attention_layers"]
    layers_ca = p["transformer_cross_attention_layers"]
    layers_ff = p["transformer_ffn_layers"]
    n_layers = len(layers_ca)
    _, _, bias = _prediction_heads(p, output, mask_features, sizes[0], nheads)
    for i in range(n_layers):
        lvl = i % len(ms_feats)
        ca = layers_ca[str(i)]
        output = output + _mha(ca["multihead_attn"], output + qp,
                               srcs[lvl] + poss[lvl], srcs[lvl], nheads,
                               bias_add=bias)
        output = _ln(output, ca["norm"])
        sa = layers_sa[str(i)]
        output = output + _mha(sa["self_attn"], output + qp, output + qp,
                               output, nheads)
        output = _ln(output, sa["norm"])
        ff = layers_ff[str(i)]
        h2 = jax.nn.relu(nn.linear(output, ff["linear1"]))
        output = _ln(output + nn.linear(h2, ff["linear2"]), ff["norm"])
        cls, masks, bias = _prediction_heads(
            p, output, mask_features, sizes[(i + 1) % len(ms_feats)], nheads)
    return cls, masks


def oneformer_apply(params: Mapping[str, Any], x: jax.Array,
                    task_tokens: jax.Array):
    """Full OneFormer semantic forward on a padded, normalized NHWC image.
    → (pred_logits [B,Q,K+1], pred_masks [B,Q,H/4,W/4])."""
    feats = swin_features(params["backbone"], x)
    maskf, ms = pixel_decoder_apply(params["sem_seg_head"]["pixel_decoder"], feats)
    task = _mlp(params["task_mlp"], task_tokens.astype(jnp.float32))
    return predictor_apply(params["sem_seg_head"]["predictor"], ms, maskf,
                           task[:, None])


# ------------------------------------------------------------- detector ---


_CONFIGS = {
    "ade20k": {"ckpt": "250_16_swin_l_oneformer_ade20k_160k.pth",
               "palette": ADE20K_PALETTE},
    "coco": {"ckpt": "150_16_swin_l_oneformer_coco_100ep.pth",
             "palette": COCO_PANOPTIC_PALETTE},
}


def task_token_ids(task: str = "semantic", seq_len: int = 77) -> np.ndarray:
    """Tokenize(SimpleTokenizer(), 77)('The task is semantic') — CLIP BPE
    with sot/eot, zero-padded (oneformer/data/tokenizer.py:86-116)."""
    from ..text.tokenizer import default_tokenizer

    tok = default_tokenizer()
    ids = [tok.bos] + list(tok.ids(f"The task is {task}")) + [tok.eos]
    out = np.zeros((seq_len,), np.int64)
    out[:len(ids)] = ids[:seq_len]
    return out


class OneformerDetector:
    """Semantic-run OneFormer (reference api.py make_detectron2_model +
    semantic_run). kind: 'ade20k' or 'coco'."""

    MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
    STD = np.asarray([58.395, 57.12, 57.375], np.float32)
    MIN_TEST, MAX_TEST = 640, 2560

    def __init__(self, kind: str, model_dir: Optional[str] = None):
        self.kind = kind
        self.cfg = _CONFIGS[kind]
        self.model_dir = model_dir or "models/oneformer"
        self.params: Optional[Dict[str, Any]] = None
        self._jit = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None
        except Exception:
            return False

    def load(self, params: Optional[Dict[str, Any]] = None):
        if params is not None:
            self.params = params
            return
        if self.params is not None or not os.path.isdir(self.model_dir):
            return
        cands = [self.cfg["ckpt"]] + [
            f for f in sorted(os.listdir(self.model_dir))
            if self.kind in f and f.endswith((".pt", ".pth", ".safetensors"))]
        path = next((os.path.join(self.model_dir, c) for c in cands
                     if os.path.isfile(os.path.join(self.model_dir, c))), None)
        if path is None:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(path)
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        # training-only branches (oneformer_model.py: encode_text under
        # self.training) and criterion buffers are dropped
        drop = ("text_encoder.", "text_projector.", "prompt_ctx.", "criterion.")
        sd = {k: v for k, v in sd.items()
              if not any(k.startswith(d) or f".{d}" in k for d in drop)
              and "relative_position_index" not in k
              and "attn_mask" not in k}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray) -> np.ndarray:
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(
                f"no {self.cfg['ckpt']} under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(oneformer_apply)
        h, w = img.shape[:2]
        # detectron2 ResizeShortestEdge(640, 2560)
        scale = self.MIN_TEST / min(h, w)
        if max(h, w) * scale > self.MAX_TEST:
            scale = self.MAX_TEST / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        feed = (feed.astype(np.float32) - self.MEAN) / self.STD
        # ImageList.from_tensors(size_divisibility=32): bottom/right zero pad
        ph = -(-nh // 32) * 32
        pw = -(-nw // 32) * 32
        feed = np.pad(feed, ((0, ph - nh), (0, pw - nw), (0, 0)))
        tokens = jnp.asarray(task_token_ids("semantic")[None])
        cls, masks = self._jit(self.params, jnp.asarray(feed[None]), tokens)
        # oneformer_model.py:293-322: upsample masks to padded size, crop to
        # the resized image, then semantic_inference at original resolution
        masks = jax.image.resize(masks, masks.shape[:2] + (ph, pw),
                                 method="bilinear")[:, :, :nh, :nw]
        masks = jax.image.resize(masks, masks.shape[:2] + (h, w),
                                 method="bilinear")
        prob = jax.nn.softmax(cls, axis=-1)[..., :-1]
        semseg = jnp.einsum("bqc,bqhw->bchw", prob, jax.nn.sigmoid(masks))
        seg = np.asarray(jnp.argmax(semseg[0], axis=0))
        palette = self.cfg["palette"]
        return palette[seg % len(palette)].astype(np.uint8)


_DETECTORS: Dict[str, OneformerDetector] = {}


def get_oneformer(kind: str) -> OneformerDetector:
    if kind not in _DETECTORS:
        _DETECTORS[kind] = OneformerDetector(kind)
    return _DETECTORS[kind]


def _run(kind: str, img, res):
    from .cv import resize_image

    out = get_oneformer(kind).detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _seg_ofade20k(img, res, a=0.0, b=0.0):
    return _run("ade20k", img, res)


def _seg_ofcoco(img, res, a=0.0, b=0.0):
    return _run("coco", img, res)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("seg_ofade20k", _seg_ofade20k,
                          tags=("Segmentation",), needs_weights=True),
             aliases=("oneformer",))
    register(Preprocessor("seg_ofcoco", _seg_ofcoco,
                          tags=("Segmentation",), needs_weights=True))


_register()
