"""UniFormer + UPerHead ADE20k semantic-segmentation annotator in JAX.

Re-expression of the reference's seg preprocessor (extensions-builtin/
forge_legacy_preprocessors/annotator/uniformer/uniformer.py backbone +
annotator/mmpkg/mmseg/models/decode_heads/uper_head.py head, config
upernet_global_small.py): a 4-stage hybrid conv/attention backbone
(embed dims [64,128,320,512], layers [3,4,8,3] — stages 1-2 CBlocks with
depthwise "attention" convs and BatchNorm, stages 3-4 global self-attention
blocks with LayerNorm, head_dim 64), feeding a UPerNet head (PPM pyramid
pooling at scales 1/2/3/6 over the last stage, FPN top-down fusion,
150-class 1×1 classifier). Inference follows the mmseg "whole" test mode:
rescale to fit (2048, 512) keep-ratio, channel-reverse + normalize
(mmcv Normalize to_rgb=True on the RGB input, reproduced bug-for-bug),
bilinear align_corners=False logits upsample, argmax, ADE20k palette.

Every block count and channel width is derived from the checkpoint
(upernet_global_small.pth, mmcv layout with 'state_dict' wrapper), so any
global-attention UniFormer+UPerHead seg checkpoint loads. The auxiliary FCN
head in the checkpoint is a training-time construct and is ignored, as in
the reference's whole-mode inference (mmseg encode_decode path).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

# ADE20k palette (mmseg core/evaluation/class_names.py ade_palette — dataset
# constants, same role as the openpose limb tables)
ADE20K_PALETTE = np.asarray([
    [120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50],
    [4, 200, 3], [120, 120, 80], [140, 140, 140], [204, 5, 255],
    [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
    [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
    [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
    [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
    [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220],
    [255, 9, 92], [112, 9, 255], [8, 255, 214], [7, 255, 224],
    [255, 184, 6], [10, 255, 71], [255, 41, 10], [7, 255, 255],
    [224, 255, 8], [102, 8, 255], [255, 61, 6], [255, 194, 7],
    [255, 122, 8], [0, 255, 20], [255, 8, 41], [255, 5, 153],
    [6, 51, 255], [235, 12, 255], [160, 150, 20], [0, 163, 255],
    [140, 140, 140], [250, 10, 15], [20, 255, 0], [31, 255, 0],
    [255, 31, 0], [255, 224, 0], [153, 255, 0], [0, 0, 255],
    [255, 71, 0], [0, 235, 255], [0, 173, 255], [31, 0, 255],
    [11, 200, 200], [255, 82, 0], [0, 255, 245], [0, 61, 255],
    [0, 255, 112], [0, 255, 133], [255, 0, 0], [255, 163, 0],
    [255, 102, 0], [194, 255, 0], [0, 143, 255], [51, 255, 0],
    [0, 82, 255], [0, 255, 41], [0, 255, 173], [10, 0, 255],
    [173, 255, 0], [0, 255, 153], [255, 92, 0], [255, 0, 255],
    [255, 0, 245], [255, 0, 102], [255, 173, 0], [255, 0, 20],
    [255, 184, 184], [0, 31, 255], [0, 255, 61], [0, 71, 255],
    [255, 0, 204], [0, 255, 194], [0, 255, 82], [0, 10, 255],
    [0, 112, 255], [51, 0, 255], [0, 194, 255], [0, 122, 255],
    [0, 255, 163], [255, 153, 0], [0, 255, 10], [255, 112, 0],
    [143, 255, 0], [82, 0, 255], [163, 255, 0], [255, 235, 0],
    [8, 184, 170], [133, 0, 255], [0, 255, 92], [184, 0, 255],
    [255, 0, 31], [0, 184, 255], [0, 214, 255], [255, 0, 112],
    [92, 255, 0], [0, 224, 255], [112, 224, 255], [70, 184, 160],
    [163, 0, 255], [153, 0, 255], [71, 255, 0], [255, 0, 163],
    [255, 204, 0], [255, 0, 143], [0, 255, 235], [133, 255, 0],
    [255, 0, 235], [245, 0, 255], [255, 0, 122], [255, 245, 0],
    [10, 190, 212], [214, 255, 0], [0, 204, 255], [20, 0, 255],
    [255, 255, 0], [0, 153, 255], [0, 41, 255], [0, 255, 204],
    [41, 0, 255], [41, 255, 0], [173, 0, 255], [0, 245, 255],
    [71, 0, 255], [122, 0, 255], [0, 255, 184], [0, 92, 255],
    [184, 255, 0], [0, 133, 255], [255, 214, 0], [25, 194, 194],
    [102, 255, 0], [92, 0, 255],
], np.uint8)


def _bn(x: jax.Array, p: Mapping[str, Any], eps: float = 1e-5) -> jax.Array:
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale.astype(x.dtype) + (
        p["bias"] - p["running_mean"] * scale).astype(x.dtype)


def _ln(x, p):
    return nn.layer_norm(x, p, eps=1e-6)


def _resize_bilinear(x: jax.Array, hw) -> jax.Array:
    """mmseg resize(align_corners=False) ≡ half-pixel-center bilinear.
    antialias=False: torch F.interpolate doesn't antialias, and the PPM
    branch downscales (pool-6 map → 1/32 feature grid)."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear", antialias=False)


def _cblock(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Conv MHRA block (uniformer.py CBlock): all-conv, BatchNorm."""
    dim = x.shape[-1]
    x = x + nn.conv2d(x, p["pos_embed"], padding=1, feature_group_count=dim)
    h = _bn(x, p["norm1"])
    h = nn.conv2d(h, p["conv1"])
    h = nn.conv2d(h, p["attn"], padding=2, feature_group_count=dim)
    x = x + nn.conv2d(h, p["conv2"])
    h = _bn(x, p["norm2"])
    h = nn.conv2d(h, p["mlp"]["fc1"])
    h = nn.gelu(h)
    return x + nn.conv2d(h, p["mlp"]["fc2"])


def _sablock(p: Mapping[str, Any], x: jax.Array, head_dim: int = 64) -> jax.Array:
    """Global self-attention block (uniformer.py SABlock), NHWC in/out."""
    dim = x.shape[-1]
    heads = max(dim // head_dim, 1)
    x = x + nn.conv2d(x, p["pos_embed"], padding=1, feature_group_count=dim)
    b, hh, ww, c = x.shape
    t = x.reshape(b, hh * ww, c)
    h = _ln(t, p["norm1"])
    qkv = nn.linear(h, p["attn"]["qkv"]).reshape(b, hh * ww, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, L, H, D]
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k) * (c // heads) ** -0.5
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(b, hh * ww, c)
    t = t + nn.linear(o, p["attn"]["proj"])
    h = _ln(t, p["norm2"])
    h = nn.linear(h, p["mlp"]["fc1"])
    h = nn.gelu(h)
    t = t + nn.linear(h, p["mlp"]["fc2"])
    return t.reshape(b, hh, ww, c)


def _patch_embed(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    patch = p["proj"]["weight"].shape[0]  # HWIO kernel: k == stride
    x = nn.conv2d(x, p["proj"], stride=patch)
    # plain nn.LayerNorm here (torch default eps 1e-5), unlike the blocks'
    # norm_layer(eps=1e-6) — uniformer.py PatchEmbed
    return nn.layer_norm(x, p["norm"], eps=1e-5)


def uniformer_features(params: Mapping[str, Any], x: jax.Array,
                       head_dim: int = 64):
    """Backbone forward_features: 4 per-stage LayerNormed feature maps.
    head_dim sets the attention head split in stages 3-4 (UniFormer-S/B
    use 64; tests pass 16 so tiny widths still exercise multi-head)."""
    outs = []
    for stage in (1, 2, 3, 4):
        x = _patch_embed(params[f"patch_embed{stage}"], x)
        blocks = params[f"blocks{stage}"]
        for i in range(len(blocks)):
            bp = blocks[str(i)]
            x = _cblock(bp, x) if "conv1" in bp else _sablock(bp, x, head_dim)
        outs.append(_ln(x, params[f"norm{stage}"]))
    return outs


def _conv_module(p: Mapping[str, Any], x: jax.Array, padding: int = 0) -> jax.Array:
    """mmcv ConvModule: conv(no bias) → BN → ReLU."""
    return jax.nn.relu(_bn(nn.conv2d(x, p["conv"], padding=padding), p["bn"]))


def _adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch AdaptiveAvgPool2d(out) bin arithmetic (start floor, end ceil)."""
    b, h, w, c = x.shape

    def pool_axis(t, size, axis):
        segs = []
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(t, lo, hi, axis=axis),
                axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    return pool_axis(pool_axis(x, h, 1), w, 2)


def upernet_apply(params: Mapping[str, Any], feats) -> jax.Array:
    """UPerHead (uper_head.py forward) over backbone features → logits at
    1/4 input resolution, [B, H/4, W/4, num_classes]."""
    # PPM over the deepest feature
    top = feats[-1]
    psp = [top]
    ppm = params["psp_modules"]
    for i in range(len(ppm)):
        scale = (1, 2, 3, 6)[i]
        pooled = _adaptive_avg_pool(top, scale)
        pooled = _conv_module(ppm[str(i)]["1"], pooled)
        psp.append(_resize_bilinear(pooled, top.shape[1:3]))
    laterals = [
        _conv_module(params["lateral_convs"][str(i)], feats[i])
        for i in range(len(feats) - 1)
    ]
    laterals.append(_conv_module(params["bottleneck"],
                                 jnp.concatenate(psp, axis=-1), padding=1))
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _resize_bilinear(
            laterals[i], laterals[i - 1].shape[1:3])
    fpn = [
        _conv_module(params["fpn_convs"][str(i)], laterals[i], padding=1)
        for i in range(len(laterals) - 1)
    ]
    fpn.append(laterals[-1])
    fpn = [_resize_bilinear(f, fpn[0].shape[1:3]) if f.shape[1:3] != fpn[0].shape[1:3]
           else f for f in fpn]
    out = _conv_module(params["fpn_bottleneck"],
                       jnp.concatenate(fpn, axis=-1), padding=1)
    return nn.conv2d(out, params["conv_seg"])


def segment(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Normalized image [B,H,W,3] → class-id map [B,H,W] (whole-mode)."""
    feats = uniformer_features(params["backbone"], x)
    logits = upernet_apply(params["decode_head"], feats)
    logits = _resize_bilinear(logits, x.shape[1:3])
    return jnp.argmax(logits, axis=-1)


class UniformerDetector:
    # mmcv Normalize cfg from configs/_base_/datasets/ade20k.py
    MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
    STD = np.asarray([58.395, 57.12, 57.375], np.float32)

    def __init__(self, model_dir: str = "models/uniformer"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self._jit = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None
        except Exception:
            return False

    def load(self):
        if self.params is not None or not os.path.isdir(self.model_dir):
            return
        cands = [f for f in sorted(os.listdir(self.model_dir))
                 if f.endswith((".pt", ".pth", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        if "state_dict" in sd and isinstance(sd["state_dict"], dict):
            sd = sd["state_dict"]
        sd = {k: v for k, v in sd.items()
              if not k.startswith("auxiliary_head.")}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray) -> np.ndarray:
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(
                f"no upernet_global_small.pth under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(segment)
        h, w = img.shape[:2]
        # mmcv rescale into (2048, 512) keep-ratio
        scale = min(2048 / max(h, w), 512 / min(h, w))
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        # Normalize(to_rgb=True) channel-reverses the (already-RGB) webui
        # input before normalizing — reproduced for output parity
        feed = (feed[..., ::-1].astype(np.float32) - self.MEAN) / self.STD
        seg = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0]
        color = ADE20K_PALETTE[seg % len(ADE20K_PALETTE)]
        return cv2.resize(color, (w, h), interpolation=cv2.INTER_NEAREST)


_DETECTOR: Optional[UniformerDetector] = None


def get_uniformer() -> UniformerDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = UniformerDetector()
    return _DETECTOR


def _seg(img, res, a, b):
    from .cv import resize_image

    return np.asarray(get_uniformer().detect(resize_image(img, res)),
                      np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("seg_ufade20k", _seg, tags=("Segmentation",),
                          needs_weights=True),
             aliases=("segmentation", "seg"))


_register()
