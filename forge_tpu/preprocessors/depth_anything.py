"""Depth Anything V2 annotator in JAX: DINOv2 ViT encoder + DPT head.

Re-expression of the model the reference loads from the `depth_anything_v2`
pip package (driver: extensions-builtin/forge_legacy_preprocessors/annotator/
depth_anything_v2.py — vitl, features 256, out_channels [256,512,1024,1024]).
The architecture is the published DPT-on-DINOv2 design; everything
shape-dependent (hidden width, depth, tap indices, out_channels) is derived
from the checkpoint rather than hardcoded, so vits/vitb/vitl checkpoints all
load.

State dict layout (depth_anything_v2_vitl.safetensors):
  pretrained.{cls_token,pos_embed,patch_embed.proj,blocks.N.*,norm}   DINOv2
  depth_head.{projects.N, resize_layers.N, scratch.layerN_rn,
              scratch.refinenetN.resConfUnit{1,2}.conv{1,2},
              scratch.refinenetN.out_conv, scratch.output_conv1,
              scratch.output_conv2.{0,2}}                             DPT
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .mlsd import _upsample2_align  # align_corners=True bilinear


def _resize_align(x: jax.Array, hw) -> jax.Array:
    """bilinear align_corners=True to an arbitrary size."""
    def axis(n_in, n_out):
        pos = jnp.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
        return i0, (pos - i0).astype(jnp.float32)

    h, w = hw
    i0, fy = axis(x.shape[1], h)
    rows = x[:, i0] * (1 - fy)[None, :, None, None] + x[:, jnp.minimum(i0 + 1, x.shape[1] - 1)] * fy[None, :, None, None]
    j0, fx = axis(x.shape[2], w)
    return rows[:, :, j0] * (1 - fx)[None, None, :, None] \
        + rows[:, :, jnp.minimum(j0 + 1, x.shape[2] - 1)] * fx[None, None, :, None]


def _vit_block(p: Mapping[str, Any], x: jax.Array, heads: int) -> jax.Array:
    from ..ops.attention import attention

    h = nn.layer_norm(x, p["norm1"], eps=1e-6)
    qkv = nn.linear(h, p["attn"]["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = attention(q, k, v, heads=heads)
    a = nn.linear(a, p["attn"]["proj"])
    if "ls1" in p:  # DINOv2 layer scale
        a = a * p["ls1"]["gamma"]
    x = x + a
    h = nn.layer_norm(x, p["norm2"], eps=1e-6)
    h = nn.linear(jax.nn.gelu(nn.linear(h, p["mlp"]["fc1"]), approximate=False),
                  p["mlp"]["fc2"])
    if "ls2" in p:
        h = h * p["ls2"]["gamma"]
    return x + h


def _interp_pos_embed(pos: jax.Array, ph: int, pw: int) -> jax.Array:
    """DINOv2 interpolate_pos_encoding: bicubic-resize the patch grid."""
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    n = patch_pos.shape[1]
    side = int(np.sqrt(n))
    grid = patch_pos.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, ph, pw, grid.shape[-1]), "bicubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, ph * pw, -1)], axis=1)


def _residual_conv_unit(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    h = nn.conv2d(jax.nn.relu(x), p["conv1"], padding=1)
    h = nn.conv2d(jax.nn.relu(h), p["conv2"], padding=1)
    return h + x


def depth_anything_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [1,H,W,3] normalized (H,W multiples of 14) → depth [1,H,W]."""
    enc = params["pretrained"]
    head = params["depth_head"]
    width = enc["cls_token"].shape[-1]
    heads = width // 64
    n_blocks = len(enc["blocks"])
    # tap layout: 4 intermediate layers, [n//4·1−1 …] — the published
    # configuration taps [2,5,8,11] (vits), [2,5,8,11]·? … general rule used
    # by depth_anything_v2: vits [2,5,8,11], vitb [2,5,8,11], vitl [4,11,17,23]
    taps = {12: (2, 5, 8, 11), 24: (4, 11, 17, 23), 40: (9, 19, 29, 39)}[n_blocks]

    ph, pw = x.shape[1] // 14, x.shape[2] // 14
    h = nn.conv2d(x, enc["patch_embed"]["proj"], stride=14)
    h = h.reshape(1, ph * pw, width)
    h = jnp.concatenate([enc["cls_token"].reshape(1, 1, width), h], axis=1)
    h = h + _interp_pos_embed(enc["pos_embed"], ph, pw)

    feats = []
    for i in range(n_blocks):
        h = _vit_block(enc["blocks"][str(i)], h, heads)
        if i in taps:
            feats.append(h[:, 1:])  # patch tokens (use_clstoken=False)

    outs = []
    for i, f in enumerate(feats):
        g = f.reshape(1, ph, pw, width)
        g = nn.conv2d(g, head["projects"][str(i)])
        if i == 0:  # 4× transpose conv
            g = nn.conv2d_transpose(g, head["resize_layers"][str(i)], stride=4)
        elif i == 1:  # 2× transpose conv
            g = nn.conv2d_transpose(g, head["resize_layers"][str(i)], stride=2)
        elif i == 3:  # stride-2 3×3 conv
            g = nn.conv2d(g, head["resize_layers"][str(i)], stride=2, padding=1)
        outs.append(g)

    scratch = head["scratch"]
    rn = [nn.conv2d(outs[i], scratch[f"layer{i + 1}_rn"], padding=1)
          for i in range(4)]

    def fuse(p, x0, x1, size):
        out = x0
        if x1 is not None:
            out = out + _residual_conv_unit(p["resConfUnit1"], x1)
        out = _residual_conv_unit(p["resConfUnit2"], out)
        out = _resize_align(out, size)
        return nn.conv2d(out, p["out_conv"])

    path = fuse(scratch["refinenet4"], rn[3], None, rn[2].shape[1:3])
    path = fuse(scratch["refinenet3"], path, rn[2], rn[1].shape[1:3])
    path = fuse(scratch["refinenet2"], path, rn[1], rn[0].shape[1:3])
    path = fuse(scratch["refinenet1"], path, rn[0],
                (rn[0].shape[1] * 2, rn[0].shape[2] * 2))

    out = nn.conv2d(path, scratch["output_conv1"], padding=1)
    out = _resize_align(out, (ph * 14, pw * 14))
    out = nn.conv2d(out, scratch["output_conv2"]["0"], padding=1)
    out = nn.conv2d(jax.nn.relu(out), scratch["output_conv2"]["2"])
    return jax.nn.relu(out)[:, :, :, 0]


class DepthAnythingDetector:
    def __init__(self, model_dir: str = "models/depth_anything_v2"):
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
                 if f.endswith((".safetensors", ".pth", ".pt"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H,W,3] → normalized depth uint8 [H,W] (reference
        DepthAnythingV2Detector.__call__, colored=False path)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no depth_anything_v2 checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(depth_anything_apply)
        h, w = img.shape[:2]
        # lower-bound 518 resize, multiple of 14 (reference transform chain)
        scale = 518.0 / min(h, w)
        nh = max(int(round(h * scale / 14)) * 14, 518)
        nw = max(int(round(w * scale / 14)) * 14, 518)
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
        feed = feed.astype(np.float32) / 255.0
        feed = (feed - np.asarray([0.485, 0.456, 0.406], np.float32)) \
            / np.asarray([0.229, 0.224, 0.225], np.float32)
        depth = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0]
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_LINEAR)
        lo, hi = depth.min(), depth.max()
        return ((depth - lo) / max(hi - lo, 1e-8) * 255.0).astype(np.uint8)


_DETECTOR: Optional[DepthAnythingDetector] = None


def get_depth_anything() -> DepthAnythingDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = DepthAnythingDetector()
    return _DETECTOR


def _depth_anything(img, res, a, b):
    from .cv import resize_image

    d = get_depth_anything().detect(resize_image(img, res))
    return np.repeat(d[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("depth_anything_v2", _depth_anything,
                          tags=("Depth",), needs_weights=True),
             aliases=("depth_anything",))


_register()
