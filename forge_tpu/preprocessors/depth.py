"""MiDaS depth preprocessor: DPT (dense prediction transformer) in JAX.

Re-implementation of the published DPT-Large architecture the reference's
depth annotator loads (extensions-builtin/forge_legacy_preprocessors/
annotator/midas/api.py, midas/dpt_depth.py; isl-org/MiDaS): ViT-L/16
backbone with activations tapped after blocks {5,11,17,23}, per-tap readout
projection (cls-token concat → linear+gelu), reassemble convs to pyramid
strides {4,8,16,32}, RefineNet-style fusion decoder, monodepth head.

Checkpoint keys = the released dpt_large-midas .pt layout
(pretrained.model.*, pretrained.act_postprocess{1..4}.*, scratch.*). The
hybrid (ResNet-stem) variant is detected and rejected with a clear error.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _vit_block(p: Mapping[str, Any], x: jax.Array, heads: int) -> jax.Array:
    b, l, c = x.shape
    h = nn.layer_norm(x, p["norm1"])
    qkv = nn.linear(h, p["attn"]["qkv"]).reshape(b, l, 3, heads, c // heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    a = jax.nn.softmax((q * (c // heads) ** -0.5) @ k.transpose(0, 1, 3, 2), axis=-1)
    h = (a @ v).transpose(0, 2, 1, 3).reshape(b, l, c)
    x = x + nn.linear(h, p["attn"]["proj"])
    h = nn.layer_norm(x, p["norm2"])
    h = nn.linear(jax.nn.gelu(nn.linear(h, p["mlp"]["fc1"]), approximate=False),
                  p["mlp"]["fc2"])
    return x + h


def _resize_pos_embed(pos: jax.Array, gh: int, gw: int) -> jax.Array:
    """[1, 1+N, C] trained grid → target grid (bilinear, cls kept)."""
    cls, grid = pos[:, :1], pos[:, 1:]
    n = grid.shape[1]
    side = int(np.sqrt(n))
    c = grid.shape[-1]
    g = grid.reshape(1, side, side, c)
    g = jax.image.resize(g, (1, gh, gw, c), "bilinear")
    return jnp.concatenate([cls, g.reshape(1, gh * gw, c)], axis=1)


def _readout_project(p: Mapping[str, Any], tokens: jax.Array) -> jax.Array:
    """DPT 'project' readout: cat(patch, cls) → linear+gelu → [B,N,C]."""
    cls = tokens[:, :1]
    patches = tokens[:, 1:]
    cat = jnp.concatenate(
        [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
    return jax.nn.gelu(nn.linear(cat, p["project"]["0"]), approximate=False)


def _rcu(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Residual conv unit: x + conv(relu(conv(relu(x))))."""
    h = nn.conv2d(jax.nn.relu(x), p["conv1"], padding=1)
    h = nn.conv2d(jax.nn.relu(h), p["conv2"], padding=1)
    return x + h


def _fusion(p: Mapping[str, Any], x: jax.Array, skip: Optional[jax.Array]) -> jax.Array:
    """FeatureFusionBlock_custom (midas/blocks.py): optional skip through
    resConfUnit1, resConfUnit2, ×2 upsample, 1×1 out conv."""
    if skip is not None:
        x = x + _rcu(p["resConfUnit1"], skip)
    x = _rcu(p["resConfUnit2"], x)
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
    return nn.conv2d(x, p["out_conv"])


def dpt_apply(params: Mapping[str, Any], img: jax.Array,
              heads: int = 16) -> jax.Array:
    """img [B,H,W,3] (ImageNet-normalized) → inverse depth [B,H,W]."""
    vit = params["pretrained"]["model"]
    x = nn.conv2d(img, vit["patch_embed"]["proj"], stride=16)
    b, gh, gw, c = x.shape
    tokens = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(vit["cls_token"].reshape(1, 1, c), (b, 1, c))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + _resize_pos_embed(vit["pos_embed"].reshape(1, -1, c), gh, gw)

    taps = {}
    hook_at = {5: 1, 11: 2, 17: 3, 23: 4}
    for i in range(len(vit["blocks"])):
        tokens = _vit_block(vit["blocks"][str(i)], tokens, heads)
        if i in hook_at:
            taps[hook_at[i]] = tokens
    for n in (1, 2, 3, 4):  # shallow test models: tap the final block
        taps.setdefault(n, tokens)

    feats = {}
    for n in (1, 2, 3, 4):
        pp = params["pretrained"][f"act_postprocess{n}"]
        t = _readout_project(pp["0"], taps[n]).reshape(b, gh, gw, -1)
        t = nn.conv2d(t, pp["3"])  # 1×1 to pyramid width
        if n == 1:  # stride 4: ×4 transpose conv
            t = nn.conv2d_transpose(t, pp["4"], stride=4)
        elif n == 2:  # stride 8: ×2 transpose conv
            t = nn.conv2d_transpose(t, pp["4"], stride=2)
        elif n == 4:  # stride 32: ÷2 conv
            t = nn.conv2d(t, pp["4"], stride=2, padding=1)
        feats[n] = nn.conv2d(t, params["scratch"][f"layer{n}_rn"], padding=1)

    path = _fusion(params["scratch"]["refinenet4"], feats[4], None)
    path = _fusion(params["scratch"]["refinenet3"], path, feats[3])
    path = _fusion(params["scratch"]["refinenet2"], path, feats[2])
    path = _fusion(params["scratch"]["refinenet1"], path, feats[1])

    head = params["scratch"]["output_conv"]
    x = nn.conv2d(path, head["0"], padding=1)
    bb, hh, ww, cc = x.shape
    x = jax.image.resize(x, (bb, hh * 2, ww * 2, cc), "bilinear")
    x = jax.nn.relu(nn.conv2d(x, head["2"], padding=1))
    x = jax.nn.relu(nn.conv2d(x, head["4"]))
    return x[..., 0]


class MidasDetector:
    MEAN = np.asarray([0.5, 0.5, 0.5], np.float32)
    STD = np.asarray([0.5, 0.5, 0.5], np.float32)

    def __init__(self, model_dir: str = "models/midas"):
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
        if self.params is not None:
            return
        if not os.path.isdir(self.model_dir):
            return
        cands = [f for f in sorted(os.listdir(self.model_dir))
                 if f.endswith((".pt", ".pth", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        if any("pretrained.model.patch_embed.backbone" in k for k in sd):
            raise RuntimeError(
                "dpt_hybrid (ResNet-stem) checkpoints are not supported; "
                "use dpt_large-midas")
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self._jit = jax.jit(lambda t: dpt_apply(self.params, t))

    def detect(self, img: np.ndarray, res: int = 384) -> np.ndarray:
        """uint8 [H,W,3] → normalized inverse-depth uint8 [H,W,3]
        (reference annotator/midas/__init__.py: net at 384, minmax-normalized
        to the 0..255 depth map ControlNet expects)."""
        import cv2

        h, w = img.shape[:2]
        small = cv2.resize(img, (res, res), interpolation=cv2.INTER_AREA)
        x = (small.astype(np.float32) / 255.0 - self.MEAN) / self.STD
        self.load()
        if self.params is None:
            raise RuntimeError(f"no MiDaS checkpoint under {self.model_dir}")
        depth = np.asarray(self._jit(jnp.asarray(x[None]))[0], np.float32)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
        lo, hi = depth.min(), depth.max()
        depth = (depth - lo) / max(hi - lo, 1e-6)
        out = (depth * 255).astype(np.uint8)
        return np.repeat(out[..., None], 3, axis=2)


_DETECTOR: Optional[MidasDetector] = None


def get_midas() -> MidasDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = MidasDetector()
    return _DETECTOR


def _depth_midas(img, res, a, b):
    from .cv import resize_image

    out = get_midas().detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("depth_midas", _depth_midas, tags=("Depth",),
                          needs_weights=True),
             aliases=("depth", "depth_midas (MiDaS)"))


_register()
