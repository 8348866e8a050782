"""U²-Net salient-object segmentation in JAX — the background-removal net
behind the bundled birefnet-class Space.

The reference's forge_space_birefnet (extensions-builtin/forge_space_birefnet/
forge_app.py) pulls ZhengPeng7/BiRefNet from HuggingFace at install time; this
environment has no egress, so the TPU build ships the same *capability*
(foreground matting → transparent cutout / flat background) on the published
U²-Net architecture (the rembg standard), loading local u2net/u2netp
checkpoints from models/u2net.

Topology is derived from checkpoint keys: RSU depth = number of rebnconvK
entries per stage; channel widths come straight from the conv shapes; the
dilated RSU-F variant (no pooling, dilations 1·2·4·8) applies to stage5/
stage6/stage5d per the published design.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

_F_STAGES = {"stage5", "stage6", "stage5d"}


def _rebnconv(p: Mapping[str, Any], x: jax.Array, dirate: int = 1) -> jax.Array:
    w = p["conv_s1"]["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(dirate, dirate), (dirate, dirate)],
        rhs_dilation=(dirate, dirate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["conv_s1"]["bias"].astype(y.dtype)
    bn = p["bn_s1"]
    scale = bn["weight"] * jax.lax.rsqrt(bn["running_var"] + 1e-5)
    return jax.nn.relu(y * scale + (bn["bias"] - bn["running_mean"] * scale))


def _pool2(x):
    return jax.lax.reduce_window(x, -np.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


def _up_to(x, like):
    return jax.image.resize(x, (x.shape[0],) + like.shape[1:3] + (x.shape[-1],),
                            "bilinear")


def _rsu_depth(p: Mapping[str, Any]) -> int:
    return max(int(k[len("rebnconv"):]) for k in p
               if k.startswith("rebnconv") and not k.endswith("d") and k != "rebnconvin")


def _rsu(p: Mapping[str, Any], x: jax.Array, dilated: bool) -> jax.Array:
    depth = _rsu_depth(p)
    hin = _rebnconv(p["rebnconvin"], x)
    if dilated:  # RSU-F: dilations 1,2,4,8…, no spatial change
        feats = [hin]
        h = hin
        for i in range(1, depth + 1):
            h = _rebnconv(p[f"rebnconv{i}"], h, dirate=2 ** (i - 1))
            feats.append(h)
        d = feats[-1]
        for i in range(depth - 1, 0, -1):
            d = _rebnconv(p[f"rebnconv{i}d"],
                          jnp.concatenate([d, feats[i]], axis=-1),
                          dirate=2 ** (i - 1))
        return d + hin
    feats = []
    h = hin
    for i in range(1, depth):
        h = _rebnconv(p[f"rebnconv{i}"], h)
        feats.append(h)
        if i < depth - 1:
            h = _pool2(h)
    h = _rebnconv(p[f"rebnconv{depth}"], h, dirate=2)
    d = h
    for i in range(depth - 1, 0, -1):
        d = _rebnconv(p[f"rebnconv{i}d"],
                      jnp.concatenate([d, feats[i - 1]], axis=-1))
        if i > 1:
            d = _up_to(d, feats[i - 2])
    return d + hin


def u2net_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] normalized → fused saliency map [B,H,W,1] (sigmoid of the
    d0 side-output fusion, the published U²-Net forward)."""
    enc = []
    h = x
    for i in range(1, 7):
        name = f"stage{i}"
        h = _rsu(params[name], h, name in _F_STAGES)
        enc.append(h)
        if i < 6:
            h = _pool2(h)
    d = enc[5]
    sides = [nn.conv2d(d, params["side6"], padding=1)]
    for i in range(5, 0, -1):
        d = _up_to(d, enc[i - 1])
        name = f"stage{i}d"
        d = _rsu(params[name], jnp.concatenate([d, enc[i - 1]], axis=-1),
                 name in _F_STAGES)
        sides.append(nn.conv2d(d, params[f"side{i}"], padding=1))
    sides = [_up_to(s, x) for s in reversed(sides)]  # d1..d6 at input res
    d0 = nn.conv2d(jnp.concatenate(sides, axis=-1), params["outconv"])
    return jax.nn.sigmoid(d0)


class U2NetMatter:
    def __init__(self, model_dir: str = "models/u2net"):
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
                 if f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def mask(self, img: np.ndarray, size: int = 320) -> np.ndarray:
        """uint8 [H,W,3] → float mask [H,W] in [0,1] (min-max normalized,
        the rembg convention)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no u2net checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(u2net_apply)
        h, w = img.shape[:2]
        feed = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        feed = feed.astype(np.float32) / 255.0
        feed = (feed - np.asarray([0.485, 0.456, 0.406], np.float32)) \
            / np.asarray([0.229, 0.224, 0.225], np.float32)
        m = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0, :, :, 0]
        lo, hi = m.min(), m.max()
        m = (m - lo) / max(hi - lo, 1e-8)
        return cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR)

    def cutout(self, img: np.ndarray, flat_bg: Optional[tuple] = None,
               size: int = 320) -> np.ndarray:
        """→ RGBA cutout, or RGB over a flat background colour (the two
        output modes of the reference birefnet space)."""
        m = self.mask(img, size=size)
        alpha = (m * 255).astype(np.uint8)
        if flat_bg is not None:
            bg = np.asarray(flat_bg, np.float32)[None, None, :]
            out = img.astype(np.float32) * m[..., None] + bg * (1 - m[..., None])
            return out.clip(0, 255).astype(np.uint8)
        return np.concatenate([img, alpha[..., None]], axis=-1)
