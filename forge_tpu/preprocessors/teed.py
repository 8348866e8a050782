"""TEED soft-edge annotator (Tiny & Efficient Edge Detector) in JAX.

Re-expression of the reference's TED net (extensions-builtin/
forge_legacy_preprocessors/annotator/teed/ted.py:188): two smish conv stems,
one dense block, three up-conv side outputs fused by the depthwise
DoubleFusion head; the detector averages the sigmoid side maps and
safe-steps the result (teed/__init__.py:40). Checkpoint:
models/TEED/7_model.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _smish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jnp.log1p(jax.nn.sigmoid(x)))


def _double_conv(p, x, stride=1, use_act=True):
    x = _smish(nn.conv2d(x, p["conv1"], stride=stride, padding=1))
    x = nn.conv2d(x, p["conv2"], padding=1)
    return _smish(x) if use_act else x


def _dense_layer(p, x1, x2):
    h = nn.conv2d(_smish(x1), p["conv1"], padding=2)
    h = nn.conv2d(_smish(h), p["conv2"], padding=0)
    return 0.5 * (h + x2)


def _up_block(p, x, up_scale):
    # features Sequential: [conv1×1, smish, convT]×up_scale
    # (k = 2^up_scale, stride 2, pad = all_pads[up_scale]: [0,0,1,...])
    pads = [0, 0, 1, 3, 7]
    idx = 0
    for _ in range(up_scale):
        x = _smish(nn.conv2d(x, p["features"][str(idx)]))
        x = nn.conv2d_transpose(x, p["features"][str(idx + 2)], stride=2,
                                padding=pads[up_scale])
        idx += 3
    return x


def teed_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] raw 0..255 floats, H/W even → averaged sigmoid edge map
    [B,H,W] (the reference's mean-of-side-outputs + sigmoid)."""
    b1 = _double_conv(params["block_1"], x, stride=2)
    b1_side = nn.conv2d(b1, params["side_1"]["conv"], stride=2)
    b2 = _double_conv(params["block_2"], b1, use_act=False)
    b2_down = jax.lax.reduce_window(b2, -np.inf, jax.lax.max,
                                    (1, 3, 3, 1), (1, 2, 2, 1),
                                    [(0, 0), (1, 1), (1, 1), (0, 0)])
    b2_add = b2_down + b1_side
    b3_pre = nn.conv2d(b2_down, params["pre_dense_3"]["conv"])
    b3 = _dense_layer(params["dblock_3"]["denselayer1"], b2_add, b3_pre)

    out1 = _up_block(params["up_block_1"], b1, 1)
    out2 = _up_block(params["up_block_2"], b2, 1)
    out3 = _up_block(params["up_block_3"], b3, 2)

    cat = jnp.concatenate([out1, out2, out3], axis=-1)  # [B,H,W,3]
    fp = params["block_cat"]
    attn = nn.conv2d(_smish(cat), fp["DWconv1"], padding=1,
                     feature_group_count=3)             # [B,H,W,24]
    attn2 = nn.conv2d(_smish(attn), fp["DWconv2"], padding=1,
                      feature_group_count=24)
    fused = _smish(jnp.sum(attn2 + attn, axis=-1))      # [B,H,W]

    maps = [out1[..., 0], out2[..., 0], out3[..., 0], fused]
    h, w = x.shape[1:3]
    maps = [jax.image.resize(m, (m.shape[0], h, w), "bilinear") for m in maps]
    return jax.nn.sigmoid(jnp.mean(jnp.stack(maps, axis=-1), axis=-1))


class TeedDetector:
    def __init__(self, model_dir: str = "models/TEED"):
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

    def detect(self, img: np.ndarray, safe_steps: int = 2) -> np.ndarray:
        import cv2

        from .hed import _safe_step

        self.load()
        if self.params is None:
            raise RuntimeError(f"no TEED checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(teed_apply)
        h, w = img.shape[:2]
        nh, nw = ((h + 7) // 8) * 8, ((w + 7) // 8) * 8
        feed = (cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
                if (nh, nw) != (h, w) else img)
        edge = np.asarray(self._jit(self.params,
                                    jnp.asarray(feed[None].astype(np.float32))))[0]
        edge = cv2.resize(edge, (w, h), interpolation=cv2.INTER_LINEAR)
        if safe_steps:
            edge = _safe_step(edge, safe_steps)
        return (edge * 255.0).clip(0, 255).astype(np.uint8)


_DETECTOR: Optional[TeedDetector] = None


def get_teed() -> TeedDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = TeedDetector()
    return _DETECTOR


def _teed(img, res, a, b):
    from .cv import resize_image

    e = get_teed().detect(resize_image(img, res), safe_steps=int(a) if a else 2)
    return np.repeat(e[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("softedge_teed", _teed,
                          slider_a=("Safe Steps", 0, 10, 2),
                          tags=("SoftEdge",), needs_weights=True),
             aliases=("teed",))


_register()
