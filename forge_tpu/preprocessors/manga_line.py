"""MangaLineExtraction (lineart_anime_denoise) in JAX.

Re-expression of the reference's res_skip net (extensions-builtin/
forge_legacy_preprocessors/annotator/manga_line/__init__.py:158): a grayscale
residual hourglass — BN(eps 1e-3)+LeakyReLU(0.2)+conv blocks, 5 down stages
(reps 2/3/5/7/12, stride-2 on each stage's last block), 4 nearest-upsample
stages with encoder skips, and a 1×1 head; the output is inverted
(255 − line). Checkpoint: models/manga_line/erika.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.nn import upsample_nearest_2x

_DOWN_REPS = {"block0": (2, True), "block1": (3, False), "block2": (5, False),
              "block3": (7, False), "block4": (12, False)}
_UP_REPS = {"block5": 7, "block6": 5, "block7": 3, "block8": 2}


def _bn(x, p, eps=1e-3):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _bn_relu_conv(p, x, stride=1, up=False):
    x = jax.nn.leaky_relu(_bn(x, p["0"]), 0.2)
    kh = p["2"]["weight"].shape[0]
    x = nn.conv2d(x, p["2"], stride=stride, padding=kh // 2)
    return upsample_nearest_2x(x) if up else x


def _basic(p, x, stride=1):
    y = _bn_relu_conv(p["conv1"]["model"], x, stride=stride)
    y = _bn_relu_conv(p["residual"]["model"], y)
    if "shortcut" in p:
        sc = nn.conv2d(x, p["shortcut"]["model"]["0"], stride=stride)
    else:
        sc = x
    return sc + y


def _u_basic(p, x):
    y = _bn_relu_conv(p["conv1"]["model"], x, up=True)
    y = _bn_relu_conv(p["residual"]["model"], y)
    if "shortcut" in p:
        sc = upsample_nearest_2x(nn.conv2d(x, p["shortcut"]["model"]["0"]))
    else:
        sc = upsample_nearest_2x(x)
    return sc + y


def _down_block(p, x, reps, first):
    for i in range(reps):
        stride = 2 if (i == reps - 1 and not first) else 1
        x = _basic(p["model"][str(i)], x, stride=stride)
    return x


def _up_block(p, x, reps):
    x = _u_basic(p["model"]["0"], x)
    for i in range(1, reps):
        x = _basic(p["model"][str(i)], x)
    return x


def _skip_merge(p, enc, dec):
    if "model" in p:
        return nn.conv2d(enc, p["model"]["0"]) + dec
    return enc + dec


def manga_line_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,1] grayscale 0..255 floats (H,W multiples of 16) →
    line logits [B,H,W,1]."""
    x0 = _down_block(params["block0"], x, 2, True)
    x1 = _down_block(params["block1"], x0, 3, False)
    x2 = _down_block(params["block2"], x1, 5, False)
    x3 = _down_block(params["block3"], x2, 7, False)
    x4 = _down_block(params["block4"], x3, 12, False)

    h = _up_block(params["block5"], x4, 7)
    h = _skip_merge(params.get("res1", {}), x3, h)
    h = _up_block(params["block6"], h, 5)
    h = _skip_merge(params.get("res2", {}), x2, h)
    h = _up_block(params["block7"], h, 3)
    h = _skip_merge(params.get("res3", {}), x1, h)
    h = _up_block(params["block8"], h, 2)
    h = _skip_merge(params.get("res4", {}), x0, h)
    h = _down_block(params["block9"], h, 2, True)
    return _bn_relu_conv(params["conv15"]["model"], h)


class MangaLineDetector:
    def __init__(self, model_dir: str = "models/manga_line"):
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

        sd = {k.replace("module.", ""): v for k, v in
              load_state_dict(os.path.join(self.model_dir, cands[0])).items()}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray) -> np.ndarray:
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no erika.pth under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(manga_line_apply)
        h, w = img.shape[:2]
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        nh, nw = ((h + 15) // 16) * 16, ((w + 15) // 16) * 16
        gray = np.pad(gray, ((0, nh - h), (0, nw - w)), mode="edge")
        line = np.asarray(self._jit(self.params,
                                    jnp.asarray(gray[None, :, :, None])))[0, :h, :w, 0]
        return (255.0 - line).clip(0, 255).astype(np.uint8)


_DETECTOR: Optional[MangaLineDetector] = None


def get_manga_line() -> MangaLineDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = MangaLineDetector()
    return _DETECTOR


def _manga_line(img, res, a, b):
    from .cv import resize_image

    line = get_manga_line().detect(resize_image(img, res))
    return np.repeat(line[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor("lineart_anime_denoise", _manga_line,
                          tags=("Lineart",), needs_weights=True),
             aliases=("manga_line",))


_register()
