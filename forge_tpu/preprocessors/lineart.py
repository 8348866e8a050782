"""Lineart annotators (realistic / coarse / anime) in JAX.

Re-expressions of the annotators the reference ships:
  * realistic/coarse — the sketch-simplification Generator
    (extensions-builtin/forge_legacy_preprocessors/annotator/lineart/__init__.py:34
    Generator(3,1,3): reflection-pad 7×7 stem → 2 stride-2 downs → N residual
    blocks → 2 transpose-conv ups → 7×7 head + sigmoid; InstanceNorm is
    affine-free so the checkpoint holds convs only, and the residual count is
    derived from the keys rather than hardcoded).
  * anime — UnetGenerator(3,1,8,64) with InstanceNorm
    (annotator/lineart_anime/__init__.py:13): 8 stride-2 downs with skip
    concats, tanh head; the nested Sequential key layout is walked
    recursively, innermost blocks recognized by their leaf up-conv.

Checkpoints: models/lineart/sk_model.pth (realistic), sk_model2.pth (coarse),
models/lineart_anime/netG.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False) over NHWC: per-sample per-channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
                      - jnp.square(mean), 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _refl_conv(x, p, pad):
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.conv2d(x, p)


def lineart_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] in [0,1] → line map [B,H,W,1] in [0,1]."""
    h = jax.nn.relu(_instance_norm(_refl_conv(x, params["model0"]["1"], 3)))
    for i in ("0", "3"):  # two stride-2 downs
        h = jax.nn.relu(_instance_norm(nn.conv2d(h, params["model1"][i],
                                                 stride=2, padding=1)))
    n_res = len(params["model2"])
    for i in range(n_res):
        blk = params["model2"][str(i)]["conv_block"]
        r = jax.nn.relu(_instance_norm(_refl_conv(h, blk["1"], 1)))
        r = _instance_norm(_refl_conv(r, blk["5"], 1))
        h = h + r
    for i in ("0", "3"):  # two transpose-conv ups (k3 s2 p1 op1)
        h = jax.nn.relu(_instance_norm(nn.conv2d_transpose(
            h, params["model3"][i], stride=2, padding=1, output_padding=1)))
    return jax.nn.sigmoid(_refl_conv(h, params["model4"]["1"], 3))


def lineart_anime_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] in [-1,1], H/W multiples of 256 → [B,H,W,1] in [-1,1]."""

    def block(p: Mapping[str, Any], h: jax.Array, outermost: bool) -> jax.Array:
        if outermost:
            d = nn.conv2d(h, p["0"], stride=2, padding=1)
            d = block(p["1"]["model"], d, False)
            u = nn.conv2d_transpose(jax.nn.relu(d), p["3"], stride=2, padding=1)
            return jnp.tanh(u)
        down = nn.conv2d(jax.nn.leaky_relu(h, 0.2), p["1"], stride=2, padding=1)
        if "model" in p["3"]:  # mid block: norm → submodule → up-norm
            d = block(p["3"]["model"], _instance_norm(down), False)
            u = nn.conv2d_transpose(jax.nn.relu(d), p["5"], stride=2, padding=1)
        else:  # innermost: no norm after down, up at index 3
            u = nn.conv2d_transpose(jax.nn.relu(down), p["3"], stride=2, padding=1)
        return jnp.concatenate([h, _instance_norm(u)], axis=-1)

    return block(params["model"]["model"], x, True)


class _LazyNet:
    def __init__(self, model_dir: str, filename: Optional[str] = None):
        self.model_dir = model_dir
        self.filename = filename
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
        cands = ([self.filename] if self.filename else
                 [f for f in sorted(os.listdir(self.model_dir))
                  if f.endswith((".pth", ".pt", ".safetensors"))])
        path = os.path.join(self.model_dir, cands[0]) if cands else None
        if not path or not os.path.exists(path):
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(path)
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})


class LineartDetector(_LazyNet):
    def __init__(self, coarse: bool = False):
        super().__init__("models/lineart",
                         "sk_model2.pth" if coarse else "sk_model.pth")

    def detect(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H,W,3] → inverted line uint8 [H,W] (white line on black,
        matching the reference's `!invert` output convention)."""
        self.load()
        if self.params is None:
            raise RuntimeError(f"no lineart checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(lineart_apply)
        x = jnp.asarray(img[None].astype(np.float32) / 255.0)
        line = np.asarray(self._jit(self.params, x))[0, :, :, 0]
        return (line * 255.0).clip(0, 255).astype(np.uint8)


class LineartAnimeDetector(_LazyNet):
    def __init__(self):
        super().__init__("models/lineart_anime", "netG.pth")

    def detect(self, img: np.ndarray) -> np.ndarray:
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no netG checkpoint under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(lineart_anime_apply)
        H, W = img.shape[:2]
        Hn, Wn = [256 * int(np.ceil(s / 256.0)) for s in (H, W)]
        feed = cv2.resize(img, (Wn, Hn), interpolation=cv2.INTER_CUBIC)
        x = jnp.asarray(feed[None].astype(np.float32) / 127.5 - 1.0)
        line = np.asarray(self._jit(self.params, x))[0, :, :, 0] * 127.5 + 127.5
        line = cv2.resize(line, (W, H), interpolation=cv2.INTER_CUBIC)
        return line.clip(0, 255).astype(np.uint8)


_REALISTIC: Optional[LineartDetector] = None
_COARSE: Optional[LineartDetector] = None
_ANIME: Optional[LineartAnimeDetector] = None


def get_lineart(kind: str = "realistic"):
    global _REALISTIC, _COARSE, _ANIME
    if kind == "anime":
        if _ANIME is None:
            _ANIME = LineartAnimeDetector()
        return _ANIME
    if kind == "coarse":
        if _COARSE is None:
            _COARSE = LineartDetector(coarse=True)
        return _COARSE
    if _REALISTIC is None:
        _REALISTIC = LineartDetector()
    return _REALISTIC


def _make_call(kind, invert=True):
    def call(img, res, a, b):
        from .cv import resize_image

        line = get_lineart(kind).detect(resize_image(img, res))
        out = (255 - line) if invert else line
        return np.repeat(out[..., None].astype(np.float32) / 255.0, 3, axis=2)

    return call


def _register():
    from . import Preprocessor, register

    register(Preprocessor("lineart_realistic", _make_call("realistic"),
                          tags=("Lineart",), needs_weights=True),
             aliases=("lineart",))
    register(Preprocessor("lineart_coarse", _make_call("coarse"),
                          tags=("Lineart",), needs_weights=True))
    register(Preprocessor("lineart_anime", _make_call("anime"),
                          tags=("Lineart",), needs_weights=True))


_register()
