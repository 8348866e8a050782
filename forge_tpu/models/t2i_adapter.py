"""T2I-Adapter as a pure function.

Behavioral twin of the reference's Adapter net + T2IAdapter patcher
(backend/nn/cnets/t2i_adapter.py:103, backend/patcher/controlnet.py:477):
a small conv trunk over the pixel-unshuffled hint producing one feature per
channel stage, aligned onto the UNet's *input-block* control slots (the cldm
ControlNet feeds the *output* skips instead). Features depend only on the
hint, so they're computed ONCE per generation outside the compiled sampling
loop — on TPU they become constants of the denoise program.

Key space mirrors the checkpoints: conv_in.*, body.N.{in_conv,block1,block2,
skep,down_opt.op}.*; NHWC activations, HWIO convs (transform_for_jax)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """[B,H,W,C] → [B,H/r,W/r,C·r²] (torch PixelUnshuffle, NHWC)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # torch channel order: out[c*r*r] = in[c, i, j] with (c major, i, j minor)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def _resblock(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    if "down_opt" in p:
        x = nn.conv2d(x, p["down_opt"]["op"], stride=2, padding=1)
    if "in_conv" in p:
        x = nn.conv2d(x, p["in_conv"], stride=1, padding=_pad_of(p["in_conv"]))
    h = nn.conv2d(x, p["block1"], stride=1, padding=1)
    h = jax.nn.relu(h)
    h = nn.conv2d(h, p["block2"], stride=1, padding=_pad_of(p["block2"]))
    # skep (when present) reads the same x block1 saw (reference
    # t2i_adapter.py:88-100: x is rebound by in_conv before skep)
    if "skep" in p:
        return h + nn.conv2d(x, p["skep"], stride=1, padding=_pad_of(p["skep"]))
    return h + x


def _pad_of(conv_p) -> int:
    return conv_p["weight"].shape[0] // 2  # HWIO: kh


@dataclasses.dataclass
class AdapterConfig:
    channels: tuple = (320, 640, 1280, 1280)
    nums_rb: int = 3
    xl: bool = False

    @property
    def unshuffle(self) -> int:
        return 16 if self.xl else 8


def detect_adapter_config(params: Mapping[str, Any]) -> AdapterConfig:
    cin = params["conv_in"]["weight"].shape[2]  # HWIO in-channels
    xl = cin >= 3 * 16 * 16
    n_blocks = len(params["body"])
    ch0 = params["conv_in"]["weight"].shape[3]
    # levels are delimited by channel changes / downsamples: count rb-per-level
    # from the canonical 4-level layout when divisible, else treat each block
    # as its own level (tiny test nets)
    nums_rb = max(n_blocks // 4, 1) if n_blocks % 4 == 0 else 1
    channels = []
    for i in range(n_blocks // nums_rb):
        blk = params["body"][str(i * nums_rb)]
        key = "in_conv" if "in_conv" in blk else "block1"
        channels.append(blk[key]["weight"].shape[3])
    return AdapterConfig(tuple(channels) or (ch0,), nums_rb, xl)


def adapter_apply(
    params: Mapping[str, Any],
    hint: jax.Array,  # [B,H,W,3] in [0,1], H/W multiples of unshuffle
    cfg: Optional[AdapterConfig] = None,
) -> Dict[str, List[Optional[jax.Array]]]:
    """→ {'input': [...Nones + features...], 'middle': [...]} matching the
    reference's feature→slot alignment (t2i_adapter.py:135-156)."""
    cfg = cfg or detect_adapter_config(params)
    x = pixel_unshuffle(hint, cfg.unshuffle)
    x = nn.conv2d(x, params["conv_in"], stride=1, padding=1)
    features: List[Optional[jax.Array]] = []
    for i in range(len(cfg.channels)):
        for j in range(cfg.nums_rb):
            x = _resblock(params["body"][str(i * cfg.nums_rb + j)], x)
        if cfg.xl:
            features.append(None)
            if i == 0:
                features.extend([None, None])
            if i == 2:
                features.append(None)
        else:
            features.extend([None, None])
        features.append(x)
    if cfg.xl:
        return {"input": features[:-1], "middle": [features[-1]]}
    return {"input": features, "middle": []}


@dataclasses.dataclass
class T2IAdapterState:
    """One attached T2I-Adapter: hint-only features with strength/σ-range
    gating and optional per-slot weights (reference T2IAdapter patcher)."""

    params: Any
    hint: jax.Array  # [B,H,W,3]
    strength: float = 1.0
    start_percent: float = 0.0
    end_percent: float = 1.0
    cfg: Optional[AdapterConfig] = None
    block_weights: Optional[Sequence[float]] = None
    digest: Optional[str] = None
    _features: Any = None  # computed lazily, once per hint

    def features(self):
        if self._features is None:
            self._features = adapter_apply(self.params, self.hint, self.cfg)
        return self._features
