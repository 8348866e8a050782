"""LeReS relative-depth annotator (AdelaiDepth) in JAX.

Re-expression of the reference's RelDepthModel (extensions-builtin/
forge_legacy_preprocessors/annotator/leres/leres/): a torchvision-style
ResNeXt101-32x8d backbone (4 lateral features) and the FTB/FFM/AO decoder
(network_auxi.py:15 Decoder). Block counts, group width, and downsample
presence are all derived from the checkpoint keys, so res50 checkpoints load
too. Input quirk reproduced from depthmap.py:17 scale_torch: the float image
is NOT divided by 255 before the (0.485,0.229) normalization, and channels
are BGR-flipped (leres/__init__.py:36).

Checkpoint: models/leres/res101.pth (['depth_model'] sub-dict, 'module.'
prefix stripped). The reference's optional pix2pix "boost" merge pass is not
ported — it is a high-res stitching refinement, not the depth model.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .depth_anything import _resize_align

_BN_EPS = 1e-5


def _bn(x, p):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + _BN_EPS)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _bottleneck(p: Mapping[str, Any], x: jax.Array, stride: int, groups: int) -> jax.Array:
    h = jax.nn.relu(_bn(nn.conv2d(x, p["conv1"]), p["bn1"]))
    h = jax.nn.relu(_bn(nn.conv2d(h, p["conv2"], stride=stride, padding=1,
                                  feature_group_count=groups), p["bn2"]))
    h = _bn(nn.conv2d(h, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(nn.conv2d(x, p["downsample"]["0"], stride=stride), p["downsample"]["1"])
    return jax.nn.relu(h + x)


def _resnext_features(p: Mapping[str, Any], x: jax.Array):
    """torchvision ResNet._forward_impl minus the classifier head:
    → [1/4, 1/8, 1/16, 1/32] lateral features."""
    # groups from the grouped 3×3's HWIO shape: [kh,kw,in/groups,out] with
    # in == out inside a bottleneck → groups = out / in_per_group
    w = p["layer1"]["0"]["conv2"]["weight"]
    groups = max(int(w.shape[3]) // int(w.shape[2]), 1)
    h = nn.conv2d(x, p["conv1"], stride=2, padding=3)
    h = jax.nn.relu(_bn(h, p["bn1"]))
    h = jax.lax.reduce_window(h, -np.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = []
    for li in range(1, 5):
        layer = p[f"layer{li}"]
        for bi in range(len(layer)):
            stride = 2 if (li > 1 and bi == 0) else 1
            h = _bottleneck(layer[str(bi)], h, stride, groups)
        feats.append(h)
    return feats


def _ftb(p, x):
    x = nn.conv2d(x, p["conv1"], padding=1)
    b = nn.conv2d(jax.nn.relu(x), p["conv_branch"]["1"], padding=1)
    b = jax.nn.relu(_bn(b, p["conv_branch"]["2"]))
    b = nn.conv2d(b, p["conv_branch"]["4"], padding=1)
    return jax.nn.relu(x + b)


def _ffm(p, low, high, upfactor=2):
    x = _ftb(p["ftb1"], low) + high
    x = _ftb(p["ftb2"], x)
    return _resize_align(x, (x.shape[1] * upfactor, x.shape[2] * upfactor))


def leres_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] normalized BGR-flipped (H,W multiples of 32) →
    depth [B,H,W]."""
    enc = params["depth_model"]["encoder_modules"]["encoder"]
    dec = params["depth_model"]["decoder_modules"]
    f4, f8, f16, f32 = _resnext_features(enc, x)
    h = _ftb(dec["conv"], f32)
    h = nn.conv2d(h, dec["conv1"], padding=1)
    h = _resize_align(h, (h.shape[1] * 2, h.shape[2] * 2))    # 1/16
    h = _ffm(dec["ffm2"], f16, h)                             # 1/8
    h = _ffm(dec["ffm1"], f8, h)                              # 1/4
    h = _ffm(dec["ffm0"], f4, h)                              # 1/2
    ao = dec["outconv"]["adapt_conv"]
    h = nn.conv2d(h, ao["0"], padding=1)
    h = jax.nn.relu(_bn(h, ao["1"]))
    h = nn.conv2d(h, ao["3"], padding=1)
    h = _resize_align(h, (h.shape[1] * 2, h.shape[2] * 2))    # full res
    return h[:, :, :, 0]


class LeresDetector:
    def __init__(self, model_dir: str = "models/leres"):
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
                 if f.startswith("res") and f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        if isinstance(sd.get("depth_model"), dict):
            sd = {f"depth_model.{k}": v for k, v in sd["depth_model"].items()}
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})

    def detect(self, img: np.ndarray, thr_a: float = 0.0,
               thr_b: float = 0.0) -> np.ndarray:
        """uint8 RGB [H,W,3] → normalized depth uint8 [H,W] (reference
        apply_leres incl. the remove-near/background percentile cuts)."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no res101.pth under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(leres_apply)
        h, w = img.shape[:2]
        nh, nw = ((h + 31) // 32) * 32, ((w + 31) // 32) * 32
        feed = cv2.resize(img[:, :, ::-1], (nw, nh),
                          interpolation=cv2.INTER_CUBIC).astype(np.float32)
        feed = (feed - np.asarray([0.485, 0.456, 0.406], np.float32)) \
            / np.asarray([0.229, 0.224, 0.225], np.float32)
        depth = np.asarray(self._jit(self.params, jnp.asarray(feed[None])))[0]
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
        lo, hi = depth.min(), depth.max()
        out = (depth - lo) / max(hi - lo, np.finfo(np.float32).eps)
        # remove-near / remove-background threshold cuts (legacy preprocessor
        # leres thr_a/thr_b semantics)
        if thr_a:
            a = np.percentile(out, thr_a)
            out = np.where(out < a, 0.0, out)
        if thr_b:
            b = np.percentile(out, 100 - thr_b)
            out = np.where(out > b, 1.0, out)
        return (out * 255.0).clip(0, 255).astype(np.uint8)


_DETECTOR: Optional[LeresDetector] = None


def get_leres() -> LeresDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = LeresDetector()
    return _DETECTOR


def _leres(img, res, a, b):
    from .cv import resize_image

    d = get_leres().detect(resize_image(img, res), thr_a=a or 0, thr_b=b or 0)
    return np.repeat(d[..., None].astype(np.float32) / 255.0, 3, axis=2)


def _register():
    from . import Preprocessor, register

    register(Preprocessor(
        "depth_leres", _leres,
        slider_a=("Remove Near %", 0, 100, 0),
        slider_b=("Remove Background %", 0, 100, 0),
        tags=("Depth",), needs_weights=True), aliases=("leres",))


_register()
