"""Anime face segmentation annotator (anime_face_segment) in JAX.

Re-expression of the reference's UNet-over-MobileNetV2 (extensions-builtin/
forge_legacy_preprocessors/annotator/anime_face_segment/__init__.py:29):
five torchvision-MobileNetV2 encoder slices (standard symmetric padding —
unlike MLSD's TFLite variant) + nearest-up decoder with skip concats and a
7-class softmax head; output is the argmax palette map (background/hair/eye/
mouth/face/skin/clothes). Checkpoint: models/anime_face_segment/UNet.pth.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..ops.nn import upsample_nearest_2x
from .depth_anything import _resize_align

PALETTE = np.asarray([(255, 255, 0), (0, 0, 255), (255, 0, 0), (255, 255, 255),
                      (0, 255, 0), (0, 255, 255), (255, 0, 255)], np.uint8)

# torchvision MobileNetV2 feature-block strides (inverted-residual config
# (1,16,1,1),(6,24,2,2),(6,32,3,2),(6,64,4,2),(6,96,3,1),(6,160,3,2))
_STRIDES = {1: 1, 2: 2, 3: 1, 4: 2, 5: 1, 6: 1, 7: 2, 8: 1, 9: 1, 10: 1,
            11: 1, 12: 1, 13: 1, 14: 2, 15: 1, 16: 1}
_EN_BLOCKS = {0: (0, 1), 1: (2, 3), 2: (4, 6), 3: (7, 13), 4: (14, 16)}


def _bn(x, p, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _conv_bn_relu6(p, x, stride=1, groups=1):
    k = p["0"]["weight"].shape[0]
    x = nn.conv2d(x, p["0"], stride=stride, padding=(k - 1) // 2,
                  feature_group_count=groups)
    return jnp.clip(_bn(x, p["1"]), 0.0, 6.0)


def _inverted_residual(p, x, stride):
    seq = p["conv"]
    h = x
    i = 0
    if len(seq) == 4:  # expand_ratio>1: [pw ConvBNReLU, dw ConvBNReLU, conv, bn]
        h = _conv_bn_relu6(seq["0"], h)
        i = 1
    dw = seq[str(i)]
    h = _conv_bn_relu6(dw, h, stride=stride,
                       groups=dw["0"]["weight"].shape[-1])
    h = _bn(nn.conv2d(h, seq[str(i + 1)]), seq[str(i + 2)])
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
                      - jnp.square(mean), 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _de_block(p, x, final=False):
    x = upsample_nearest_2x(x)
    x = nn.conv2d(x, p["1"], padding=1)
    if final:
        return jax.nn.softmax(x, axis=-1)
    return jax.nn.leaky_relu(_instance_norm(x), 0.1)


def anime_face_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,3] in [0,1] → class probabilities [B,H,W,7]."""
    feats = []
    h = x
    for blk in range(5):
        p = params[f"en_block{blk}"]
        lo, hi = _EN_BLOCKS[blk]
        for seq_i, feat_i in enumerate(range(lo, hi + 1)):
            sub = p[str(seq_i)]
            if feat_i == 0:  # stem ConvBNReLU
                h = _conv_bn_relu6(sub, h, stride=2)
            else:
                h = _inverted_residual(sub, h, _STRIDES[feat_i])
        feats.append(h)
    e0, e1, e2, e3, e4 = feats
    d = _de_block(params["de_block4"], e4)
    d = _resize_align(d, e3.shape[1:3])
    d = _de_block(params["de_block3"], jnp.concatenate([d, e3], -1))
    d = _resize_align(d, e2.shape[1:3])
    d = _de_block(params["de_block2"], jnp.concatenate([d, e2], -1))
    d = _resize_align(d, e1.shape[1:3])
    d = _de_block(params["de_block1"], jnp.concatenate([d, e1], -1))
    d = _resize_align(d, e0.shape[1:3])
    return _de_block(params["de_block0"], jnp.concatenate([d, e0], -1), final=True)


class AnimeFaceSegmenter:
    def __init__(self, model_dir: str = "models/anime_face_segment"):
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
            raise RuntimeError(f"no UNet.pth under {self.model_dir}")
        if self._jit is None:
            self._jit = jax.jit(anime_face_apply)
        h, w = img.shape[:2]
        scale = 512.0 / min(h, w)
        nh = int(round(h * scale / 32)) * 32
        nw = int(round(w * scale / 32)) * 32
        feed = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
        seg = np.asarray(self._jit(self.params,
                                   jnp.asarray(feed[None].astype(np.float32) / 255.0)))[0]
        labels = seg.argmax(-1)
        out = PALETTE[labels]
        return cv2.resize(out, (w, h), interpolation=cv2.INTER_NEAREST)


_DETECTOR: Optional[AnimeFaceSegmenter] = None


def get_anime_face() -> AnimeFaceSegmenter:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = AnimeFaceSegmenter()
    return _DETECTOR


def _anime_face(img, res, a, b):
    from .cv import resize_image

    return np.asarray(get_anime_face().detect(resize_image(img, res)),
                      np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("seg_anime_face", _anime_face, tags=("Segmentation",),
                          needs_weights=True),
             aliases=("anime_face_segment",))


_register()
