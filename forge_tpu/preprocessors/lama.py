"""LaMa inpainting (big-lama FFC ResNet generator) for inpaint_only+lama.

JAX re-implementation of the network the reference's forge_preprocessor_inpaint
extension runs (extensions-builtin/forge_preprocessor_inpaint/annotator/lama/
saicinpainting/training/modules/ffc.py FFCResNetGenerator, config
scripts/lama_config.yaml: input_nc 4, ngf 64, 3 downsamples, 18 FFC resnet
blocks at ratio 0.75, sigmoid output, no LFU). Fast Fourier Convolutions split
channels into a local path (reflect-padded 3×3 convs) and a global path whose
SpectralTransform does rfft2 → 1×1 conv over interleaved (real, imag) channel
pairs → irfft2 — spectral mixing with a global receptive field in one hop
(arXiv:2109.07161). The structure is discovered from checkpoint shapes
(kernel size distinguishes the 7×7 stem/head from 3×3 stages; bare 3×3 convs
between BN triples are the transposed-conv upsamplers), so any lama-family
generator with this module taxonomy loads.

Inference flow mirrors preprocessor_inpaint.py:118-158: min-side-256 resize,
mask-binarize, masked color ⊕ mask 4-channel feed, prediction composited under
the mask, resized back, final blend with the raw image under the soft mask.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _bn(x: jax.Array, p: Mapping[str, Any], eps: float = 1e-5) -> jax.Array:
    """Inference BatchNorm over the channel (last) axis, f32 statistics."""
    xf = x.astype(jnp.float32)
    y = (xf - p["running_mean"]) * jax.lax.rsqrt(p["running_var"] + eps)
    if "weight" in p and p["weight"] is not None:
        y = y * p["weight"]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"]
    return y.astype(x.dtype)


def _reflect_conv(x: jax.Array, p: Mapping[str, Any], stride: int = 1) -> jax.Array:
    """Conv2d with padding_mode='reflect' (pad k//2 then VALID)."""
    k = p["weight"].shape[0]
    pad = k // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.conv2d(x, p, stride=stride, padding=0)


def _fourier_unit(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """rfft2 → 1×1 conv on interleaved (re, im) channel pairs → irfft2
    (ffc.py:76-114; torch's view of the stacked complex tensor interleaves
    real/imag per channel — reproduced by the stack+reshape below)."""
    b, h, w, c = x.shape
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    w2 = f.shape[2]
    fr = jnp.stack([f.real, f.imag], axis=-1).reshape(b, h, w2, c * 2)
    y = nn.conv2d(fr.astype(x.dtype), p["conv_layer"])
    y = jax.nn.relu(_bn(y, p["bn"]))
    yc = y.astype(jnp.float32).reshape(b, h, w2, y.shape[-1] // 2, 2)
    comp = jax.lax.complex(yc[..., 0], yc[..., 1])
    out = jnp.fft.irfft2(comp, s=(h, w), axes=(1, 2), norm="ortho")
    return out.astype(x.dtype)


def _spectral_transform(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    y = jax.nn.relu(_bn(nn.conv2d(x, p["conv1"]["0"]), p["conv1"]["1"]))
    fu = _fourier_unit(p["fu"], y)
    return nn.conv2d(y + fu, p["conv2"])  # no LFU (lama_config enable_lfu: false)


def _ffc(p: Mapping[str, Any], xl, xg, stride: int = 1):
    """Four-way local/global mix (ffc.py:257-277). Absent submodules are
    torch Identity placeholders with no parameters → absent keys."""
    out_l, out_g = None, None

    def acc(a, b):
        return b if a is None else a + b

    if "convl2l" in p and xl is not None:
        out_l = acc(out_l, _reflect_conv(xl, p["convl2l"], stride))
    if "convg2l" in p and xg is not None:
        out_l = acc(out_l, _reflect_conv(xg, p["convg2l"], stride))
    if "convl2g" in p and xl is not None:
        out_g = acc(out_g, _reflect_conv(xl, p["convl2g"], stride))
    if "convg2g" in p and xg is not None:
        out_g = acc(out_g, _spectral_transform(p["convg2g"], xg))
    return out_l, out_g


def _ffc_bn_act(p: Mapping[str, Any], xl, xg, stride: int = 1):
    yl, yg = _ffc(p["ffc"], xl, xg, stride)
    if yl is not None and "bn_l" in p:
        yl = jax.nn.relu(_bn(yl, p["bn_l"]))
    if yg is not None and "bn_g" in p:
        yg = jax.nn.relu(_bn(yg, p["bn_g"]))
    return yl, yg


def _resblock(p: Mapping[str, Any], xl, xg):
    il, ig = xl, xg
    xl, xg = _ffc_bn_act(p["conv1"], xl, xg)
    xl, xg = _ffc_bn_act(p["conv2"], xl, xg)
    xl = il + xl if il is not None else xl
    xg = ig + xg if ig is not None else xg
    return xl, xg


def lama_apply(params: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """x [B,H,W,4] (masked color ⊕ mask) → [B,H,W,3] in [0,1]. H, W must be
    multiples of 8 (3 stride-2 stages + rfft2 even-dims)."""
    m = params["model"]
    xl, xg = x, None
    for i in sorted((int(k) for k in m), key=int):
        sub = m[str(i)]
        if "ffc" in sub:
            k = None
            for cname in ("convl2l", "convg2l"):
                if cname in sub["ffc"]:
                    k = sub["ffc"][cname]["weight"].shape[0]
                    break
            xl, xg = _ffc_bn_act(sub, xl, xg, stride=2 if k == 3 else 1)
        elif "conv1" in sub:
            xl, xg = _resblock(sub, xl, xg)
        elif "running_mean" in sub:
            xl = jax.nn.relu(_bn(xl, sub))
        elif "weight" in sub and sub["weight"].ndim == 4:
            if xg is not None:  # ConcatTupleLayer before the first upsample
                xl = jnp.concatenate([xl, xg], axis=-1)
                xg = None
            if sub["weight"].shape[0] == 3:  # upsample ConvTranspose2d
                xl = nn.conv2d_transpose(xl, sub, stride=2, padding=1,
                                         output_padding=1)
            else:  # 7×7 output head, reflect pad 3
                xl = _reflect_conv(xl, sub)
    return jax.nn.sigmoid(xl.astype(jnp.float32))


# ---------------------------------------------------------------------------
# detector


class LamaDetector:
    def __init__(self, model_dir: str = "models/lama"):
        self.model_dir = model_dir
        self.params = None

    @property
    def available(self) -> bool:
        return self.params is not None or (
            os.path.isdir(self.model_dir) and any(
                f.endswith((".pth", ".pt", ".safetensors", ".ckpt"))
                for f in os.listdir(self.model_dir)))

    def load(self):
        if self.params is not None:
            return self.params
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        cands = sorted(f for f in os.listdir(self.model_dir)
                       if f.endswith((".pth", ".pt", ".safetensors", ".ckpt")))
        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        sd = {k[len("generator."):] if k.startswith("generator.") else k: v
              for k, v in sd.items()}
        sd = {k: v for k, v in sd.items() if k.startswith("model.")}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        return self.params

    def inpaint(self, img_u8: np.ndarray, mask_f: np.ndarray) -> np.ndarray:
        """uint8 [H,W,3] + float [H,W] mask → inpainted uint8 [H,W,3]
        (preprocessor_inpaint.py:122-158: 256 min-side, binarized mask,
        composite under mask, soft final blend)."""
        import cv2

        params = self.load()
        H, W = img_u8.shape[:2]
        scale = 256.0 / min(H, W)
        nh = max(int(round(H * scale / 8)) * 8, 8)
        nw = max(int(round(W * scale / 8)) * 8, 8)
        color = cv2.resize(img_u8, (nw, nh),
                           interpolation=cv2.INTER_AREA).astype(np.float32) / 255.0
        mask = cv2.resize(mask_f.astype(np.float32), (nw, nh),
                          interpolation=cv2.INTER_LINEAR)
        mask = (mask > 0.5).astype(np.float32)[..., None]
        color = color * (1.0 - mask)
        feed = jnp.asarray(np.concatenate([color, mask], axis=-1)[None])
        pred = np.asarray(lama_apply(params, feed)[0], np.float32)
        pred = pred * mask + color * (1.0 - mask)
        pred = cv2.resize((pred * 255.0).clip(0, 255).astype(np.uint8), (W, H),
                          interpolation=cv2.INTER_CUBIC)
        alpha = np.clip(mask_f, 0.0, 1.0)[..., None]
        out = pred.astype(np.float32) * alpha + img_u8.astype(np.float32) * (1 - alpha)
        return out.clip(0, 255).astype(np.uint8)


_DET: Optional[LamaDetector] = None


def get_lama() -> LamaDetector:
    global _DET
    if _DET is None:
        _DET = LamaDetector()
    return _DET


def lama_prefill(img_u8: np.ndarray, mask_f: np.ndarray) -> np.ndarray:
    det = get_lama()
    if not det.available:
        raise RuntimeError(
            "inpaint_only+lama needs the LaMa generator checkpoint "
            "(ControlNetLama.pth) under models/lama")
    return det.inpaint(img_u8, mask_f)
