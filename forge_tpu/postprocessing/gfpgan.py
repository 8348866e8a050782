"""GFPGAN v1 (Clean) face restorer, pure JAX.

Re-implementation of the published GFPGANv1Clean architecture the reference
loads (modules/gfpgan_model.py:80 via the gfpgan package;
TencentARC/GFPGAN gfpganv1_clean_arch.py + stylegan2_clean_arch.py): a
bilinear-resample UNet strips degradations and produces (a) a W+ style code
from the 4×4 bottleneck and (b) per-resolution SFT scale/shift conditions;
a StyleGAN2 (clean) decoder with channel-split SFT synthesizes the face.

Parameter tree = released GFPGANv1.4 checkpoint keys nested
(conv_body_first, conv_body_down.N, final_conv, final_linear,
conv_body_up.N, condition_scale/shift.N.{0,2}, stylegan_decoder.*).
Stored noise buffers are used (deterministic) where the reference defaults
to randomize_noise=True — same distribution, reproducible outputs.
Modulated conv weights keep their native 5-d [1,O,I,k,k] layout.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _interp2x(x, up=True):
    b, h, w, c = x.shape
    size = (b, h * 2, w * 2, c) if up else (b, h // 2, w // 2, c)
    return jax.image.resize(x, size, "bilinear")


def _resblock(p: Mapping[str, Any], x: jax.Array, up: bool) -> jax.Array:
    """gfpganv1_clean_arch.ResBlock: conv→lrelu→resample→conv→lrelu with a
    resampled 1×1 skip."""
    h = _lrelu(nn.conv2d(x, p["conv1"], padding=1))
    h = _interp2x(h, up)
    h = _lrelu(nn.conv2d(h, p["conv2"], padding=1))
    skip = nn.conv2d(_interp2x(x, up), p["skip"])
    return h + skip


def _modulated_conv(p: Mapping[str, Any], x: jax.Array, style: jax.Array,
                    demodulate: bool, upsample: bool = False) -> jax.Array:
    """stylegan2_clean_arch.ModulatedConv2d on NHWC. weight [1,O,I,k,k]
    (native torch layout); per-sample modulation via vmapped conv."""
    w = jnp.asarray(p["weight"])[0]  # [O, I, k, k]
    o, i, k, _ = w.shape
    s = nn.linear(style, p["modulation"])  # [B, I]
    wmod = w[None] * s[:, None, :, None, None]  # [B,O,I,k,k]
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(jnp.square(wmod), axis=(2, 3, 4)) + 1e-8)
        wmod = wmod * d[:, :, None, None, None]
    if upsample:
        x = _interp2x(x, True)

    def one(xi, wi):  # xi [H,W,C]; wi [O,I,k,k] → HWIO
        return jax.lax.conv_general_dilated(
            xi[None], wi.transpose(2, 3, 1, 0), (1, 1),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    return jax.vmap(one)(x, wmod.astype(x.dtype))


def _style_conv(p: Mapping[str, Any], x, style, noise) -> jax.Array:
    out = _modulated_conv(p["modulated_conv"], x, style, demodulate=True,
                          upsample=p.get("_up", False)) * (2 ** 0.5)
    out = out + jnp.asarray(p["weight"]) * noise
    out = out + jnp.asarray(p["bias"]).reshape(1, 1, 1, -1)
    return _lrelu(out)


def _to_rgb(p: Mapping[str, Any], x, style, skip=None) -> jax.Array:
    out = _modulated_conv(p["modulated_conv"], x, style, demodulate=False)
    out = out + jnp.asarray(p["bias"]).reshape(1, 1, 1, -1)
    if skip is not None:
        out = out + _interp2x(skip, True)
    return out


def gfpgan_apply(params: Mapping[str, Any], img: jax.Array,
                 sft_half: bool = True) -> jax.Array:
    """img [B,512,512,3] in [-1,1] → restored [B,512,512,3] in [-1,1]."""
    dec = params["stylegan_decoder"]
    n_levels = len(params["conv_body_down"])  # log_size - 2 (7 for 512)

    feat = _lrelu(nn.conv2d(img, params["conv_body_first"]))
    skips: List[jax.Array] = []
    for i in range(n_levels):
        feat = _resblock(params["conv_body_down"][str(i)], feat, up=False)
        skips.insert(0, feat)
    feat = _lrelu(nn.conv2d(feat, params["final_conv"], padding=1))

    b = feat.shape[0]
    style = nn.linear(feat.transpose(0, 3, 1, 2).reshape(b, -1),
                      params["final_linear"])
    num_style_feat = dec["style_conv1"]["modulated_conv"]["modulation"]["weight"].shape[1]
    latent = style.reshape(b, -1, num_style_feat)  # W+ (different_w=True)

    conditions: List[jax.Array] = []
    for i in range(n_levels):
        feat = feat + skips[i]
        feat = _resblock(params["conv_body_up"][str(i)], feat, up=True)
        for which in ("condition_scale", "condition_shift"):
            q = params[which][str(i)]
            c = nn.conv2d(feat, q["0"], padding=1)
            conditions.append(nn.conv2d(_lrelu(c), q["2"], padding=1))

    # StyleGAN2-CSFT synthesis (stylegan2_clean_arch forward, SFT inserted
    # after each upsample conv)
    noises = dec["noises"]
    const = jnp.asarray(dec["constant_input"]["weight"])  # [1,C,4,4]
    out = jnp.broadcast_to(const.transpose(0, 2, 3, 1),
                           (b, 4, 4, const.shape[1]))

    def noise_for(idx):
        nz = jnp.asarray(noises[f"noise{idx}"])  # [1,1,H,W]
        return nz.transpose(0, 2, 3, 1)

    out = _style_conv(dec["style_conv1"], out, latent[:, 0], noise_for(0))
    skip = _to_rgb(dec["to_rgb1"], out, latent[:, 1])
    convs = dec["style_convs"]
    rgbs = dec["to_rgbs"]
    li = 1
    for level in range(n_levels):
        c1 = dict(convs[str(2 * level)])
        c1["_up"] = True
        out = _style_conv(c1, out, latent[:, li], noise_for(2 * level + 1))
        # SFT: second channel half gets scale/shift from the UNet conditions
        sc, sh = conditions[2 * level], conditions[2 * level + 1]
        if sft_half:
            half = out.shape[-1] // 2
            same, mod = out[..., :half], out[..., half:]
            out = jnp.concatenate([same, mod * sc + sh], axis=-1)
        else:
            out = out * sc + sh
        out = _style_conv(convs[str(2 * level + 1)], out, latent[:, li + 1],
                          noise_for(2 * level + 2))
        skip = _to_rgb(rgbs[str(level)], out, latent[:, li + 2], skip)
        li += 2
    return jnp.clip(skip, -1.0, 1.0)


class GFPGAN:
    """Loader + whole-image restore API (reference gfpgan_model.py:42-111:
    face crop via detector, per-face restore, paste back). Face detection is
    pluggable like postprocessing/faces.py — without a detector the whole
    image resizes through the 512² restorer."""

    def __init__(self, model_dir: str = "models/GFPGAN"):
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
                 if f.endswith((".pth", ".pt", ".safetensors"))]
        if not cands:
            return
        from ..core.state_dict import load_state_dict
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        for wrap in ("params_ema", "params", "g_ema"):
            if wrap in sd and isinstance(sd[wrap], dict):
                sd = sd[wrap]
                break
        # NOTE: modulated weights are 5-d and conv weights are consumed via
        # nn.conv2d (HWIO) — transform only the plain 4-d convs
        flat = {}
        for k, v in sd.items():
            arr = np.asarray(v)
            if arr.ndim == 4 and "modulated_conv" not in k and "noise" not in k:
                arr = arr.transpose(2, 3, 1, 0)
            flat[k] = jnp.asarray(arr)
        self.params = nest(flat)
        self._jit = jax.jit(lambda t: gfpgan_apply(self.params, t))

    def restore(self, image: np.ndarray, w: Optional[float] = None) -> np.ndarray:
        """Full-image entry: detect/crop faces, restore each at 512², paste
        back with feathered masks (shares faces.restore_faces_in_image)."""
        from .faces import restore_faces_in_image

        self.load()
        if self.params is None:
            raise RuntimeError(f"no GFPGAN checkpoint under {self.model_dir}")

        def restore_crop(crop: np.ndarray) -> np.ndarray:
            import cv2

            face = cv2.resize(crop.astype(np.uint8), (512, 512),
                              interpolation=cv2.INTER_LINEAR)
            x = jnp.asarray(face[None].astype(np.float32) / 127.5 - 1.0)
            out = np.asarray(self._jit(x))[0]
            out = ((out + 1.0) * 127.5).clip(0, 255).astype(np.float32)
            return cv2.resize(out, crop.shape[1::-1],
                              interpolation=cv2.INTER_LINEAR)

        return restore_faces_in_image(image, restore_crop)


_MODEL: Optional[GFPGAN] = None


def get_gfpgan() -> GFPGAN:
    global _MODEL
    if _MODEL is None:
        _MODEL = GFPGAN()
    return _MODEL
