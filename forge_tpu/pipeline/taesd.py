"""TAESD (tiny autoencoder) + Approx-NN preview decoders, pure JAX.

Behavioral twins of the reference's preview/decode nets:
  - TAESD decoder/encoder (modules/sd_vae_taesd.py:26-55, madebyollin/taesd):
    3×3 conv stacks of residual Blocks with ReLU fuse, nearest-2× upsamples
    (decoder) / stride-2 convs (encoder), input Clamp tanh(x/3)·3. Checkpoint
    keys are the torch nn.Sequential indices — loaded verbatim so the
    official taesd/taesdxl/taesd3/taef1 .pth files work.
  - VAEApprox (modules/sd_vae_approx.py:10-31): 8 shrinking convs over a
    2×-upsampled, 11-padded latent.

Both run as one jitted call per latent shape; TAESD decode of a 64×64 latent
is ~100× cheaper than the full VAE, which is the point of the preview path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

latent_magnitude = 3.0
latent_shift = 0.5


def _block(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """Residual Block (sd_vae_taesd.py:26-34): conv-relu-conv-relu-conv + skip,
    fused through ReLU. All decoder/encoder blocks are 64→64 → identity skip."""
    h = jax.nn.relu(nn.conv2d(x, p["conv"]["0"], padding=1))
    h = jax.nn.relu(nn.conv2d(h, p["conv"]["2"], padding=1))
    h = nn.conv2d(h, p["conv"]["4"], padding=1)
    if "skip" in p and isinstance(p.get("skip"), dict) and "weight" in p["skip"]:
        x = nn.conv2d(x, p["skip"])
    return jax.nn.relu(h + x)


def _upsample2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


def taesd_decode(params: Mapping[str, Any], latent: jax.Array) -> jax.Array:
    """params: nested from ``decoder.<seq-index>`` keys; latent [B,h,w,C]
    (raw VAE latent space, NOT ×scale regulated) → RGB in [0,1]."""
    d = params["decoder"]
    x = jnp.tanh(latent / latent_magnitude) * latent_magnitude  # Clamp
    x = jax.nn.relu(nn.conv2d(x, d["1"], padding=1))
    x = _block(d["3"], x)
    x = _block(d["4"], x)
    x = _block(d["5"], x)
    x = nn.conv2d(_upsample2x(x), d["7"], padding=1)
    x = _block(d["8"], x)
    x = _block(d["9"], x)
    x = _block(d["10"], x)
    x = nn.conv2d(_upsample2x(x), d["12"], padding=1)
    x = _block(d["13"], x)
    x = _block(d["14"], x)
    x = _block(d["15"], x)
    x = nn.conv2d(_upsample2x(x), d["17"], padding=1)
    x = _block(d["18"], x)
    x = nn.conv2d(x, d["19"], padding=1)
    return jnp.clip(x, 0.0, 1.0)


def taesd_encode(params: Mapping[str, Any], image: jax.Array) -> jax.Array:
    """image [B,H,W,3] in [0,1] → latent [B,H/8,W/8,C] (raw latent space)."""
    e = params["encoder"]
    x = nn.conv2d(image, e["0"], padding=1)
    x = _block(e["1"], x)
    x = nn.conv2d(x, e["2"], stride=2, padding=1)
    x = _block(e["3"], x)
    x = _block(e["4"], x)
    x = _block(e["5"], x)
    x = nn.conv2d(x, e["6"], stride=2, padding=1)
    x = _block(e["7"], x)
    x = _block(e["8"], x)
    x = _block(e["9"], x)
    x = nn.conv2d(x, e["10"], stride=2, padding=1)
    x = _block(e["11"], x)
    x = _block(e["12"], x)
    x = _block(e["13"], x)
    return nn.conv2d(x, e["14"], padding=1)


def vae_approx_decode(params: Mapping[str, Any], latent: jax.Array) -> jax.Array:
    """VAEApprox forward (sd_vae_approx.py:22-31): latent [B,h,w,C] →
    RGB [B,2h,2w,3] roughly in [0,1] (the net was trained on half-res)."""
    x = _upsample2x(latent)
    x = jnp.pad(x, ((0, 0), (11, 11), (11, 11), (0, 0)))
    for name in ("conv1", "conv2", "conv3", "conv4",
                 "conv5", "conv6", "conv7", "conv8"):
        x = nn.conv2d(x, params[name])
        x = jax.nn.leaky_relu(x, 0.1)
    return x


# -- model registry ----------------------------------------------------------

_TAESD_BY_FAMILY = {
    "sd15": "taesd", "sd20": "taesd",
    "sdxl": "taesdxl", "sdxl_refiner": "taesdxl",
    "sd3": "taesd3", "flux": "taef1", "chroma": "taef1",
}

_cache: Dict[str, Any] = {}


def load_taesd(kind: str, part: str, model_dir: str = "models/VAE-taesd"
               ) -> Optional[Dict[str, Any]]:
    """kind: taesd|taesdxl|taesd3|taef1, part: decoder|encoder → nested
    params or None when the .pth isn't installed (no downloads here)."""
    key = f"{kind}_{part}"
    if key in _cache:
        return _cache[key]
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    for name in (f"{kind}_{part}.pth", f"{kind}_{part}.safetensors"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            sd = transform_for_jax(load_state_dict(path))
            if not any(k.startswith(part) for k in sd):
                sd = {f"{part}.{k}": v for k, v in sd.items()}
            _cache[key] = nest({k: jnp.asarray(v) for k, v in sd.items()})
            return _cache[key]
    return None


def taesd_for_family(family: str, part: str = "decoder",
                     model_dir: str = "models/VAE-taesd") -> Optional[Dict[str, Any]]:
    kind = _TAESD_BY_FAMILY.get(family)
    return load_taesd(kind, part, model_dir) if kind else None


@functools.lru_cache(maxsize=4)
def _jitted_taesd_decode():
    return jax.jit(taesd_decode)


def preview_decode(engine, latent, mode: str = "Approx cheap") -> np.ndarray:
    """Dispatch for the live-preview decoder option (reference
    sd_samplers_common.py:39-76 show_progress_type)."""
    from .preview import latent_to_rgb_cheap

    if mode == "TAESD":
        params = taesd_for_family(engine.family)
        if params is not None:
            raw = engine.latent_format.process_out(jnp.asarray(latent))
            rgb = _jitted_taesd_decode()(params, jnp.asarray(raw, jnp.float32))
            return (np.asarray(rgb) * 255).astype(np.uint8)
    if mode == "Approx NN":
        params = _cache.get("vae_approx")
        if params is not None:
            rgb = vae_approx_decode(params, jnp.asarray(latent, jnp.float32))
            return (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    if mode == "Full":
        return np.asarray(engine.decode_to_uint8(jnp.asarray(latent)))
    return latent_to_rgb_cheap(np.asarray(latent), engine.family)


def load_vae_approx(model_dir: str = "models/VAE-approx",
                    name: str = "model.pt") -> Optional[Dict[str, Any]]:
    path = os.path.join(model_dir, name)
    if not os.path.exists(path):
        return None
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    _cache["vae_approx"] = nest({k: jnp.asarray(v) for k, v in
                                 transform_for_jax(load_state_dict(path)).items()})
    return _cache["vae_approx"]
