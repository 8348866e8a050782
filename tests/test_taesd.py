"""TAESD / Approx-NN preview decoder tests on synthetic checkpoints shaped
exactly like the official taesd .pth files (torch Sequential key indices,
sd_vae_taesd.py:37-54) — key compatibility IS the test."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.tree import nest
from forge_tpu.pipeline.taesd import (
    taesd_decode,
    taesd_encode,
    vae_approx_decode,
)


def _conv_hwio(rng, o, i, k):
    return (rng.standard_normal((k, k, i, o)).astype(np.float32)
            * (0.5 / np.sqrt(k * k * i)))


def _block_keys(rng, prefix, n=64):
    return {
        f"{prefix}.conv.0.weight": _conv_hwio(rng, n, n, 3),
        f"{prefix}.conv.0.bias": np.zeros(n, np.float32),
        f"{prefix}.conv.2.weight": _conv_hwio(rng, n, n, 3),
        f"{prefix}.conv.2.bias": np.zeros(n, np.float32),
        f"{prefix}.conv.4.weight": _conv_hwio(rng, n, n, 3),
        f"{prefix}.conv.4.bias": np.zeros(n, np.float32),
    }


def _tiny_taesd_decoder(rng, lc=4):
    sd = {
        "decoder.1.weight": _conv_hwio(rng, 64, lc, 3),
        "decoder.1.bias": np.zeros(64, np.float32),
        "decoder.19.weight": _conv_hwio(rng, 3, 64, 3),
        "decoder.19.bias": np.zeros(3, np.float32),
    }
    for i in (3, 4, 5, 8, 9, 10, 13, 14, 15, 18):
        sd.update(_block_keys(rng, f"decoder.{i}"))
    for i in (7, 12, 17):
        sd[f"decoder.{i}.weight"] = _conv_hwio(rng, 64, 64, 3)
    return nest({k: jnp.asarray(v) for k, v in sd.items()})


def _tiny_taesd_encoder(rng, lc=4):
    sd = {
        "encoder.0.weight": _conv_hwio(rng, 64, 3, 3),
        "encoder.0.bias": np.zeros(64, np.float32),
        "encoder.14.weight": _conv_hwio(rng, lc, 64, 3),
        "encoder.14.bias": np.zeros(lc, np.float32),
    }
    for i in (1, 3, 4, 5, 7, 8, 9, 11, 12, 13):
        sd.update(_block_keys(rng, f"encoder.{i}"))
    for i in (2, 6, 10):
        sd[f"encoder.{i}.weight"] = _conv_hwio(rng, 64, 64, 3)
    return nest({k: jnp.asarray(v) for k, v in sd.items()})


def test_taesd_decode_shape_and_range():
    rng = np.random.default_rng(0)
    params = _tiny_taesd_decoder(rng)
    latent = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    rgb = taesd_decode(params, latent)
    assert rgb.shape == (1, 64, 64, 3)  # 8× upsample
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_taesd_encode_shape():
    rng = np.random.default_rng(1)
    params = _tiny_taesd_encoder(rng)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    lat = taesd_encode(params, img)
    assert lat.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_vae_approx_shape():
    rng = np.random.default_rng(2)
    params = {}
    dims = [(8, 4, 7), (16, 8, 5), (32, 16, 3), (64, 32, 3),
            (32, 64, 3), (16, 32, 3), (8, 16, 3), (3, 8, 3)]
    for n, (o, i, k) in enumerate(dims, start=1):
        params[f"conv{n}"] = {"weight": jnp.asarray(_conv_hwio(rng, o, i, k)),
                              "bias": jnp.zeros(o, jnp.float32)}
    latent = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    rgb = vae_approx_decode(params, latent)
    # 2× upsample + 22 pad − (7−1)−(5−1)−6·(3−1) = 2h
    assert rgb.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_preview_dispatch_cheap_fallback():
    """Without installed TAESD weights, preview falls back to the cheap
    matmul path regardless of the requested mode."""
    from forge_tpu.pipeline.taesd import preview_decode

    class _Eng:
        family = "sd15"

        class latent_format:
            scale_factor = 0.18215

    latent = np.random.default_rng(3).standard_normal((1, 8, 8, 4)).astype(np.float32)
    img = preview_decode(_Eng(), latent, mode="TAESD")
    assert img.shape == (1, 8, 8, 3) and img.dtype == np.uint8
