"""Tiny Flux engine end-to-end: merged checkpoint (flux transformer + 16ch VAE
+ CLIP-L + T5) through guess/loader/engine/txt2img with flow sampling and
distilled-CFG guidance."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.synth import synth_clip_sd, synth_flux_sd, synth_t5_sd, synth_vae_sd
from forge_tpu.models.flux import FluxConfig
from forge_tpu.pipeline.engine import load_engine
from forge_tpu.pipeline.processing import Processing, process_images

HID = 64
T5W = 64


def _tiny_flux_checkpoint():
    sd = {}
    sd.update(synth_flux_sd(hidden=HID, num_heads=4, depth=2, depth_single=2,
                            context_dim=T5W, pooled_dim=64, fill="random", seed=21))
    sd.update(synth_vae_sd(ch=32, z_channels=16, fill="random", seed=22))
    sd.update(synth_clip_sd(width=64, layers=2, fill="random", seed=23,
                            prefix="text_encoders.clip_l.transformer."))
    sd.update(synth_t5_sd(width=T5W, layers=2, heads=4, ff=128, fill="random", seed=24))
    return sd


@pytest.fixture(scope="module")
def engine():
    eng = load_engine(_tiny_flux_checkpoint(), dtype=jnp.float32)
    eng.flux_cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6), guidance_embed=True)
    return eng


def test_family_and_predictor(engine):
    assert engine.family == "flux"
    assert engine.predictor.sigma_max <= 1.0 + 1e-6
    assert set(engine.text_engines) == {"clip_l", "t5xxl"}


def test_conditioning(engine):
    cond = engine.get_learned_conditioning(["a red fox"], 64, 64)
    assert cond["context"].shape == (1, 512, T5W)
    assert cond["y"].shape[0] == 1


def test_flux_txt2img(engine):
    p = Processing(prompt="a red fox", seed=3, steps=2, width=32, height=32,
                   cfg_scale=1.0, sampler_name="Euler", scheduler="simple")
    r = process_images(engine, p)
    assert r.images[0].shape == (32, 32, 3)
    assert np.isfinite(r.images[0].astype(np.float32)).all()
    r2 = process_images(engine, p)
    assert np.array_equal(r.images[0], r2.images[0])


def test_flux_quantized_txt2img():
    """Quantized-unet loading path (block formats + online dequant)."""
    eng = load_engine(_tiny_flux_checkpoint(), dtype=jnp.float32, unet_quant="q8_0")
    eng.flux_cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6), guidance_embed=True)
    p = Processing(prompt="a red fox", seed=3, steps=2, width=32, height=32,
                   cfg_scale=1.0, sampler_name="Euler", scheduler="simple")
    r = process_images(eng, p)
    assert r.images[0].shape == (32, 32, 3)
    assert np.isfinite(r.images[0].astype(np.float32)).all()


def test_flux_fp8_storage_txt2img():
    """fp8-e4m3 weight storage: big weights live as float8 in HBM and upcast
    at the matmul (reference unet storage dtype 'float8-e4m3fn')."""
    import jax

    from forge_tpu.core import loader as loader_mod

    orig = loader_mod.QUANT_MIN_SIZE
    loader_mod.QUANT_MIN_SIZE = 0  # tiny test weights are below the real cutoff
    try:
        eng = load_engine(_tiny_flux_checkpoint(), dtype=jnp.float32, unet_quant="fp8_e4m3")
    finally:
        loader_mod.QUANT_MIN_SIZE = orig
    eng.flux_cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6), guidance_embed=True)
    leaves = jax.tree.leaves(eng.loaded.unet)
    assert any(getattr(l, "dtype", None) == jnp.float8_e4m3fn for l in leaves)
    p = Processing(prompt="a red fox", seed=3, steps=2, width=32, height=32,
                   cfg_scale=1.0, sampler_name="Euler", scheduler="simple")
    r = process_images(eng, p)
    assert r.images[0].shape == (32, 32, 3)
    assert np.isfinite(r.images[0].astype(np.float32)).all()
