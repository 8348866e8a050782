"""Tiny SDXL engine end-to-end: dual text encoders (CLIP-L HF layout +
CLIP-G open_clip layout converted at load), size conditioning vector, txt2img."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.synth import synth_clip_sd, synth_unet_sd, synth_vae_sd, _Fill
from forge_tpu.models.unet import UNetConfig
from forge_tpu.pipeline.engine import load_engine
from forge_tpu.pipeline.processing import Processing, process_images

GW = 64  # tiny clip-g width
LW = 64  # tiny clip-l width
CTX = LW + GW
ADM = GW + 6 * 256


def _tiny_sdxl_checkpoint():
    sd = {}
    sd.update(
        synth_unet_sd(
            model_channels=32,
            channel_mult=(1, 2),
            num_res_blocks=1,
            transformer_depth=(0, 1),
            context_dim=CTX,
            adm_in_channels=ADM,
            middle_depth=1,
            fill="random",
            seed=11,
        )
    )
    sd.update(synth_vae_sd(ch=32, fill="random", seed=12))
    sd.update(synth_clip_sd(width=LW, layers=2, fill="random", seed=13,
                            prefix="conditioner.embedders.0.transformer."))
    # tiny open_clip G tower
    f = _Fill("random", 14)
    g = "conditioner.embedders.1.model."
    sd[g + "positional_embedding"] = f.w(77, GW)
    sd[g + "token_embedding.weight"] = f.w(49408, GW)
    sd[g + "ln_final.weight"] = f.ones(GW)
    sd[g + "ln_final.bias"] = f.zeros(GW)
    sd[g + "text_projection"] = f.w(GW, GW)
    for i in range(2):
        base = f"{g}transformer.resblocks.{i}."
        sd[base + "attn.in_proj_weight"] = f.w(GW * 3, GW)
        sd[base + "attn.in_proj_bias"] = f.zeros(GW * 3)
        sd[base + "attn.out_proj.weight"] = f.w(GW, GW)
        sd[base + "attn.out_proj.bias"] = f.zeros(GW)
        for ln in ("ln_1", "ln_2"):
            sd[base + ln + ".weight"] = f.ones(GW)
            sd[base + ln + ".bias"] = f.zeros(GW)
        sd[base + "mlp.c_fc.weight"] = f.w(GW * 4, GW)
        sd[base + "mlp.c_fc.bias"] = f.zeros(GW * 4)
        sd[base + "mlp.c_proj.weight"] = f.w(GW, GW * 4)
        sd[base + "mlp.c_proj.bias"] = f.zeros(GW)
    return sd


@pytest.fixture(scope="module")
def engine():
    eng = load_engine(_tiny_sdxl_checkpoint(), dtype=jnp.float32)
    eng.unet_cfg = UNetConfig(context_dim=CTX, num_heads=4, use_linear_projection=True,
                              adm_in_channels=ADM)
    return eng


def test_family_and_encoders(engine):
    assert engine.family == "sdxl"
    assert set(engine.text_engines) == {"clip_l", "clip_g"}


def test_conditioning_shapes(engine):
    cond = engine.get_learned_conditioning(["a cat"], 64, 64)
    assert cond["context"].shape == (1, 77, CTX)
    assert cond["y"].shape == (1, ADM)


def test_sdxl_txt2img(engine):
    p = Processing(prompt="an astronaut", negative_prompt="bad", seed=7,
                   steps=2, width=32, height=32, sampler_name="Euler")
    r = process_images(engine, p)
    assert r.images[0].shape == (32, 32, 3)
    r2 = process_images(engine, Processing(prompt="an astronaut", negative_prompt="bad",
                                           seed=7, steps=2, width=32, height=32,
                                           sampler_name="Euler"))
    assert np.array_equal(r.images[0], r2.images[0])


def test_sd2_open_clip_pipeline():
    """SD2 family: open_clip-layout text tower converted at load, 'v' flagged
    checkpoints get v-prediction."""
    sd = {}
    sd.update(synth_unet_sd(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                            transformer_depth=(1, 1), context_dim=GW, middle_depth=1,
                            fill="random", seed=31))
    sd.update(synth_vae_sd(ch=32, fill="random", seed=32))
    f = _Fill("random", 33)
    g = "cond_stage_model.model."
    sd[g + "positional_embedding"] = f.w(77, GW)
    sd[g + "token_embedding.weight"] = f.w(49408, GW)
    sd[g + "ln_final.weight"] = f.ones(GW)
    sd[g + "ln_final.bias"] = f.zeros(GW)
    for i in range(2):
        base = f"{g}transformer.resblocks.{i}."
        sd[base + "attn.in_proj_weight"] = f.w(GW * 3, GW)
        sd[base + "attn.in_proj_bias"] = f.zeros(GW * 3)
        sd[base + "attn.out_proj.weight"] = f.w(GW, GW)
        sd[base + "attn.out_proj.bias"] = f.zeros(GW)
        for ln in ("ln_1", "ln_2"):
            sd[base + ln + ".weight"] = f.ones(GW)
            sd[base + ln + ".bias"] = f.zeros(GW)
        sd[base + "mlp.c_fc.weight"] = f.w(GW * 4, GW)
        sd[base + "mlp.c_fc.bias"] = f.zeros(GW * 4)
        sd[base + "mlp.c_proj.weight"] = f.w(GW, GW * 4)
        sd[base + "mlp.c_proj.bias"] = f.zeros(GW)

    eng = load_engine(sd, dtype=jnp.float32)
    assert eng.family == "sd20"
    eng.unet_cfg = UNetConfig(context_dim=GW, num_heads=4, use_linear_projection=True)
    r = process_images(eng, Processing(prompt="a fox", seed=2, steps=2,
                                       width=32, height=32, sampler_name="Euler"))
    assert r.images[0].shape == (32, 32, 3)
    assert np.isfinite(r.images[0].astype(np.float32)).all()
