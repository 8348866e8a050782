"""Numerics-parity gate vs the REFERENCE torch implementation.

tests/golden/*.npz hold forward outputs of the reference's
IntegratedUNet2DConditionModel / IntegratedAutoencoderKL (CPU torch, f32)
on the SAME tiny synthetic state dicts this suite uses — regenerate with
tools/make_golden.py where /root/reference is mounted. The strict
load_state_dict there also proves our synthetic checkpoints are key-exact
reference state dicts.

Gate: PSNR ≥ 40 dB (SURVEY §4 fidelity bar). Measured: UNet 108 dB,
VAE decode 124 dB, VAE encode 123 dB — f32 rounding noise."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from fixtures import CTX, make_unet_sd, make_vae_sd

from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _psnr(ours: np.ndarray, ref: np.ndarray) -> float:
    mse = float(np.mean((ours - ref) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.max(np.abs(ref)))
    return 10 * np.log10(peak ** 2 / mse)


@pytest.fixture(scope="module")
def unet_golden():
    path = os.path.join(GOLDEN, "unet_sd15_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    return np.load(path)


def test_unet_matches_reference(unet_golden):
    from forge_tpu.models.unet import UNetConfig, unet_apply

    g = unet_golden
    params = nest({k: jnp.asarray(v) for k, v in
                   transform_for_jax(make_unet_sd(prefix="", seed=1)).items()})
    out = unet_apply(params, jnp.asarray(g["x"].transpose(0, 2, 3, 1)),
                     jnp.asarray(g["t"]), jnp.asarray(g["ctx"]),
                     cfg=UNetConfig(context_dim=CTX, num_heads=4))
    ours = np.asarray(out).transpose(0, 3, 1, 2)
    psnr = _psnr(ours, g["ref"])
    assert psnr >= 40.0, f"UNet diverged from reference: PSNR {psnr:.1f} dB"


def test_vae_matches_reference():
    path = os.path.join(GOLDEN, "vae_sd15_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from forge_tpu.models.vae import encoder_apply, vae_decode
    from forge_tpu.ops import nn as tnn

    g = np.load(path)
    params = nest({k: jnp.asarray(v) for k, v in
                   transform_for_jax(make_vae_sd(prefix="", seed=2)).items()})
    dec = np.asarray(vae_decode(params, jnp.asarray(g["z"].transpose(0, 2, 3, 1))))
    psnr_d = _psnr(dec.transpose(0, 3, 1, 2), g["dec"])
    assert psnr_d >= 40.0, f"VAE decode diverged: PSNR {psnr_d:.1f} dB"

    m = encoder_apply(params["encoder"], jnp.asarray(g["img"].transpose(0, 2, 3, 1)))
    m = tnn.conv2d(m, params["quant_conv"])
    psnr_e = _psnr(np.asarray(m).transpose(0, 3, 1, 2), g["enc_moments"])
    assert psnr_e >= 40.0, f"VAE encode diverged: PSNR {psnr_e:.1f} dB"


def test_clip_matches_reference():
    """HF CLIPTextModel is the implementation the reference wraps
    (text_processing/classic_engine.py); measured 134 dB."""
    path = os.path.join(GOLDEN, "clip_sd15_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from fixtures import make_clip_sd

    from forge_tpu.models.clip import ClipConfig, clip_text_apply

    g = np.load(path)
    params = nest({k: jnp.asarray(v)
                   for k, v in make_clip_sd(prefix="", seed=3).items()})
    final, hiddens, pooled = clip_text_apply(
        params, jnp.asarray(g["toks"].astype(np.int32)),
        cfg=ClipConfig(num_heads=4, act="quick_gelu"))
    assert _psnr(np.asarray(final), g["ref"]) >= 40.0
    assert _psnr(np.asarray(hiddens[-2]), g["hidden_m2"]) >= 40.0  # clip-skip tap
    assert np.abs(np.asarray(pooled) - g["pooled"]).max() < 1e-4


def test_t5_matches_reference():
    """HF T5EncoderModel parity (relative attention bias + masking);
    measured 122 dB."""
    path = os.path.join(GOLDEN, "t5_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from forge_tpu.core.synth import synth_t5_sd
    from forge_tpu.models.t5 import t5_apply

    g = np.load(path)
    sd = synth_t5_sd(width=64, layers=2, heads=4, ff=128, vocab=100,
                     fill="random", seed=24, prefix="")
    params = nest({k: jnp.asarray(np.asarray(v)) for k, v in sd.items()})
    out = t5_apply(params, jnp.asarray(g["toks"].astype(np.int32)), num_heads=4,
                   attention_mask=jnp.asarray(g["mask"].astype(np.float32)))
    psnr = _psnr(np.asarray(out), g["ref"])
    assert psnr >= 40.0, f"T5 diverged: PSNR {psnr:.1f} dB"


def test_flux_matches_reference():
    """Reference torch IntegratedFluxTransformer2DModel parity (patchify
    channel ordering, RoPE, adaLN modulation); measured 85 dB — the
    residual is the reference's own ~1e-4 timestep-embedding note
    (backend/nn/flux.py:56)."""
    path = os.path.join(GOLDEN, "flux_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from forge_tpu.core.synth import synth_flux_sd
    from forge_tpu.models.flux import FluxConfig, flux_apply

    g = np.load(path)
    sd = synth_flux_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                       context_dim=64, pooled_dim=64, fill="random",
                       seed=21, prefix="")
    params = nest({k: jnp.asarray(np.asarray(v))
                   for k, v in transform_for_jax(sd).items()})
    out = flux_apply(params, jnp.asarray(g["x"].transpose(0, 2, 3, 1)),
                     jnp.asarray(g["t"] * 1000.0), jnp.asarray(g["ctx"]),
                     jnp.asarray(g["y"]), guidance=jnp.asarray(g["g"]),
                     cfg=FluxConfig(num_heads=4, axes_dim=(4, 6, 6),
                                    guidance_embed=True))
    psnr = _psnr(np.asarray(out).transpose(0, 3, 1, 2), g["ref"])
    assert psnr >= 40.0, f"Flux diverged: PSNR {psnr:.1f} dB"


def test_mmdit_matches_reference():
    """Reference torch MMDiTX parity (joint blocks, cropped pos grid,
    channel-last unpatchify); measured 85 dB."""
    path = os.path.join(GOLDEN, "mmdit_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from forge_tpu.core.synth import synth_mmdit_sd
    from forge_tpu.models.mmdit import mmdit_apply

    g = np.load(path)
    sd = synth_mmdit_sd(hidden=64, depth=1, context_dim=32, pooled_dim=48,
                        in_channels=16, pos_max=8, fill="random", seed=31,
                        prefix="")
    params = nest({k: jnp.asarray(np.asarray(v))
                   for k, v in transform_for_jax(sd).items()})
    out = mmdit_apply(params, jnp.asarray(g["x"].transpose(0, 2, 3, 1)),
                      jnp.asarray(g["t"]), jnp.asarray(g["ctx"]),
                      jnp.asarray(g["y"]))
    psnr = _psnr(np.asarray(out).transpose(0, 3, 1, 2), g["ref"])
    assert psnr >= 40.0, f"MMDiT diverged: PSNR {psnr:.1f} dB"


def test_chroma_matches_reference():
    """Reference torch IntegratedChromaTransformer2DModel parity
    (Approximator mod vectors, pruned modulation); measured 81 dB."""
    path = os.path.join(GOLDEN, "chroma_tiny.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (tools/make_golden.py)")
    from forge_tpu.core.synth import synth_chroma_sd
    from forge_tpu.models.chroma import chroma_apply
    from forge_tpu.models.flux import FluxConfig

    g = np.load(path)
    sd = synth_chroma_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                         context_dim=32, approx_hidden=64, approx_layers=2,
                         fill="random", seed=8, prefix="")
    params = nest({k: jnp.asarray(np.asarray(v))
                   for k, v in transform_for_jax(sd).items()})
    out = chroma_apply(params, jnp.asarray(g["x"].transpose(0, 2, 3, 1)),
                       jnp.asarray(g["t"] * 1000.0), jnp.asarray(g["ctx"]),
                       cfg=FluxConfig(num_heads=4, axes_dim=(4, 6, 6),
                                      guidance_embed=False))
    psnr = _psnr(np.asarray(out).transpose(0, 3, 1, 2), g["ref"])
    assert psnr >= 40.0, f"Chroma diverged: PSNR {psnr:.1f} dB"
