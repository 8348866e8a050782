"""Model-level tests on tiny synthetic checkpoints: loader/guesser splits,
UNet and VAE forward shapes & determinism, CLIP engine output shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import (
    CLIP_WIDTH, CTX, make_clip_sd, make_sd15_checkpoint, make_tiny_engine,
    make_unet_sd, make_vae_sd,
)

from forge_tpu.core import guess as guess_mod
from forge_tpu.core.loader import load_checkpoint_parts
from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest
from forge_tpu.models.unet import UNetConfig, unet_apply
from forge_tpu.models.vae import vae_decode, vae_encode


def test_guess_sd15():
    sd = make_sd15_checkpoint()
    g = guess_mod.guess(sd)
    assert g.family == "sd15"
    assert g.prediction == "eps"
    assert "clip_l" in g.text_encoders
    assert any(k.startswith("input_blocks") for k in g.unet)
    assert any(k.startswith("encoder.") for k in g.vae)


def _unet_params():
    sd = make_unet_sd(prefix="")
    return nest(transform_for_jax(sd))


def test_unet_forward_shapes():
    params = _unet_params()
    cfg = UNetConfig(context_dim=CTX, num_heads=4)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jnp.zeros((2, 77, CTX))
    out = unet_apply(params, x, t, ctx, cfg=cfg)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_deterministic_and_context_sensitive():
    params = _unet_params()
    cfg = UNetConfig(context_dim=CTX, num_heads=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([100.0])
    c1 = jnp.asarray(rng.standard_normal((1, 77, CTX)), jnp.float32)
    c2 = jnp.asarray(rng.standard_normal((1, 77, CTX)), jnp.float32)
    a = unet_apply(params, x, t, c1, cfg=cfg)
    b = unet_apply(params, x, t, c1, cfg=cfg)
    c = unet_apply(params, x, t, c2, cfg=cfg)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_unet_control_residuals():
    params = _unet_params()
    cfg = UNetConfig(context_dim=CTX, num_heads=4)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.asarray([10.0])
    ctx = jnp.zeros((1, 77, CTX))
    base = unet_apply(params, x, t, ctx, cfg=cfg)
    control = {"middle": [jnp.ones((1, 8, 8, 64))]}
    out = unet_apply(params, x, t, ctx, cfg=cfg, control=control)
    assert not np.array_equal(np.asarray(base), np.asarray(out))


def test_vae_roundtrip_shapes():
    params = nest(transform_for_jax(make_vae_sd(prefix="")))
    img = jnp.zeros((1, 32, 32, 3))
    z = vae_encode(params, img)
    assert z.shape == (1, 4, 4, 4)
    rec = vae_decode(params, z)
    assert rec.shape == (1, 32, 32, 3)


def test_loader_builds_engine():
    eng = make_tiny_engine()
    assert eng.family == "sd15"
    cond = eng.get_learned_conditioning(["a cat"], 64, 64)
    assert cond["context"].shape[0] == 1
    assert cond["context"].shape[1] == 77
    assert cond["context"].shape[2] == CLIP_WIDTH


def test_text_engine_chunk_equalization():
    eng = make_tiny_engine()
    long_prompt = ", ".join(["a beautiful painting of a landscape"] * 12)
    te = eng.text_engines["clip_l"]
    _, n_long = te.tokenize_batch([long_prompt])
    assert n_long > 1
    z, _ = te([long_prompt])
    assert z.shape[1] == 77 * n_long
    # cond/uncond equalization pads the short one
    z_short, _ = te([""], max_chunks=n_long)
    assert z_short.shape[1] == 77 * n_long
