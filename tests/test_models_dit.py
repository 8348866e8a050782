"""Flux / SD3 MMDiT / T5 forward tests on tiny synthetic params (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.synth import synth_flux_sd, synth_mmdit_sd, synth_t5_sd
from forge_tpu.core.tree import nest
from forge_tpu.core import guess as guess_mod


def _nested(sd, prefix):
    return nest(transform_for_jax({k[len(prefix):]: v for k, v in sd.items()}))


def test_flux_forward():
    from forge_tpu.models.flux import FluxConfig, flux_apply

    sd = synth_flux_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                       context_dim=32, pooled_dim=16, fill="random", prefix="")
    params = nest(transform_for_jax(sd))
    cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6))
    x = jnp.ones((1, 8, 8, 16))
    out = flux_apply(params, x, jnp.asarray([500.0]), jnp.ones((1, 12, 32)),
                     jnp.ones((1, 16)), guidance=jnp.asarray([3.5]), cfg=cfg)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_guess():
    sd = synth_flux_sd(hidden=64, num_heads=4, depth=1, depth_single=1,
                       context_dim=32, pooled_dim=16)
    g = guess_mod.guess(sd)
    assert g.family == "flux"
    assert g.prediction == "flow"


def test_mmdit_forward():
    from forge_tpu.models.mmdit import MMDiTConfig, mmdit_apply

    sd = synth_mmdit_sd(hidden=64, depth=3, context_dim=32, pooled_dim=16,
                        pos_max=16, fill="random", prefix="")
    params = nest(transform_for_jax(sd))
    cfg = MMDiTConfig(num_heads=4, pos_embed_max_size=16)
    x = jnp.ones((1, 8, 8, 16))
    out = mmdit_apply(params, x, jnp.asarray([500.0]), jnp.ones((1, 10, 32)),
                      jnp.ones((1, 16)), cfg=cfg)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_guess():
    sd = synth_mmdit_sd(hidden=64, depth=1, pos_max=8)
    g = guess_mod.guess(sd)
    assert g.family == "sd3"


def test_t5_forward():
    from forge_tpu.models.t5 import t5_apply

    sd = synth_t5_sd(width=64, layers=2, heads=4, ff=128, vocab=100,
                     fill="random", prefix="")
    params = nest(transform_for_jax(sd))
    tokens = jnp.asarray([[1, 5, 9, 2, 0, 0]], jnp.int32)
    out = t5_apply(params, tokens, num_heads=4)
    assert out.shape == (1, 6, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_t5_relative_buckets():
    from forge_tpu.models.t5 import relative_position_buckets

    b = relative_position_buckets(8, 8)
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    # symmetric distances land in distinct direction buckets
    assert b[0, 1] != b[1, 0]


def test_chroma_forward_and_guess():
    from forge_tpu.core.synth import synth_chroma_sd
    from forge_tpu.models.chroma import chroma_apply
    from forge_tpu.models.flux import FluxConfig

    sd = synth_chroma_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                         context_dim=32, approx_hidden=64, approx_layers=2,
                         fill="random")
    g = guess_mod.guess(sd)
    assert g.family == "chroma"

    params = _nested(sd, "model.diffusion_model.")
    cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6), guidance_embed=False)
    out = chroma_apply(params, jnp.ones((1, 8, 8, 16)), jnp.asarray([500.0]),
                       jnp.ones((1, 12, 32)), cfg=cfg)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
