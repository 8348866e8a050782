"""Sampler parity vs the reference k-diffusion (stored-oracle form).

tests/fixtures_samplers.npz holds final latents computed by the REFERENCE
k_diffusion samplers (torch, fp32 CPU) on the affine denoiser
x0 = 0.55·x + 0.8 over an 8-step Karras schedule — regenerate with
tools/gen_sampler_fixtures.py. Matching to ~1e-3 validates the integrator
re-derivations (each sampler's oracle value differs at the 1e-2 level, so a
wrong order/coefficient fails loudly)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.sampling.samplers import get_sampler

FIX = os.path.join(os.path.dirname(__file__), "fixtures_samplers.npz")
A, B = 0.55, 0.8

CASES = {
    "euler": "Euler",
    "heun": "Heun",
    "dpmpp_2m": "DPM++ 2M",
    "lms": "LMS",
    "ipndm": "ipndm",
    "ipndm_v": "ipndm_v",
    "deis": "DEIS",
    "dpm_fast": "DPM fast",
    "heunpp2": "Heun++2",
}


@pytest.fixture(scope="module")
def fix():
    return np.load(FIX)


@pytest.mark.parametrize("key", list(CASES.keys()))
def test_matches_reference(key, fix):
    sigmas = jnp.asarray(fix["sigmas"])
    x = jnp.asarray(fix["x_init"]).transpose(0, 2, 3, 1)  # NCHW → NHWC
    info = get_sampler(CASES[key])
    model_fn = lambda xx, sigma: A * xx + B
    out = np.asarray(info.fn(model_fn, x, sigmas)).transpose(0, 3, 1, 2)
    ref = fix[key]
    err = np.abs(out - ref).max()
    assert err < 5e-3, (key, err)
