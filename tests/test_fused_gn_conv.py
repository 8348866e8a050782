"""Fused GroupNorm+SiLU+conv3x3 Pallas kernel vs the unfused XLA path.

The kernel body runs on CPU via interpret mode (repo convention — every
Pallas kernel must be testable without a TPU); dispatch eligibility and the
torch-pad-after-activation edge semantics are covered explicitly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forge_tpu.ops import nn
from forge_tpu.ops.fused_gn_conv import eligible, gn_silu_conv3x3


def _params(c, o, seed=0, bias=True, gn_scale=1.0):
    r = np.random.default_rng(seed)
    gn_p = {"weight": jnp.asarray(r.standard_normal(c) * gn_scale + 1.0,
                                  jnp.float32),
            "bias": jnp.asarray(r.standard_normal(c) * 0.2, jnp.float32)}
    conv_p = {"weight": jnp.asarray(r.standard_normal((3, 3, c, o)) * 0.05,
                                    jnp.float32)}
    if bias:
        conv_p["bias"] = jnp.asarray(r.standard_normal(o) * 0.1, jnp.float32)
    return gn_p, conv_p


def _reference(x, gn_p, conv_p, num_groups, eps=1e-5):
    h = nn.group_norm(x, gn_p, num_groups=num_groups, eps=eps, act="silu")
    return nn.conv2d(h, conv_p, padding=1)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 128), 32),   # interior + all four edges, B>1
    ((1, 8, 8, 256), 32),     # single row-tile: first==last branch
    ((1, 24, 8, 128), 32),    # three tiles: first / interior / last
])
def test_kernel_matches_unfused(shape, groups):
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal(shape) * 2.0, jnp.float32)
    c = shape[-1]
    gn_p, conv_p = _params(c, 128, seed=c)
    want = np.asarray(_reference(x, gn_p, conv_p, groups))
    got = np.asarray(gn_silu_conv3x3(x, gn_p, conv_p, num_groups=groups,
                                     interpret=True))
    assert want.shape == got.shape
    err = np.abs(want - got).max()
    assert err < 5e-4, err


def test_kernel_bf16_inputs():
    """bf16 activations, f32 accumulation — the production dtype path."""
    r = np.random.default_rng(9)
    x = jnp.asarray(r.standard_normal((1, 16, 8, 128)), jnp.bfloat16)
    gn_p, conv_p = _params(128, 128, seed=2)
    want = np.asarray(_reference(x, gn_p, conv_p, 32), np.float32)
    got = np.asarray(gn_silu_conv3x3(x, gn_p, conv_p, interpret=True),
                     np.float32)
    # bf16 activations: tolerance scales with output magnitude
    denom = max(np.abs(want).max(), 1.0)
    assert np.abs(want - got).max() / denom < 2e-2


def test_pad_is_zero_after_activation():
    """A constant-input check that the halo is padded AFTER SiLU: with x
    constant per group, silu(gn(x)) = silu(beta) ≠ 0 inside, exactly 0 in
    the pad — a kernel that pads before the activation gets every border
    pixel wrong."""
    c = 128
    x = jnp.ones((1, 8, 8, c), jnp.float32)
    gn_p = {"weight": jnp.ones(c, jnp.float32),
            "bias": jnp.full(c, 2.0, jnp.float32)}  # silu(2) ≈ 1.76
    conv_p = {"weight": jnp.ones((3, 3, c, 128), jnp.float32)}
    want = np.asarray(_reference(x, gn_p, conv_p, 32))
    got = np.asarray(gn_silu_conv3x3(x, gn_p, conv_p, interpret=True))
    # corners see 4 taps, edges 6, interior 9 — border handling is the test
    assert np.allclose(want, got, atol=1e-3), np.abs(want - got).max()


def test_dispatch_eligibility():
    assert eligible((1, 512, 512, 512), (3, 3, 512, 512))    # VAE decoder
    assert eligible((1, 1024, 1024, 128), (3, 3, 128, 128))  # VAE tail
    assert not eligible((2, 64, 64, 640), (3, 3, 640, 640))  # FLOP-bound
    assert not eligible((2, 128, 128, 320), (3, 3, 320, 320))  # C not /128
    assert not eligible((1, 512, 512, 1280), (3, 3, 1280, 1280))  # VMEM cap
    assert not eligible((1, 512, 512, 512), (1, 1, 512, 512))  # not 3x3
    assert not eligible((1, 512, 512, 512), (3, 3, 512, 4))    # tiny O
    assert not eligible((1, 513, 512, 512), (3, 3, 512, 512))  # H indivisible


def test_unfused_fallback_matches():
    """Ineligible shapes route through the XLA path unchanged."""
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal((1, 7, 8, 128)), jnp.float32)
    gn_p, conv_p = _params(128, 128, seed=1)
    want = np.asarray(_reference(x, gn_p, conv_p, 32))
    got = np.asarray(gn_silu_conv3x3(x, gn_p, conv_p))
    assert np.abs(want - got).max() < 1e-5
