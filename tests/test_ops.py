"""Kernel-level tests: attention impls vs f64 ground truth and torch oracles,
norms vs torch, timestep embedding conventions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forge_tpu.ops.attention import attention, xla_attention
from forge_tpu.ops.flash_attention import flash_attention
from forge_tpu.ops import nn


def _np_attention(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (1, 2, 64, 64, 40),     # SD1.5 head dim, unaligned
        (1, 2, 77, 200, 80),    # cross-attn-ish, tail masking
        (1, 1, 130, 130, 512),  # VAE single-head spatial
    ],
)
def test_flash_attention_matches_f64(b, h, lq, lk, d):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, d)).astype(np.float32)
    ref = _np_attention(q, k, v, 1 / np.sqrt(d))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    assert np.abs(ref - out).max() < 5e-5


def test_attention_frontend_heads_split():
    rng = np.random.default_rng(1)
    b, l, heads, d = 2, 16, 4, 8
    q = rng.standard_normal((b, l, heads * d)).astype(np.float32)
    k = rng.standard_normal((b, l, heads * d)).astype(np.float32)
    v = rng.standard_normal((b, l, heads * d)).astype(np.float32)
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=heads, impl="xla")
    qh = q.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    ref = _np_attention(qh, kh, vh, 1 / np.sqrt(d)).transpose(0, 2, 1, 3).reshape(b, l, heads * d)
    assert np.abs(np.asarray(out) - ref).max() < 1e-4


def test_group_norm_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ours = np.asarray(
        nn.group_norm(jnp.asarray(x), {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, num_groups=8)
    )
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.group_norm(xt, 8, torch.tensor(w), torch.tensor(b))
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.abs(ours - ref).max() < 1e-5


def test_layer_norm_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 7, 48)).astype(np.float32)
    w = rng.standard_normal(48).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    ours = np.asarray(nn.layer_norm(jnp.asarray(x), {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}))
    ref = torch.nn.functional.layer_norm(torch.tensor(x), (48,), torch.tensor(w), torch.tensor(b)).numpy()
    assert np.abs(ours - ref).max() < 1e-5


def test_conv2d_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 9, 9, 6)).astype(np.float32)
    w = rng.standard_normal((8, 6, 3, 3)).astype(np.float32)  # torch OIHW
    b = rng.standard_normal(8).astype(np.float32)
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    ours = np.asarray(
        nn.conv2d(jnp.asarray(x), {"weight": w_hwio, "bias": jnp.asarray(b)}, stride=2, padding=1)
    )
    ref = torch.nn.functional.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w), torch.tensor(b), stride=2, padding=1
    ).permute(0, 2, 3, 1).numpy()
    assert np.abs(ours - ref).max() < 1e-4


def test_timestep_embedding_convention():
    # cos in the first half, sin in the second (LDM convention)
    emb = np.asarray(nn.timestep_embedding(jnp.asarray([0.0]), 8))
    assert np.allclose(emb[0, :4], 1.0)
    assert np.allclose(emb[0, 4:], 0.0)


def test_flash_attention_dispatch_shapes():
    """The dispatcher (own kernel / bundled kernel / einsum) is numerically
    consistent across the in-model shape zoo, including odd kv lengths
    (cross-attention) and non-lane-aligned head dims."""
    from forge_tpu.ops.attention import xla_attention
    from forge_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(11)
    for b, h, lq, lk, d in [(2, 4, 256, 256, 64), (1, 2, 512, 154, 64),
                            (2, 10, 1024, 1024, 64), (1, 8, 256, 256, 40)]:
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
        ref = np.asarray(xla_attention(q, k, v, scale=d ** -0.5))
        out = np.asarray(flash_attention(q, k, v, interpret=True))
        assert np.allclose(out, ref, atol=2e-3), (b, h, lq, lk, d,
                                                  np.abs(out - ref).max())
