"""Attention front-end: one API, selectable implementations.

Mirrors the role of the reference's `attention_function` global
(backend/attention.py:430-441, chosen once among xformers/SDP/split/sub-quad)
but TPU-native: the default on TPU is the Pallas flash kernel; `xla` is a
plain einsum+softmax the XLA compiler fuses (also the CPU/test path). There is
no OOM-retry slicing ladder — flash attention is already O(L) memory.

Calling convention matches the reference: q/k/v are [B, L, heads*dim]
("spatial" tokens-last-flattened), `heads` splits the channel dim.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

_IMPL = None  # resolved lazily: "flash" on TPU, "xla" elsewhere


def default_impl() -> str:
    return "flash" if jax.default_backend() == "tpu" else "xla"


def set_attention_impl(name: Optional[str]) -> None:
    global _IMPL
    if name not in (None, "flash", "xla"):
        raise ValueError(f"unknown attention impl {name!r}")
    _IMPL = name


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention over [B, L, heads*dim] tensors → same shape."""
    b, lq, inner = q.shape
    dim = inner // heads
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(dim)

    qh = q.reshape(b, lq, heads, dim).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, dim).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, dim).transpose(0, 2, 1, 3)

    impl = impl or _IMPL or default_impl()
    # Measured on v5e: the unfused einsum materializes [B,H,L,L] f32 logits
    # in HBM — in-model that traffic loses to the blocked kernel even at
    # L=1024 where standalone microbenches suggest otherwise. Flash for all
    # non-trivial lengths; einsum only for tiny sequences and masked calls.
    if impl == "flash" and mask is None and lq >= 512 and lk >= 512:
        out = flash_attention(qh, kh, vh, scale=scale)
    else:
        out = xla_attention(qh, kh, vh, scale=scale, mask=mask)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, inner)


def xla_attention(q, k, v, scale: float, mask: Optional[jax.Array] = None) -> jax.Array:
    """[B,H,L,D] einsum attention with f32 softmax; XLA fuses the chain."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if mask is not None:
        s = jnp.where(mask, s, jnp.asarray(-1e30, s.dtype))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        precision=jax.lax.Precision.HIGHEST,
    )


def attention_single_head_spatial(q, k, v, impl: Optional[str] = None) -> jax.Array:
    """VAE attention: q/k/v are [B, H*W, C] single-head (reference
    backend/attention.py:443-451). Channel dim is lane-aligned (512), so the
    flash kernel handles it directly with heads=1."""
    return attention(q, k, v, heads=1, impl=impl)
