"""Fused dequant-matmul Pallas kernel vs dequantize-then-matmul (TPU only —
Mosaic kernels don't lower on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forge_tpu.ops import quant
from forge_tpu.ops.dequant_matmul import linear_quantized, prepare_for_kernel

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="Mosaic kernel needs TPU")


@pytest.mark.parametrize("kind", ["q8_0", "q4_0", "nf4"])
def test_fused_matches_dequant(kind):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((256, 512)) * 0.3).astype(np.float32)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    q = prepare_for_kernel(quant.quantize(w, kind))
    assert "codes2d" in q
    deq = np.asarray(quant.dequantize(q, jnp.float32))
    ref = x @ deq.T
    leaf = {**q, "codes2d": jnp.asarray(q["codes2d"]), "scales2d": jnp.asarray(q["scales2d"])}
    out = np.asarray(linear_quantized(jnp.asarray(x), leaf))
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, (kind, rel)


def test_fallback_for_unaligned():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((96, 192)) * 0.3).astype(np.float32)  # 192 % 512 != 0
    x = rng.standard_normal((2, 192)).astype(np.float32)
    q = prepare_for_kernel(quant.quantize(w, "q8_0"))
    out = np.asarray(linear_quantized(jnp.asarray(x), q))
    ref = x @ np.asarray(quant.dequantize(q, jnp.float32)).T
    assert np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9) < 2e-2


@pytest.mark.parametrize("kind", ["q8_0", "nf4"])
def test_non_divisible_out_dim(kind):
    """out_dim 640 (SD2/SDXL 640-ch cross-attn): %128==0 but %256!=0 — the
    n-grid must not floor and leave rows 512..639 unwritten (ADVICE r1)."""
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((640, 512)) * 0.3).astype(np.float32)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    q = prepare_for_kernel(quant.quantize(w, kind))
    leaf = {**q, "codes2d": jnp.asarray(q["codes2d"]), "scales2d": jnp.asarray(q["scales2d"])}
    out = np.asarray(linear_quantized(jnp.asarray(x), leaf))
    ref = x @ np.asarray(quant.dequantize(q, jnp.float32)).T
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, (kind, rel)
    # specifically the tail rows past 512:
    tail = np.abs(ref[:, 512:] - out[:, 512:]).max() / (np.abs(ref).max() + 1e-9)
    assert tail < 2e-2, (kind, tail)
