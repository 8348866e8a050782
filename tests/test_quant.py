"""Quantization tests: NF4/Q8_0/Q4_0 round trips, linear-with-quant-weight
equivalence, tree quantization policy."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.ops import nn, quant


# measured on N(0, 0.5) weights: nf4 ≈ 0.092σ, q8_0 ≈ 0.0054σ, q4_0 ≈ 0.086σ —
# in line with published block-quant error for these formats
@pytest.mark.parametrize("kind,rms_tol", [("nf4", 0.12), ("q8_0", 0.008), ("q4_0", 0.12)])
def test_roundtrip_error(kind, rms_tol):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((128, 256)) * 0.5).astype(np.float32)
    q = quant.quantize(w, kind)
    deq = np.asarray(quant.dequantize(q, jnp.float32))
    sigma = w.std()
    rms = np.sqrt(np.mean((deq - w) ** 2)) / sigma
    assert rms < rms_tol, f"{kind}: rms err {rms}"
    # storage actually shrinks
    packed_bytes = q["codes"].nbytes + q["scales"].nbytes
    assert packed_bytes < w.nbytes * 0.6


def test_exact_zero_blocks():
    w = np.zeros((64, 64), np.float32)
    for kind in ("nf4", "q8_0", "q4_0"):
        deq = np.asarray(quant.dequantize(quant.quantize(w, kind), jnp.float32))
        assert np.allclose(deq, 0)


def test_linear_with_quant_weight():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((64, 128)) * 0.3).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal((2, 128)).astype(np.float32)

    full = np.asarray(nn.linear(jnp.asarray(x), {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}))
    q = quant.to_device(quant.quantize(w, "q8_0"))
    qout = np.asarray(nn.linear(jnp.asarray(x), {"weight": q, "bias": jnp.asarray(b)}))
    denom = np.abs(full).max() + 1e-6
    assert np.abs(full - qout).max() / denom < 0.02


def test_quantize_tree_policy():
    tree = {
        "attn": {"to_q": {"weight": np.ones((512, 512), np.float32)}},
        "norm1": {"weight": np.ones((512,), np.float32)},
        "small": {"weight": np.ones((8, 8), np.float32)},
    }
    out = quant.quantize_tree(tree, "nf4", min_size=1024)
    assert quant.is_quantized(out["attn"]["to_q"]["weight"])
    assert not quant.is_quantized(out["norm1"]["weight"])
    assert not quant.is_quantized(out["small"]["weight"])
