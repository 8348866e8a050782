"""Prequantized bitsandbytes checkpoint parsing (core/state_dict.py
collapse_bnb_quant): the serialized-QuantState key scheme used by
flux1-dev-bnb-nf4-style checkpoints folds into fused-kernel quant leaves."""

import json

import numpy as np

import jax.numpy as jnp

from forge_tpu.core.state_dict import collapse_bnb_quant
from forge_tpu.ops.quant import NF4_CODE, dequantize_nf4, quantize_nf4

FP4_CODE = np.asarray([0.0, 0.0052, 0.6667, 1.0, 0.3333, 0.5, 0.1667, 0.25,
                       0.0, -0.0052, -0.6667, -1.0, -0.3333, -0.5, -0.1667,
                       -0.25], np.float32)


def serialize_bnb(key, w, double_quant=False, qtype="nf4"):
    q = quantize_nf4(w)
    sd = {key: np.asarray(q["codes"]).reshape(-1, 1)}
    meta = {"blocksize": 64, "quant_type": qtype, "shape": list(w.shape),
            "dtype": "bfloat16"}
    absmax = np.asarray(q["scales"], np.float32)
    if double_quant:
        nbs = 256
        offset = float(absmax.mean())
        centered = absmax - offset
        pad = (-centered.size) % nbs
        blocks = np.concatenate([centered, np.zeros(pad, np.float32)]).reshape(-1, nbs)
        nab = np.abs(blocks).max(axis=1)
        nab = np.where(nab == 0, 1.0, nab)
        nmap = np.linspace(-1, 1, 256).astype(np.float32)
        codes8 = np.abs((blocks / nab[:, None])[..., None] - nmap).argmin(-1).astype(np.uint8)
        sd[key + ".absmax"] = codes8.reshape(-1)[: centered.size]
        sd[key + ".nested_absmax"] = nab.astype(np.float32)
        sd[key + ".nested_quant_map"] = nmap
        meta["nested_blocksize"] = nbs
        meta["nested_offset"] = offset
    else:
        sd[key + ".absmax"] = absmax
    sd[key + ".quant_map"] = (NF4_CODE if qtype == "nf4" else FP4_CODE).astype(np.float32)
    sd[key + f".quant_state.bitsandbytes__{qtype}"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8).copy()
    return sd


def test_collapse_plain_nf4_exact():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    sd = serialize_bnb("lin.weight", w)
    sd["lin.bias"] = np.zeros(32, np.float32)
    out = collapse_bnb_quant(sd)
    leaf = out["lin.weight"]
    assert leaf["kind"] == "nf4" and leaf["shape"] == (32, 128)
    ref = quantize_nf4(w)
    assert np.array_equal(np.asarray(leaf["codes"]), np.asarray(ref["codes"]))
    assert np.allclose(leaf["scales"], ref["scales"])
    # round-trip through the shared dequantizer hits NF4 error, not more
    deq = np.asarray(dequantize_nf4(leaf, jnp.float32))
    assert np.abs(deq - w).max() < 0.6
    assert "lin.weight.absmax" not in out and "lin.bias" in out


def test_collapse_double_quant():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 256)).astype(np.float32)
    sd = serialize_bnb("l.weight", w, double_quant=True)
    out = collapse_bnb_quant(sd)
    leaf = out["l.weight"]
    assert leaf["kind"] == "nf4"
    deq = np.asarray(dequantize_nf4(leaf, jnp.float32))
    # NF4 error + 8-bit absmax error
    assert np.abs(deq - w).max() < 0.7
    ref = quantize_nf4(w)
    assert np.allclose(leaf["scales"], ref["scales"], atol=0.05)


def test_collapse_fp4_dequantizes_at_load():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((8, 128)).astype(np.float32)
    sd = serialize_bnb("l.weight", w, qtype="fp4")
    out = collapse_bnb_quant(sd)
    leaf = out["l.weight"]
    assert isinstance(leaf, np.ndarray) and leaf.shape == (8, 128)
    # codes were chosen against the NF4 table, values decoded with the FP4
    # map — only shape/pipeline sanity is meaningful here
    assert np.isfinite(leaf).all()


def test_linear_on_collapsed_leaf():
    from forge_tpu.ops import nn

    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    leaf = collapse_bnb_quant(serialize_bnb("w.weight", w))["w.weight"]
    y = np.asarray(nn.linear(jnp.asarray(x), {"weight": leaf}))
    ref = x @ np.asarray(dequantize_nf4(leaf, jnp.float32)).T
    assert np.abs(y - ref).max() < 0.5  # bf16 matmul tolerance
