"""GGUF container round-trip: write a tiny v3 file, read it back, check
tensors and quant leaves."""

import struct

import numpy as np

from forge_tpu.core.gguf import load_gguf
from forge_tpu.ops import quant
import jax.numpy as jnp


def _write_str(f, s):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _make_gguf(path, tensors, meta=None):
    """tensors: [(name, np_f32_array, ggml_type)] with ggml 0=f32, 8=q8_0."""
    blobs = []
    infos = []
    offset = 0
    align = 32
    for name, arr, ttype in tensors:
        if ttype == 0:
            raw = arr.astype(np.float32).tobytes()
        elif ttype == 8:  # q8_0: per-32 block f16 scale + int8
            q = quant.quantize_q8_0(arr)
            codes = q["codes"].reshape(-1, 32)
            scales = q["scales"].astype(np.float16)
            rec = b"".join(
                scales[i].tobytes() + codes[i].tobytes() for i in range(len(scales))
            )
            raw = rec
        else:
            raise ValueError(ttype)
        infos.append((name, arr.shape, ttype, offset))
        pad = (-len(raw)) % align
        blobs.append(raw + b"\0" * pad)
        offset += len(raw) + pad

    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", len(infos), 1))
        _write_str(f, "general.alignment")
        f.write(struct.pack("<I", 4))  # u32
        f.write(struct.pack("<I", align))
        for name, shape, ttype, off in infos:
            _write_str(f, name)
            dims = tuple(reversed(shape))  # gguf stores innermost-first
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<IQ", ttype, off))
        pos = f.tell()
        f.write(b"\0" * ((-pos) % align))
        for blob in blobs:
            f.write(blob)


def test_gguf_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w_f32 = rng.standard_normal((8, 64)).astype(np.float32)
    w_q8 = (rng.standard_normal((16, 64)) * 0.3).astype(np.float32)
    path = str(tmp_path / "tiny.gguf")
    _make_gguf(path, [("plain.weight", w_f32, 0), ("quant.weight", w_q8, 8)])

    sd = load_gguf(path)
    assert np.allclose(sd["plain.weight"], w_f32)
    q = sd["quant.weight"]
    assert q["kind"] == "q8_0" and q["shape"] == (16, 64)
    deq = np.asarray(quant.dequantize(q, jnp.float32))
    sigma = w_q8.std()
    assert np.sqrt(np.mean((deq - w_q8) ** 2)) / sigma < 0.01


# -- K-quants (Q2_K..Q6_K) + two-parameter blocks (Q4_1/Q5_0/Q5_1) ------------
# Verified against the reference's numpy dequantizers as oracle when the
# reference tree is present (format spec: packages_3rdparty/gguf/quants.py).

import importlib.util
import sys
import types

import pytest


def _load_reference_quants():
    import os

    base = "/root/reference/packages_3rdparty/gguf"
    if not os.path.isdir(base):
        return None
    if "gguf.quants" in sys.modules:
        return sys.modules["gguf.quants"]
    pkg = types.ModuleType("gguf")
    pkg.__path__ = [base]
    # a None __spec__ makes importlib.util.find_spec("gguf") raise in any
    # later test (e.g. transformers probing optional deps) — give it a real one
    pkg.__spec__ = importlib.machinery.ModuleSpec("gguf", None, is_package=True)
    pkg.__spec__.submodule_search_locations = [base]
    sys.modules["gguf"] = pkg
    for mod in ("constants", "lazy", "quick_4bits_ops", "quants"):
        spec = importlib.util.spec_from_file_location(f"gguf.{mod}", f"{base}/{mod}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"gguf.{mod}"] = m
        spec.loader.exec_module(m)
    return sys.modules["gguf.quants"]


_KQ = [  # (name, ggml code, bytes per 256-superblock, scale-byte offsets)
    ("Q2_K", 10, 84, [(80, 84)]),
    ("Q3_K", 11, 110, [(108, 110)]),
    ("Q4_K", 12, 144, [(0, 4)]),
    ("Q5_K", 13, 176, [(0, 4)]),
    ("Q6_K", 14, 210, [(208, 210)]),
]


def _sane_blocks(rng, nb, tsize, scale_ranges):
    """Random block bytes with the f16 scale fields forced to small sane
    values (real checkpoints have |d| ≪ 1; random bytes make inf/1e4)."""
    raw = rng.integers(0, 256, (nb, tsize), dtype=np.uint8)
    for lo, hi in scale_ranges:
        n_half = (hi - lo) // 2
        vals = (rng.uniform(0.001, 0.05, (nb, n_half))).astype(np.float16)
        raw[:, lo:hi] = vals.view(np.uint8)
    return raw


@pytest.mark.parametrize("name,code,tsize,sranges", _KQ)
def test_kquant_dequant_matches_reference(name, code, tsize, sranges):
    quants = _load_reference_quants()
    if quants is None:
        pytest.skip("reference tree not present")
    from forge_tpu.core.gguf import _decode_tensor
    from forge_tpu.ops import quant as Q

    T = sys.modules["gguf.constants"].GGMLQuantizationType
    rng = np.random.default_rng(code)
    nb, n = 4, 4 * 256
    raw = _sane_blocks(rng, nb, tsize, sranges)
    ref = quants.dequantize(raw, T(code)).reshape(-1)
    leaf = _decode_tensor(raw.tobytes(), code, (n,))
    mine = np.asarray(Q.dequantize(leaf, dtype=np.float32)).reshape(-1)
    # composite group scales are stored f16 → ≤2^-11 relative rounding
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(mine - ref).max() <= scale * 2e-3, name


@pytest.mark.parametrize("code,tsize", [(3, 20), (6, 22), (7, 24)])
def test_two_param_blocks_match_reference(code, tsize):
    quants = _load_reference_quants()
    if quants is None:
        pytest.skip("reference tree not present")
    from forge_tpu.core.gguf import _decode_tensor
    from forge_tpu.ops import quant as Q

    T = sys.modules["gguf.constants"].GGMLQuantizationType
    rng = np.random.default_rng(code)
    n = 1024
    data = rng.standard_normal(n).astype(np.float32)
    raw = quants.quantize(data, T(code))
    ref = quants.dequantize(raw, T(code)).reshape(-1)
    leaf = _decode_tensor(raw.tobytes(), code, (n,))
    mine = np.asarray(Q.dequantize(leaf, dtype=np.float32)).reshape(-1)
    assert np.abs(mine - ref).max() < 1e-5


def test_gq_kernel_matches_dequant():
    """Fused asymmetric Pallas kernel (interpret mode) ≡ dequant+matmul."""
    from forge_tpu.ops import quant as Q
    from forge_tpu.ops.dequant_matmul import linear_quantized, prepare_for_kernel

    rng = np.random.default_rng(5)
    for kind, block in (("gq4", 32), ("gq4", 16), ("gq8", 32), ("gq8", 16)):
        w = rng.standard_normal((128, 512)).astype(np.float32)
        leaf = Q.quantize(w, kind) if block == 32 else getattr(Q, f"quantize_{kind}")(w, block=block)
        leaf = prepare_for_kernel(leaf)
        qt = Q.QuantTensor.from_dict(leaf)
        x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
        y_kernel = np.asarray(linear_quantized(x, qt, interpret=True))
        w_deq = np.asarray(Q.dequantize(leaf, jnp.float32))
        y_ref = np.asarray(x) @ w_deq.T
        assert np.allclose(y_kernel, y_ref, atol=5e-2), (kind, block)


def test_gq_roundtrip_accuracy():
    from forge_tpu.ops import quant as Q

    rng = np.random.default_rng(6)
    w = rng.standard_normal((64, 256)).astype(np.float32)
    for kind, tol in (("gq4", 0.25), ("gq8", 0.03)):
        leaf = Q.quantize(w, kind)
        back = np.asarray(Q.dequantize(leaf, jnp.float32))
        err = np.abs(back - w).max()
        assert err < tol, (kind, err)
