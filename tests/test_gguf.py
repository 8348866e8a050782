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
