"""GGUF container reader.

Replaces the reference's vendored gguf package (packages_3rdparty/gguf +
backend/operations_gguf.py) for loading .gguf checkpoints (quantized Flux
etc.). Implements the public GGUF v2/v3 binary layout: magic, metadata KV
table, tensor-info table, aligned data section. Quantized tensors surface as
ops/quant.py leaf dicts (codes + f16 scales) ready for on-the-fly dequant or
the fused Pallas matmul; F32/F16 tensors load as numpy arrays.

Supported ggml tensor types: F32, F16, Q4_0, Q8_0, (Q4_1/Q5_0/Q5_1 read as
dequantized f32 — their extra min/high-bit fields don't fit the 2-field leaf).
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Dict

import numpy as np

_MAGIC = b"GGUF"

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = range(13)

# ggml tensor dtypes
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_BF16 = 30

_BLOCK = 32


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: int):
    if vtype == _T_U8:
        return struct.unpack("<B", f.read(1))[0]
    if vtype == _T_I8:
        return struct.unpack("<b", f.read(1))[0]
    if vtype == _T_U16:
        return struct.unpack("<H", f.read(2))[0]
    if vtype == _T_I16:
        return struct.unpack("<h", f.read(2))[0]
    if vtype == _T_U32:
        return struct.unpack("<I", f.read(4))[0]
    if vtype == _T_I32:
        return struct.unpack("<i", f.read(4))[0]
    if vtype == _T_F32:
        return struct.unpack("<f", f.read(4))[0]
    if vtype == _T_BOOL:
        return bool(f.read(1)[0])
    if vtype == _T_STR:
        return _read_str(f)
    if vtype == _T_ARR:
        (atype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, atype) for _ in range(n)]
    if vtype == _T_U64:
        return struct.unpack("<Q", f.read(8))[0]
    if vtype == _T_I64:
        return struct.unpack("<q", f.read(8))[0]
    if vtype == _T_F64:
        return struct.unpack("<d", f.read(8))[0]
    raise ValueError(f"unknown gguf value type {vtype}")


def _tensor_bytes(ggml_type: int, n: int) -> int:
    if ggml_type == GGML_F32:
        return n * 4
    if ggml_type in (GGML_F16, GGML_BF16):
        return n * 2
    blocks = n // _BLOCK
    return {
        GGML_Q4_0: blocks * 18,
        GGML_Q4_1: blocks * 20,
        GGML_Q5_0: blocks * 22,
        GGML_Q5_1: blocks * 24,
        GGML_Q8_0: blocks * 34,
    }[ggml_type]


def _decode_tensor(raw: bytes, ggml_type: int, shape) -> Any:
    n = int(np.prod(shape))
    if ggml_type == GGML_F32:
        return np.frombuffer(raw, np.float32).reshape(shape)
    if ggml_type == GGML_F16:
        return np.frombuffer(raw, np.float16).astype(np.float32).reshape(shape)
    if ggml_type == GGML_BF16:
        u16 = np.frombuffer(raw, np.uint16)
        return (u16.astype(np.uint32) << 16).view(np.float32).reshape(shape)
    blocks = n // _BLOCK
    if ggml_type == GGML_Q8_0:
        rec = np.frombuffer(raw, dtype=np.dtype([("scale", "<f2"), ("q", "i1", (32,))]))
        return {"kind": "q8_0", "codes": rec["q"].reshape(-1).copy(),
                "scales": rec["scale"].copy(), "shape": tuple(shape)}
    if ggml_type == GGML_Q4_0:
        rec = np.frombuffer(raw, dtype=np.dtype([("scale", "<f2"), ("q", "u1", (16,))]))
        return {"kind": "q4_0", "codes": rec["q"].reshape(-1).copy(),
                "scales": rec["scale"].copy(), "shape": tuple(shape)}
    # Q4_1/Q5_x: dequantize to f32 at load (two-parameter blocks)
    if ggml_type == GGML_Q4_1:
        rec = np.frombuffer(raw, dtype=np.dtype([("d", "<f2"), ("m", "<f2"), ("q", "u1", (16,))]))
        lo = (rec["q"] & 0xF).astype(np.float32)
        hi = (rec["q"] >> 4).astype(np.float32)
        vals = np.concatenate([lo, hi], axis=1)
        out = vals * rec["d"].astype(np.float32)[:, None] + rec["m"].astype(np.float32)[:, None]
        return out.reshape(shape)
    if ggml_type in (GGML_Q5_0, GGML_Q5_1):
        has_min = ggml_type == GGML_Q5_1
        fields = [("d", "<f2")] + ([("m", "<f2")] if has_min else []) + [("qh", "<u4"), ("q", "u1", (16,))]
        rec = np.frombuffer(raw, dtype=np.dtype(fields))
        lo = (rec["q"] & 0xF).astype(np.uint16)
        hi = (rec["q"] >> 4).astype(np.uint16)
        vals = np.concatenate([lo, hi], axis=1)  # [blocks, 32] low 4 bits
        qh = rec["qh"]
        bits = ((qh[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1).astype(np.uint16)
        vals = vals | (bits << 4)
        d = rec["d"].astype(np.float32)[:, None]
        if has_min:
            out = vals.astype(np.float32) * d + rec["m"].astype(np.float32)[:, None]
        else:
            out = (vals.astype(np.float32) - 16.0) * d
        return out.reshape(shape)
    raise ValueError(f"unsupported ggml tensor type {ggml_type}")


def load_gguf(path: str) -> Dict[str, Any]:
    """→ flat {name: np.ndarray | quant leaf dict} plus '__metadata__'."""
    out: Dict[str, Any] = {}
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError("not a GGUF file")
        (version,) = struct.unpack("<I", f.read(4))
        if version < 2:
            raise ValueError(f"unsupported GGUF version {version}")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))

        meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)

        infos = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (nd,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            # gguf dims are innermost-first; numpy wants outermost-first
            shape = tuple(reversed(dims))
            infos.append((name, shape, ttype, offset))

        align = int(meta.get("general.alignment", 32))
        data_start = f.tell()
        data_start += (-data_start) % align

        for name, shape, ttype, offset in infos:
            f.seek(data_start + offset)
            raw = f.read(_tensor_bytes(ttype, int(np.prod(shape))))
            out[name] = _decode_tensor(raw, ttype, shape)

    out["__metadata__"] = meta
    return out
