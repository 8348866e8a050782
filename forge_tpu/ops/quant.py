"""Low-bit weight quantization: NF4 (bitsandbytes layout) and GGUF blocks.

The TPU re-expression of the reference's quantized-weight stack
(backend/operations_bnb.py NF4/FP4 via bitsandbytes CUDA kernels,
backend/operations_gguf.py + vendored gguf numpy dequant): block-quantized
weights live in HBM as (packed codes + per-block scales); dequantization is
a JAX function the XLA scheduler fuses ahead of the consuming matmul.

Quantized leaves in a param tree are dicts:
    {"kind": "nf4"|"q8_0"|"q4_0", "codes": uint8[...], "scales": ...,
     "shape": (out, in)}
ops/nn.linear detects them and dequantizes on the fly (the reference's
"online" path for quantized weights, operations.py:355-438).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NF4 codebook (QLoRA paper, information-theoretically optimal for N(0,1))
NF4_CODE = np.asarray(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

NF4_BLOCK = 64
GGUF_BLOCK = 32


class QuantTensor:
    """Pytree-registered quantized weight: codes/scales are traced children,
    (kind, shape) are static aux data — so quantized param trees flow through
    jit/donation/sharding like ordinary arrays. Dict-style access keeps the
    producer API (quantize() returns plain dicts) interchangeable.

    lora_down/lora_up/lora_dense carry ONLINE LoRA terms (the reference's
    in-forward merge for quantized weights, backend/operations.py:16-53):
    the weight stays packed and the forward adds x·downᵀ·upᵀ (+ x·denseᵀ)."""

    _FIELDS = ("codes", "scales", "codes2d", "scales2d",
               "lora_down", "lora_up", "lora_dense", "mins", "mins2d")

    def __init__(self, kind, shape, codes, scales, codes2d=None, scales2d=None,
                 lora_down=None, lora_up=None, lora_dense=None,
                 mins=None, mins2d=None, block=None):
        self.kind = kind
        self.shape = tuple(shape)
        self.codes = codes
        self.scales = scales
        self.codes2d = codes2d
        self.scales2d = scales2d
        self.lora_down = lora_down
        self.lora_up = lora_up
        self.lora_dense = lora_dense
        self.mins = mins      # asymmetric kinds (gq4/gq8): value = s·c − m
        self.mins2d = mins2d
        self.block = block    # group size for gq4/gq8 (K-quants use 16 or 32)

    def __getitem__(self, key):
        val = getattr(self, key)
        if val is None:
            raise KeyError(key)
        return val

    def __contains__(self, key):
        return getattr(self, key, None) is not None

    def get(self, key, default=None):
        return getattr(self, key, default)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "QuantTensor":
        return QuantTensor(d["kind"], d["shape"], d["codes"], d["scales"],
                           d.get("codes2d"), d.get("scales2d"),
                           d.get("lora_down"), d.get("lora_up"),
                           d.get("lora_dense"), d.get("mins"),
                           d.get("mins2d"), d.get("block"))


def _qt_flatten(qt: QuantTensor):
    children = tuple(getattr(qt, f) for f in QuantTensor._FIELDS)
    return children, (qt.kind, qt.shape, qt.block)


def _qt_unflatten(aux, children):
    kind, shape, block = aux
    return QuantTensor(kind, shape, *children, block=block)


jax.tree_util.register_pytree_node(QuantTensor, _qt_flatten, _qt_unflatten)


def is_quantized(leaf: Any) -> bool:
    if isinstance(leaf, QuantTensor):
        return True
    return isinstance(leaf, Mapping) and "kind" in leaf and "codes" in leaf


def lora_epilogue(y, x2, qleaf) -> Any:
    """Add the online-LoRA terms of a quantized leaf to a matmul result.

    y: [M, out] (the dequant-matmul result), x2: [M, in]. Low-rank terms run
    as two skinny matmuls (rank ≪ in/out, cost is negligible next to the main
    matmul); dense terms (loha/lokr/glora/DoRA merges) as one extra matmul.
    Reference: backend/operations.py:16-53 online weight compose."""
    down = qleaf.get("lora_down")
    if down is not None:
        up = qleaf["lora_up"]
        t = jnp.matmul(x2, down.astype(x2.dtype).T)
        y = y + jnp.matmul(t, up.astype(x2.dtype).T).astype(y.dtype)
    dense = qleaf.get("lora_dense")
    if dense is not None:
        y = y + jnp.matmul(x2, dense.astype(x2.dtype).T).astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# NF4


def quantize_nf4(w: np.ndarray, block: int = NF4_BLOCK) -> Dict[str, Any]:
    """fp weight [out, in] → NF4 blocks (absmax-scaled nearest-code)."""
    shape = w.shape
    flat = np.asarray(w, np.float32).reshape(-1)
    pad = (-len(flat)) % block
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, block)
    mids = (NF4_CODE[:-1] + NF4_CODE[1:]) * 0.5
    if not flat.any():
        # All-zero weights (synthetic benchmark checkpoints): the generic
        # path streams ~4 bytes/param through the host core; emit the
        # (deterministic) result directly. absmax=0 → normed=0 → one code.
        z = np.uint8(np.searchsorted(mids, np.float32(0.0), side="left"))
        packed = np.full((len(blocks), block // 2), (z << 4) | z, np.uint8)
        return {"kind": "nf4", "codes": packed.reshape(-1),
                "scales": np.zeros(len(blocks), np.float32),
                "shape": tuple(shape)}
    absmax = np.abs(blocks).max(axis=1)
    absmax_safe = np.where(absmax == 0, 1.0, absmax)
    normed = blocks / absmax_safe[:, None]
    # nearest code via searchsorted over midpoints (table is sorted): same
    # result as argmin over |normed - code| with 16x less memory traffic —
    # matters when quantizing a 12B-param Flux on the 1-core host
    idx = np.searchsorted(mids, normed, side="left").astype(np.uint8)
    packed = (idx[:, 0::2] << 4) | idx[:, 1::2]
    return {
        "kind": "nf4",
        "codes": packed.reshape(-1),  # uint8 [n/2]
        "scales": absmax.astype(np.float32),
        "shape": tuple(shape),
    }


def dequantize_nf4(q: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    codes = jnp.asarray(q["codes"])
    hi = (codes >> 4).astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-1).reshape(-1, NF4_BLOCK)
    table = jnp.asarray(NF4_CODE)
    vals = table[idx] * jnp.asarray(q["scales"])[:, None]
    n = int(np.prod(q["shape"]))
    return vals.reshape(-1)[:n].reshape(q["shape"]).astype(dtype)


# ---------------------------------------------------------------------------
# GGUF Q8_0 / Q4_0 (block 32, f16 scale)


def quantize_q8_0(w: np.ndarray) -> Dict[str, Any]:
    shape = w.shape
    flat = np.asarray(w, np.float32).reshape(-1)
    pad = (-len(flat)) % GGUF_BLOCK
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, GGUF_BLOCK)
    if not flat.any():  # see quantize_nf4: deterministic all-zero shortcut
        return {"kind": "q8_0", "codes": np.zeros(blocks.size, np.int8),
                "scales": np.zeros(len(blocks), np.float16),
                "shape": tuple(shape)}
    scale = np.abs(blocks).max(axis=1) / 127.0
    scale_safe = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(blocks / scale_safe[:, None]), -128, 127).astype(np.int8)
    return {"kind": "q8_0", "codes": q.reshape(-1), "scales": scale.astype(np.float16),
            "shape": tuple(shape)}


def dequantize_q8_0(q: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    codes = jnp.asarray(q["codes"]).reshape(-1, GGUF_BLOCK).astype(jnp.float32)
    vals = codes * jnp.asarray(q["scales"], jnp.float32)[:, None]
    n = int(np.prod(q["shape"]))
    return vals.reshape(-1)[:n].reshape(q["shape"]).astype(dtype)


def quantize_q4_0(w: np.ndarray) -> Dict[str, Any]:
    shape = w.shape
    flat = np.asarray(w, np.float32).reshape(-1)
    pad = (-len(flat)) % GGUF_BLOCK
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, GGUF_BLOCK)
    if not flat.any():  # scale=0 → q=clip(8.5)=8 → packed byte 0x88
        return {"kind": "q4_0",
                "codes": np.full(blocks.size // 2, 0x88, np.uint8),
                "scales": np.zeros(len(blocks), np.float16),
                "shape": tuple(shape)}
    amax_idx = np.abs(blocks).argmax(axis=1)
    amax = blocks[np.arange(len(blocks)), amax_idx]  # signed max (gguf convention)
    scale = amax / -8.0
    scale_safe = np.where(scale == 0, 1.0, scale)
    q = np.clip((blocks / scale_safe[:, None]) + 8.5, 0, 15).astype(np.uint8)
    packed = q[:, :16] | (q[:, 16:] << 4)
    return {"kind": "q4_0", "codes": packed.reshape(-1), "scales": scale.astype(np.float16),
            "shape": tuple(shape)}


def dequantize_q4_0(q: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    packed = jnp.asarray(q["codes"]).reshape(-1, 16)
    lo = (packed & 0xF).astype(jnp.float32) - 8.0
    hi = (packed >> 4).astype(jnp.float32) - 8.0
    blocks = jnp.concatenate([lo, hi], axis=1)  # [nblocks, 32]
    vals = blocks * jnp.asarray(q["scales"], jnp.float32)[:, None]
    n = int(np.prod(q["shape"]))
    return vals.reshape(-1)[:n].reshape(q["shape"]).astype(dtype)


# -- generalized asymmetric group quantization (gq4 / gq8) -------------------
# value = scales[g]·code − mins[g], group size = leaf["block"] (16 or 32).
# The normal form every GGUF K-quant (Q2_K…Q6_K) and two-parameter block
# format (Q4_1/Q5_0/Q5_1) reduces to after unpacking its super-block scales
# (packages_3rdparty/gguf/quants.py:624-780 block layouts). gq4 packs two
# 4-bit codes per byte (hi nibble = even element); gq8 stores int8 codes.


def quantize_gq4(w: np.ndarray, block: int = 32) -> Dict[str, Any]:
    """Asymmetric 4-bit min/max quantization (test/utility producer)."""
    shape = w.shape
    g = np.asarray(w, np.float32).reshape(-1, block)
    lo, hi = g.min(axis=1), g.max(axis=1)
    scale = np.where(hi > lo, (hi - lo) / 15.0, 1.0)
    q = np.clip(np.round((g - lo[:, None]) / scale[:, None]), 0, 15).astype(np.uint8)
    flat = q.reshape(-1)
    packed = (flat[0::2] << 4) | flat[1::2]
    return {"kind": "gq4", "codes": packed, "scales": scale.astype(np.float16),
            "mins": (-lo).astype(np.float16), "shape": tuple(shape), "block": block}


def dequantize_gq4(q: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    packed = jnp.asarray(q["codes"])
    flat = jnp.stack([(packed >> 4) & 0xF, packed & 0xF], axis=-1).reshape(-1)
    block = q.get("block") or 32
    g = flat.reshape(-1, block).astype(jnp.float32)
    vals = g * jnp.asarray(q["scales"], jnp.float32)[:, None] \
        - jnp.asarray(q["mins"], jnp.float32)[:, None]
    n = int(np.prod(q["shape"]))
    return vals.reshape(-1)[:n].reshape(q["shape"]).astype(dtype)


def quantize_gq8(w: np.ndarray, block: int = 32) -> Dict[str, Any]:
    """Asymmetric 8-bit, full 0..255 range: unsigned codes u∈[0,255] are
    stored shifted as int8 codes c=u−128 so the fused kernel's int8 bitcast
    stays valid; the +128·scale shift is folded into the stored min term
    (dequant = c·scale − mins with mins = −lo − 128·scale)."""
    shape = w.shape
    g = np.asarray(w, np.float32).reshape(-1, block)
    lo, hi = g.min(axis=1), g.max(axis=1)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    u = np.clip(np.round((g - lo[:, None]) / scale[:, None]), 0, 255)
    q = (u - 128).astype(np.int8)
    return {"kind": "gq8", "codes": q.reshape(-1), "scales": scale.astype(np.float16),
            "mins": (-lo - 128.0 * scale).astype(np.float16), "shape": tuple(shape), "block": block}


def dequantize_gq8(q: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    block = q.get("block") or 32
    g = jnp.asarray(q["codes"], jnp.int8).reshape(-1, block).astype(jnp.float32)
    vals = g * jnp.asarray(q["scales"], jnp.float32)[:, None] \
        - jnp.asarray(q["mins"], jnp.float32)[:, None]
    n = int(np.prod(q["shape"]))
    return vals.reshape(-1)[:n].reshape(q["shape"]).astype(dtype)


_DEQUANT = {"nf4": dequantize_nf4, "q8_0": dequantize_q8_0, "q4_0": dequantize_q4_0,
            "gq4": dequantize_gq4, "gq8": dequantize_gq8}
_QUANT = {"nf4": quantize_nf4, "q8_0": quantize_q8_0, "q4_0": quantize_q4_0,
          "gq4": quantize_gq4, "gq8": quantize_gq8}


def dequantize(leaf: Mapping[str, Any], dtype=jnp.bfloat16) -> jax.Array:
    return _DEQUANT[leaf["kind"]](leaf, dtype)


def quantize(w: np.ndarray, kind: str) -> Dict[str, Any]:
    return _QUANT[kind](w)


def quantize_tree(params: Dict[str, Any], kind: str, min_size: int = 1 << 16,
                  skip_substrings: Tuple[str, ...] = ("norm", "emb", "bias")) -> Dict[str, Any]:
    """Quantize all large 2D weights of a param tree (host-side, numpy).
    Norms/embeddings/biases stay full precision like the reference's loaders.
    """
    from ..core.tree import map_leaves

    def visit(path, leaf):
        if is_quantized(leaf):
            return leaf
        arr = np.asarray(leaf)
        if arr.ndim != 2 or arr.size < min_size:
            return leaf
        if any(s in path for s in skip_substrings):
            return leaf
        return quantize(arr, kind)

    return map_leaves(visit, params)


def _put(a, dtype=None):
    """jnp.asarray with a constant-fill fast path (no host transfer for
    constant buffers — e.g. quantized zero-filled synthetic weights)."""
    from ..core.state_dict import constant_value

    a = np.asarray(a, dtype) if dtype is not None else np.asarray(a)
    c = constant_value(a)
    if c is not None:
        return jnp.full(a.shape, c.item(), a.dtype)
    return jnp.asarray(a)


def leaf_to_device(q: Mapping[str, Any]) -> "QuantTensor":
    """Quant leaf dict (optionally kernel-prepared) → device QuantTensor.
    Keeps only the kernel layout when present (no duplicate flat copy)."""
    has2d = q.get("codes2d") is not None
    mins = q.get("mins")
    mins2d = q.get("mins2d")
    return QuantTensor(
        q["kind"], q["shape"],
        None if has2d else _put(q["codes"]),
        None if has2d else _put(q["scales"], np.float32),
        _put(q["codes2d"]) if has2d else None,
        _put(q["scales2d"], np.float32) if has2d else None,
        mins=(_put(mins, np.float32)
              if mins is not None and not has2d else None),
        mins2d=(_put(mins2d, np.float32)
                if mins2d is not None and has2d else None),
        block=q.get("block"),
    )


def to_device(qleaf: Mapping[str, Any]) -> Dict[str, Any]:
    out = {
        "kind": qleaf["kind"],
        "codes": jnp.asarray(qleaf["codes"]),
        "scales": jnp.asarray(qleaf["scales"]),
        "shape": tuple(qleaf["shape"]),
    }
    if qleaf.get("mins") is not None:
        out["mins"] = jnp.asarray(qleaf["mins"])
    if qleaf.get("block") is not None:
        out["block"] = qleaf["block"]
    return out
