"""Fused dequantize→matmul Pallas kernel for block-quantized weights.

The TPU counterpart of bitsandbytes' fused CUDA kernels
(reference backend/operations_bnb.py / operations_gguf.py): weights stay
packed in HBM (uint8 codes + per-block scales); each grid step DMAs one
weight tile into VMEM, expands it to bf16 *in VMEM*, and feeds the MXU —
the full-precision weight never exists in HBM, halving (Q8) or quartering
(NF4/Q4) the weight bandwidth per matmul.

Layout contract (matches ops/quant.py): weights are [out, in] row-major,
blocks of 32/64 run along flattened rows, `in` is a multiple of 512. Codes
are repacked host-side into the kernel's half-pack layout: within each
512-column group, byte j carries source column j in its hi nibble and
column j+256 in its lo nibble — so the kernel reconstitutes source order
with one lane-concat (Mosaic supports no 2D→3D shape casts or lane
interleaves). Scales reshape to [out, in/block].
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import GGUF_BLOCK, NF4_BLOCK, NF4_CODE

PACK_GROUP = 512  # source columns per packed group (== 4-bit kernel tile_k)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _leaf_block(q) -> int:
    if q.get("block"):
        return int(q["block"])
    return NF4_BLOCK if q["kind"] == "nf4" else GGUF_BLOCK


def prepare_for_kernel(q: Mapping[str, Any]) -> Mapping[str, Any]:
    """Repack a quant leaf's codes/scales into the kernel tile layout.
    Returns a new leaf dict with `codes2d`/`scales2d`; call once at load."""
    out_dim, in_dim = q["shape"]
    kind = q["kind"]
    block = _leaf_block(q)
    if in_dim % PACK_GROUP != 0:
        return dict(q)  # fallback path dequantizes via quant.dequantize
    codes = np.asarray(q["codes"])
    scales = np.asarray(q["scales"], np.float32)
    if kind == "gq4":
        # unpack (hi = even element) then half-pack per 512 group
        idx = np.empty((out_dim, in_dim), np.uint8)
        packed = codes.reshape(out_dim, in_dim // 2)
        idx[:, 0::2] = packed >> 4
        idx[:, 1::2] = packed & 0xF
        grp = idx.reshape(out_dim, in_dim // PACK_GROUP, 2, PACK_GROUP // 2)
        codes2d = ((grp[:, :, 0] << 4) | grp[:, :, 1]).reshape(out_dim, in_dim // 2)
        out = dict(q)
        out["codes2d"] = codes2d
        out["scales2d"] = scales.reshape(out_dim, in_dim // block)
        out["mins2d"] = np.asarray(q["mins"], np.float32).reshape(out_dim, in_dim // block)
        return out
    if kind == "gq8":
        out = dict(q)
        out["codes2d"] = codes.reshape(out_dim, in_dim).view(np.uint8)
        out["scales2d"] = scales.reshape(out_dim, in_dim // block)
        out["mins2d"] = np.asarray(q["mins"], np.float32).reshape(out_dim, in_dim // block)
        return out
    if kind in ("nf4", "q4_0"):
        # unpack original (pair-interleaved) nibbles to per-column indices
        packed = codes.reshape(out_dim, in_dim // 2)
        if kind == "nf4":
            idx = np.empty((out_dim, in_dim), np.uint8)
            idx[:, 0::2] = packed >> 4
            idx[:, 1::2] = packed & 0xF
        else:  # q4_0 packs (first16 | last16) per 32-block
            blk = packed.reshape(out_dim, -1, 16)
            idx = np.empty((out_dim, in_dim // 32, 32), np.uint8)
            idx[:, :, :16] = blk & 0xF
            idx[:, :, 16:] = blk >> 4
            idx = idx.reshape(out_dim, in_dim)
        # half-pack per 512 group: hi nibble = col j, lo = col j+256
        grp = idx.reshape(out_dim, in_dim // PACK_GROUP, 2, PACK_GROUP // 2)
        codes2d = ((grp[:, :, 0] << 4) | grp[:, :, 1]).reshape(out_dim, in_dim // 2)
    else:
        codes2d = codes.reshape(out_dim, in_dim).view(np.uint8)
    scales2d = scales.reshape(out_dim, in_dim // block)
    out = dict(q)
    out["codes2d"] = codes2d
    out["scales2d"] = scales2d
    return out


def _expand_scales(scales, tn, tk, block):
    """[TN, TK/block] → [TN, TK] via lane-broadcast + concat (Mosaic has no
    2D→3D shape cast; broadcast-from-1-lane and lane-concat both lower)."""
    pieces = [
        jnp.broadcast_to(scales[:, b : b + 1], (tn, block))
        for b in range(tk // block)
    ]
    return jnp.concatenate(pieces, axis=1)


def _kernel_q8(x_ref, codes_ref, scalesT_ref, o_ref, acc_ref, *, block):
    """grid (m, n, k): acc += x[m,k] @ dequant(w[n,k]).T. Scales arrive
    TRANSPOSED ([k/block, n] tiles are lane-legal where [n, k/block] is not)
    and are transposed back in VMEM."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    codes = codes_ref[...]  # [TN, TK] uint8 (int8 payload)
    w = pltpu.bitcast(codes, jnp.int8).astype(jnp.float32)
    tn, tk = codes.shape
    scales = scalesT_ref[...].T  # [TK/block, TN] → [TN, TK/block]
    w = w * _expand_scales(scales, tn, tk, block)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _out():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_4bit(x_ref, codes_ref, scalesT_ref, o_ref, acc_ref, *, block, table):
    """grid (m, n, k) with TK == PACK_GROUP (half-pack layout: within the
    group, hi nibbles are source cols [0,256), lo are [256,512))."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = codes_ref[...]  # [TN, PACK_GROUP/2] u8
    tn = packed.shape[0]
    p32 = packed.astype(jnp.int32)  # u8 shifts don't legalize; widen
    hi = (p32 >> 4).astype(jnp.float32)
    lo = (p32 & 0xF).astype(jnp.float32)
    if table is not None:
        tbl = [float(v) for v in np.asarray(table)]

        def lut(v):
            out = jnp.full_like(v, tbl[0])
            for code in range(1, 16):
                out = jnp.where(v == code, tbl[code], out)
            return out

        hi, lo = lut(hi), lut(lo)
    else:
        hi, lo = hi - 8.0, lo - 8.0
    w = jnp.concatenate([hi, lo], axis=1)  # source order restored
    scales = scalesT_ref[...].T  # [PG/block, TN] → [TN, PG/block]
    w = w * _expand_scales(scales, tn, PACK_GROUP, block)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _out():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_q8_asym(x_ref, codes_ref, scalesT_ref, minsT_ref, o_ref, acc_ref,
                    *, block):
    """gq8: acc += x @ (codes·scale − min).T — the normal form of GGUF
    K-quants with 8-bit-storable codes (Q5_K/Q6_K/Q5_0/Q5_1)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    codes = codes_ref[...]
    w = pltpu.bitcast(codes, jnp.int8).astype(jnp.float32)
    tn, tk = codes.shape
    scales = scalesT_ref[...].T
    mins = minsT_ref[...].T
    w = w * _expand_scales(scales, tn, tk, block) - _expand_scales(mins, tn, tk, block)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _out():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_4bit_asym(x_ref, codes_ref, scalesT_ref, minsT_ref, o_ref, acc_ref,
                      *, block):
    """gq4: half-pack layout like _kernel_4bit, asymmetric dequant
    (Q4_K/Q2_K/Q3_K/Q4_1 after super-block scale unpacking)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = codes_ref[...]
    tn = packed.shape[0]
    p32 = packed.astype(jnp.int32)
    hi = (p32 >> 4).astype(jnp.float32)
    lo = (p32 & 0xF).astype(jnp.float32)
    w = jnp.concatenate([hi, lo], axis=1)
    scales = scalesT_ref[...].T
    mins = minsT_ref[...].T
    w = w * _expand_scales(scales, tn, PACK_GROUP, block) \
        - _expand_scales(mins, tn, PACK_GROUP, block)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _out():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "block", "out_dim", "in_dim", "tile_m", "tile_n", "tile_k", "interpret"),
)
def dequant_matmul(
    x: jax.Array,  # [M, in]
    codes2d: jax.Array,
    scales2d: jax.Array,
    kind: str,
    block: int,
    out_dim: int,
    in_dim: int,
    mins2d: Optional[jax.Array] = None,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m = x.shape[0]
    tile_m = min(tile_m, _round_up(m, 128))
    tile_n = min(tile_n, _round_up(out_dim, 128))
    if out_dim % tile_n != 0:
        # grid n-dim is out_dim//tile_n: a non-dividing tile would floor and
        # leave the tail rows unwritten (e.g. 640-out cross-attn with 256
        # tiles). out_dim%128==0 is guaranteed by linear_quantized's guard.
        tile_n = 128
    four_bit = kind in ("nf4", "q4_0", "gq4")
    tile_k = PACK_GROUP if four_bit else min(tile_k, in_dim)
    m_pad = _round_up(m, tile_m)
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    pack = 2 if four_bit else 1
    grid = (m_pad // tile_m, out_dim // tile_n, in_dim // tile_k)
    scalesT = scales2d.T  # [in/block, out]: lane-legal tiling

    asym = kind in ("gq4", "gq8")
    if kind == "q8_0":
        kernel = functools.partial(_kernel_q8, block=block)
    elif kind == "gq8":
        kernel = functools.partial(_kernel_q8_asym, block=block)
    elif kind == "gq4":
        kernel = functools.partial(_kernel_4bit_asym, block=block)
    else:
        kernel = functools.partial(
            _kernel_4bit, block=block,
            table=NF4_CODE if kind == "nf4" else None,
        )

    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, tile_k // pack), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // block, tile_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    operands = [xp, codes2d, scalesT]
    if asym:
        in_specs.append(pl.BlockSpec((tile_k // block, tile_n),
                                     lambda i, j, k: (k, j), memory_space=pltpu.VMEM))
        operands.append(mins2d.T)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:m]


def linear_quantized(x: jax.Array, qleaf: Mapping[str, Any], bias=None,
                     interpret: bool = False) -> jax.Array:
    """Drop-in for nn.linear on a quantized leaf. Uses the fused kernel when
    the leaf has tile-layout codes and shapes align; falls back to
    dequantize-then-matmul otherwise."""
    out_dim, in_dim = qleaf["shape"]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, in_dim)
    block = _leaf_block(qleaf)
    if (
        "codes2d" in qleaf
        and in_dim % PACK_GROUP == 0
        and out_dim % 128 == 0
    ):
        mins2d = qleaf.get("mins2d")
        y = dequant_matmul(
            x2, jnp.asarray(qleaf["codes2d"]), jnp.asarray(qleaf["scales2d"]),
            kind=qleaf["kind"], block=block, out_dim=out_dim, in_dim=in_dim,
            mins2d=jnp.asarray(mins2d) if mins2d is not None else None,
            interpret=interpret,
        )
    else:
        from . import quant

        w = quant.dequantize(qleaf, x.dtype)
        y = x2 @ w.T
    from .quant import lora_epilogue

    y = lora_epilogue(y, x2, qleaf)  # online LoRA over quantized weights
    y = y.reshape(*lead, out_dim)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
