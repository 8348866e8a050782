"""Fused GroupNorm+SiLU+conv3x3 Pallas kernel (SURVEY §7 step 1).

The UNet/VAE ResBlock hot path is `conv3x3(silu(group_norm(x)))`
(reference backend/nn/unet.py ResBlock in_layers/out_layers; torch runs it
as three kernels). XLA fuses the normalize/scale/SiLU chain into ONE
elementwise pass but cannot fuse that pass into the convolution — the
normalized activation is materialized to HBM and read back. At SDXL level-0
that is an extra 21 MB write + 21 MB read per GroupNorm site, ~7 ms of pure
HBM traffic per denoise step (PERF.md "sampler/norm elementwise").

This kernel removes the materialization: the group statistics are reduced in
one XLA pass (cheap — one read of x), folded into per-channel affine
`a = gamma·rsqrt(var+eps)`, `s = beta − mean·a`, and the Pallas kernel
computes `conv3x3(silu(x·a+s))` reading x exactly once. The conv is an
implicit GEMM: 9 shifted [TH·W, C] × [C, O] MXU dots accumulated in f32,
zero-padding reproduced by zeroed halo rows/cols in VMEM (the normalize/SiLU
affine is applied only to real pixels so the pad stays exactly zero, matching
torch's pad-after-activation semantics).

Dispatch (`eligible`) keeps the kernel to the shapes where it wins and fits:
stride-1 3x3, H a multiple of the row tile, and the full [9,C,O] weight block
resident in VMEM (levels 0/1 of the UNet and the VAE decoder; level 2's
1280x1280 falls back to XLA where the conv is small anyway).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# full [9, C, O] bf16 weight block must fit VMEM next to the activations
_MAX_W_BYTES = 8 * 1024 * 1024
_TH = 8  # rows per grid step: TH·W = 1024 MXU rows at SDXL level 0


def _kernel(a_ref, s_ref, w_ref, b_ref, x_any, o_ref, xn, sem):
    """Grid (B, H/TH). xn: [TH+2, W, C] bf16 halo-row buffer in VMEM.

    Only the H halo is physical (row DMA offsets are on the untiled dim 0);
    the W halo is virtual: per-tap dot results are column-rolled — the conv
    is linear per position, so shifting the INPUT window by one column
    equals shifting the tap's OUTPUT by one column (masked at the borders,
    which also realizes the zero padding exactly)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    w_out = o_ref.shape[2]
    n_h = x_any.shape[1] // th  # static: grid=(B, H//TH)
    first = i == 0
    last = i == n_h - 1

    # --- stage the (clamped) x rows for this tile: rows [i·TH−1, i·TH+TH+1).
    # Branch structure is Python-static where the slice SIZE differs (slice
    # sizes are shape-checked even under pl.when); pl.when only separates
    # same-size cases.
    row0 = i * th

    def dma(src_start, n_rows, dst_start):
        cp = pltpu.make_async_copy(
            x_any.at[b, pl.ds(src_start, n_rows), :, :],
            xn.at[pl.ds(dst_start, n_rows)], sem)
        cp.start()
        cp.wait()

    if n_h == 1:
        dma(0, th, 1)
    else:
        @pl.when(first)
        def _():
            dma(0, th + 1, 1)

        @pl.when(last)
        def _():
            dma(row0 - 1, th + 1, 0)

        @pl.when(jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_not(last)))
        def _():
            dma(row0 - 1, th + 2, 0)

    # --- normalize + SiLU in one VMEM-resident pass (f32 math, bf16 store)
    af = a_ref[b].astype(jnp.float32)
    sf = s_ref[b].astype(jnp.float32)
    v = xn[:].astype(jnp.float32) * af + sf
    xn[:] = (v * jax.nn.sigmoid(v)).astype(xn.dtype)
    # --- H-edge zero padding AFTER the activation (torch pads the activated
    # tensor, so the pad must be exactly 0, not silu(s))
    zero_row = jnp.zeros_like(xn[0])

    @pl.when(first)
    def _():
        xn[0] = zero_row

    @pl.when(last)
    def _():
        xn[th + 1] = zero_row

    # --- implicit GEMM: 3 row windows × 3 column taps, f32 accumulation
    col = jax.lax.broadcasted_iota(jnp.int32, (th, w_out, o_ref.shape[3]), 1)

    def tap(rows, t):
        return jax.lax.dot_general(
            rows, w_ref[t],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((th, w_out, o_ref.shape[3]), jnp.float32)
    for dy in range(3):
        rows = xn[dy:dy + th]
        # out[:, j] += x[:, j−1]·w0 + x[:, j]·w1 + x[:, j+1]·w2
        left = pltpu.roll(tap(rows, dy * 3), shift=1, axis=1)
        acc = acc + jnp.where(col == 0, 0.0, left)
        acc = acc + tap(rows, dy * 3 + 1)
        # pltpu.roll takes non-negative shifts: roll by W−1 ≡ shift −1
        right = pltpu.roll(tap(rows, dy * 3 + 2), shift=w_out - 1, axis=1)
        acc = acc + jnp.where(col == w_out - 1, 0.0, right)
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _row_tile(h: int) -> int:
    for th in (_TH, 4, 2):
        if h % th == 0:
            return th
    return 1


def supported(x_shape, w_shape) -> bool:
    """Hard constraints: stride-1 3x3, lane-aligned C (the halo DMA slices x
    in HBM and Mosaic requires 128-divisible minor-dim slice shapes — C=320
    SDXL level-0 is rejected by the lowering), full [9,C,O] weight block
    VMEM-resident, and a row tile ≥2 dividing H."""
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    _b, h, w, c = x_shape
    o = w_shape[3]
    if o < 128 or c % 128 != 0 or w < 8:
        return False
    if 9 * c * o * 2 > _MAX_W_BYTES:
        return False
    return h % _row_tile(h) == 0 and _row_tile(h) >= 2


def eligible(x_shape, w_shape) -> bool:
    """supported() AND worth it: measured dispatch boundary (v5e kernel
    microbench 2026-08): the kernel wins only where the conv is
    HBM-traffic-bound — 1024²·128: 1.58×, 256²·512: 1.07×, 64²·640: 0.73×
    (FLOP-bound; XLA's conv is better). In practice: the VAE decoder."""
    if not supported(x_shape, w_shape):
        return False
    _b, h, w, _c = x_shape
    return h * w >= 65536


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused(a, s, w9, bias, x, interpret=False):
    b, h, wd, c = x.shape
    o = w9.shape[2]
    th = _row_tile(h)
    grid = (b, h // th)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # full [B,C] blocks: Mosaic requires the last two block dims to
            # divide (8,128) or equal the array dims — row-select in-kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, wd, o), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wd, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wd * c * o,
            bytes_accessed=(b * h * wd * c + b * h * wd * o) * 2 + 9 * c * o * 2,
            transcendentals=b * h * wd * c,
        ),
        interpret=interpret,
    )(a, s, w9, bias, x)


def gn_silu_conv3x3(
    x: jax.Array,
    gn_p: Mapping[str, Any],
    conv_p: Mapping[str, Any],
    num_groups: int = 32,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """conv3x3(silu(group_norm(x))), padding 1 — fused when eligible.

    Matches nn.group_norm(act="silu") + nn.conv2d(padding=1) numerically up
    to f32-accumulated bf16 dot ordering."""
    from . import nn as _nn

    w = conv_p["weight"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
        use_kernel = eligible(x.shape, w.shape) and not interpret
    else:  # explicit interpret=True: force the kernel body (CPU tests),
        use_kernel = supported(x.shape, w.shape)  # perf boundary bypassed
    if not use_kernel:
        h = _nn.group_norm(x, gn_p, num_groups=num_groups, eps=eps, act="silu")
        return _nn.conv2d(h, conv_p, padding=1)

    # one-pass group statistics (XLA), folded to per-channel affine
    b, hh, ww, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, hh * ww, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))                       # [B, G]
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(1, 3))
                      - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)     # [B, C]
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=1)
    gamma = gn_p["weight"].astype(jnp.float32)[None]
    beta = gn_p["bias"].astype(jnp.float32)[None]
    a = gamma * rstd_c
    s = beta - mean_c * a

    w9 = w.astype(x.dtype).reshape(9, c, w.shape[3])
    bias = conv_p.get("bias")
    bias = (jnp.zeros((1, w.shape[3]), jnp.float32) if bias is None
            else bias.astype(jnp.float32).reshape(1, -1))
    return _fused(a, s, w9, bias, x, interpret=bool(interpret))
