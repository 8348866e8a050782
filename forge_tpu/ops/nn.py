"""Primitive NN ops over checkpoint-layout parameters.

Parameters keep the exact layout they have in Stable Diffusion checkpoints
(torch conventions): Linear weights are [out, in], conv kernels [O, I, kh, kw]
are transposed to HWIO once at load (see core/state_dict.py). Activations are
NHWC — the TPU-native image layout (channels on the 128-lane axis).

Norm statistics always accumulate in float32 regardless of compute dtype,
mirroring where the reference forces fp32 (GroupNorm/LayerNorm upcasts,
backend/operations.py:149-156 manual-cast semantics).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp


# precision=HIGHEST throughout: exact (single-pass) for bf16 inputs — the
# production TPU path — while keeping f32 inputs at true f32 instead of the
# MXU's default truncate-to-bf16 passes (matters for CPU golden tests).
_PRECISION = jax.lax.Precision.HIGHEST


def linear(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """x [..., in] @ weight [out, in] + bias. Quantized weights (NF4/GGUF
    block dicts, see ops/quant.py) dequantize on the fly — the reference's
    "online" quantized path (backend/operations.py:355-438)."""
    w = p["weight"]
    from .quant import is_quantized

    if is_quantized(w):
        from .dequant_matmul import linear_quantized

        # linear_quantized picks fused-kernel vs dequantize-then-matmul and
        # applies any online-LoRA epilogue terms on the leaf
        return linear_quantized(x, w, bias=p.get("bias"))
    y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype), precision=_PRECISION)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d(
    x: jax.Array,
    p: Mapping[str, Any],
    stride: int = 1,
    padding: int = 0,
    feature_group_count: int = 1,
) -> jax.Array:
    """NHWC conv with HWIO kernel (pre-transposed at load from torch OIHW)."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        precision=_PRECISION,
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d_transpose(
    x: jax.Array,
    p: Mapping[str, Any],
    stride: int = 2,
    padding: int = 0,
    output_padding: int = 0,
) -> jax.Array:
    """NHWC transpose conv matching torch ConvTranspose2d semantics.

    Torch stores the kernel [I, O, kh, kw]; the loader's generic 4-d
    transform yields [kh, kw, O, I], which is exactly the forward-conv HWIO
    kernel `lax.conv_transpose(transpose_kernel=True)` expects (verified vs
    torch in tests/test_upscalers_extra.py). output_padding extends the
    bottom/right edge (torch: out = (H−1)·s − 2p + k + op)."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x, w, strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=_PRECISION,
    )
    if padding or output_padding:
        # torch semantics: crop p from top/left and p−op from bottom/right —
        # the output_padding rows are genuine kernel contributions, not zeros
        lo, hi = padding, padding - output_padding
        end_h = y.shape[1] - hi if hi > 0 else y.shape[1]
        end_w = y.shape[2] - hi if hi > 0 else y.shape[2]
        y = y[:, lo:end_h, lo:end_w]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def group_norm(
    x: jax.Array,
    p: Optional[Mapping[str, Any]] = None,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over NHWC (or [..., C]) with optional fused SiLU.

    The (normalize → scale/shift → SiLU) chain is elementwise after the group
    reduction; XLA fuses it into the producing/consuming HLOs, which is the
    TPU equivalent of the reference's fused GroupNorm+SiLU hot path.
    """
    orig_dtype = x.dtype
    shape = x.shape
    c = shape[-1]
    xf = x.astype(jnp.float32).reshape(*shape[:-1], num_groups, c // num_groups)
    # Reduce over all dims except batch and group: for NHWC that is (H, W, c/g).
    # E[x²]−E[x]² single-pass stats: both reductions fuse into ONE read of x
    # (the (x−mean)² form forces a second HBM pass). f32 accumulators keep
    # the cancellation error ≪ bf16 activation noise.
    axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    m2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(shape)
    if p is not None:
        xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    if act == "silu":
        xf = xf * jax.nn.sigmoid(xf)
    return xf.astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    p: Optional[Mapping[str, Any]] = None,
    eps: float = 1e-5,
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)  # one-pass stats (see group_norm)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None and "weight" in p:
        xf = xf * p["weight"].astype(jnp.float32)
        if "bias" in p and p["bias"] is not None:
            xf = xf + p["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def rms_norm(x: jax.Array, weight: Optional[jax.Array] = None, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    return xf.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) gelu in f32; tanh-approximation in bf16.

    Numerics policy, measured on v5e: the erf lowering is VPU-bound and
    drags the fused FF down-projection from 193 to 140 TFLOPS (~0.17 ms per
    transformer FF at SDXL shapes, ~200 ms per SDXL image). The tanh
    approximation's error (≤3e-4 absolute) is ~20× below bf16 ulp at gelu's
    active range, so in bf16 compute it is exact-to-representable-precision.
    f32 (CPU golden-parity path) keeps erf to match the reference's
    torch.nn.functional.gelu bit-for-bit behavior."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """GEGLU feed-forward gate used by SD transformer blocks."""
    proj = linear(x, p)
    h, gate = jnp.split(proj, 2, axis=-1)
    return h * gelu(gate)


def timestep_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0, dtype=jnp.float32
) -> jax.Array:
    """Sinusoidal timestep embedding, [B] → [B, dim]. Matches the DDPM/LDM
    convention (cos|sin halves, frequencies exp(-log(P)·i/half))."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """NHWC nearest-neighbor 2× upsample."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
