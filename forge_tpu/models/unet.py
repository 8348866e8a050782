"""Stable Diffusion UNet (SD1.5 / SD2.x / SDXL base+refiner) as a pure function.

Covers the behavior of the reference's IntegratedUNet2DConditionModel
(backend/nn/unet.py:481,696): ResBlocks, SpatialTransformers with self/cross
attention, timestep/label embeddings, ControlNet residual injection
(apply_control, unet.py:44), and the hook taxonomy that forms the extension
ABI (attn1/attn2 patch+replace, input/output/middle block patches,
unet.py:180-279,696-763). Here hooks are compile-time function composition:
the denoise fn is rebuilt from a patch manifest and re-jitted when the patch
set changes, instead of runtime nn.Module mutation.

The parameter tree mirrors the checkpoint's `model.diffusion_model.*` dotted
keys (nested by `.`), so LoRA patches address weights by their native names.
Activations are NHWC; block structure is discovered from the tree itself
(key presence), so one function serves every UNet family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    context_dim: int = 768
    num_heads: int = 8          # used when head_dim is None (SD1.5)
    head_dim: Optional[int] = None  # 64 for SD2.x / SDXL
    use_linear_projection: bool = False
    adm_in_channels: Optional[int] = None

    @staticmethod
    def for_family(family: str) -> "UNetConfig":
        if family == "sd15":
            return UNetConfig(context_dim=768, num_heads=8)
        if family == "sd20":
            return UNetConfig(context_dim=1024, head_dim=64, use_linear_projection=True)
        if family == "sdxl":
            return UNetConfig(context_dim=2048, head_dim=64, use_linear_projection=True,
                              adm_in_channels=2816)
        if family == "sdxl_refiner":
            return UNetConfig(context_dim=1280, head_dim=64, use_linear_projection=True,
                              adm_in_channels=2560)
        if family == "playground":  # SDXL geometry under the EDM objective
            return UNetConfig(context_dim=2048, head_dim=64, use_linear_projection=True,
                              adm_in_channels=2816)
        if family == "kolors":  # SDXL UNet + ChatGLM hid-proj, adm 5632
            return UNetConfig(context_dim=2048, head_dim=64, use_linear_projection=True,
                              adm_in_channels=5632)
        raise ValueError(f"no UNet config for family {family!r}")


# ---------------------------------------------------------------------------
# blocks


def resblock(p: Mapping[str, Any], x: jax.Array, emb: jax.Array) -> jax.Array:
    from ..ops.fused_gn_conv import gn_silu_conv3x3

    h = gn_silu_conv3x3(x, p["in_layers"]["0"], p["in_layers"]["2"])
    emb_out = nn.linear(nn.silu(emb), p["emb_layers"]["1"])
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = gn_silu_conv3x3(h, p["out_layers"]["0"], p["out_layers"]["3"])
    if "skip_connection" in p:
        w = p["skip_connection"]["weight"]
        if w.ndim == 4:
            x = nn.conv2d(x, p["skip_connection"])
        else:
            x = nn.linear(x, p["skip_connection"])
    return x + h


def _attn_block(
    p: Mapping[str, Any],
    x: jax.Array,
    context: Optional[jax.Array],
    heads: int,
    block_id,
    which: str,
    hooks: Mapping[str, Any],
    block_index: int = 0,
) -> jax.Array:
    q = nn.linear(x, {"weight": p["to_q"]["weight"]})
    ctx = x if context is None else context
    # pre-projection context transform (legacy hypernetworks: separate k/v
    # context MLPs applied before to_k/to_v, modules/hypernetworks)
    ctx_k = ctx_v = ctx
    for fn in hooks.get(f"{which}_context_patch", ()):
        ctx_k, ctx_v = fn(ctx_k, ctx_v, {"block": block_id})
    k = nn.linear(ctx_k, {"weight": p["to_k"]["weight"]})
    v = nn.linear(ctx_v, {"weight": p["to_v"]["weight"]})

    extra = {"block": block_id, "n_heads": heads, "block_index": block_index}
    patch = hooks.get(f"{which}_patch")
    if patch:
        for fn in patch:
            q, k, v = fn(q, k, v, extra)

    replace = hooks.get(f"{which}_replace", {})
    fn = replace.get(block_id) or hooks.get(f"{which}_replace_all")
    if fn is not None:
        out = fn(q, k, v, extra)
    else:
        out = attention(q, k, v, heads=heads)

    out = nn.linear(out, p["to_out"]["0"])

    output_patch = hooks.get(f"{which}_output_patch")
    if output_patch:
        for pfn in output_patch:
            out = pfn(out, {"block": block_id})
    return out


def transformer_block(
    p: Mapping[str, Any],
    x: jax.Array,
    context: Optional[jax.Array],
    heads: int,
    block_id,
    hooks: Mapping[str, Any],
    block_index: int = 0,
) -> jax.Array:
    x = x + _attn_block(p["attn1"], nn.layer_norm(x, p["norm1"]), None, heads, block_id, "attn1", hooks, block_index)
    x = x + _attn_block(p["attn2"], nn.layer_norm(x, p["norm2"]), context, heads, block_id, "attn2", hooks, block_index)
    h = nn.layer_norm(x, p["norm3"])
    h = nn.geglu(h, p["ff"]["net"]["0"]["proj"])
    x = x + nn.linear(h, p["ff"]["net"]["2"])
    return x


def spatial_transformer(
    p: Mapping[str, Any],
    x: jax.Array,
    context: jax.Array,
    cfg: UNetConfig,
    block_id,
    hooks: Mapping[str, Any],
) -> jax.Array:
    b, h, w, c = x.shape
    heads = cfg.num_heads if cfg.head_dim is None else max(c // cfg.head_dim, 1)
    x_in = x
    x = nn.group_norm(x, p["norm"])
    linear_proj = p["proj_in"]["weight"].ndim == 2
    if linear_proj:
        x = nn.linear(x.reshape(b, h * w, c), p["proj_in"])
    else:
        x = nn.conv2d(x, p["proj_in"]).reshape(b, h * w, c)
    blocks = p["transformer_blocks"]
    for i in range(len(blocks)):
        x = transformer_block(blocks[str(i)], x, context, heads, block_id, hooks, block_index=i)
    if linear_proj:
        x = nn.linear(x, p["proj_out"]).reshape(b, h, w, c)
    else:
        x = nn.conv2d(x.reshape(b, h, w, c), p["proj_out"])
    return x + x_in


def _apply_control(h: jax.Array, control, kind: str, index: int) -> jax.Array:
    """Add ControlNet/T2I-Adapter residuals (reference unet.py:44).

    Convention (matching the reference consumption order, expressed with
    forward indices instead of list.pop): control['input'][i] lands after
    input block i, control['output'][j] on the skip consumed at output step j,
    control['middle'][0] after the middle block.
    """
    if control is None:
        return h
    residuals = control.get(kind)
    if residuals is None or index >= len(residuals) or residuals[index] is None:
        return h
    return h + residuals[index].astype(h.dtype)


# ---------------------------------------------------------------------------
# full model


def unet_apply(
    params: Mapping[str, Any],
    x: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    y: Optional[jax.Array] = None,
    cfg: UNetConfig = UNetConfig(),
    control: Optional[Mapping[str, Sequence[jax.Array]]] = None,
    hooks: Optional[Mapping[str, Any]] = None,
) -> jax.Array:
    """x [B,H,W,C_latent], timesteps [B], context [B,L,context_dim],
    y [B, adm_in_channels] (SDXL class/size conditioning) → eps/v prediction.
    """
    hooks = hooks or {}
    # channel-concat conditioning (IC-Light's hooked_unet_forward,
    # forge_space_iclight/forge_app.py:44-50; also the shape inpaint models
    # use): extra latent channels appended to x before the stem conv.
    # Hooks return the concat SOURCE ([B or 1, h, w, C]); batch broadcast
    # and H/W resize happen here so one hook survives hires-fix/img2img
    # passes at other resolutions (same policy as the controlnet hint).
    for fn in hooks.get("x_concat", ()):
        c = fn(x)
        if c.shape[1:3] != x.shape[1:3]:
            c = jax.image.resize(
                c, (c.shape[0],) + x.shape[1:3] + (c.shape[3],), "bilinear")
        if c.shape[0] != x.shape[0]:
            c = jnp.tile(c, (x.shape[0] // c.shape[0], 1, 1, 1))
        x = jnp.concatenate([x, c.astype(x.dtype)], axis=-1)
    model_channels = params["time_embed"]["0"]["weight"].shape[1]
    t_emb = nn.timestep_embedding(timesteps, model_channels, dtype=x.dtype)
    emb = nn.linear(t_emb, params["time_embed"]["0"])
    emb = nn.linear(nn.silu(emb), params["time_embed"]["2"])

    if y is not None and "label_emb" in params:
        le = params["label_emb"]["0"]
        v = nn.linear(y.astype(emb.dtype), le["0"])
        v = nn.linear(nn.silu(v), le["2"])
        emb = emb + v

    if "encoder_hid_proj" in params:
        # Kolors: ChatGLM hidden (4096) → cross-attn width (2048)
        # (Kwai-Kolors unet config encoder_hid_dim_type='text_proj')
        context = nn.linear(context, params["encoder_hid_proj"])

    input_blocks = params["input_blocks"]
    output_blocks = params["output_blocks"]

    hs: List[jax.Array] = []
    h = x
    for i in range(len(input_blocks)):
        block = input_blocks[str(i)]
        for j in range(len(block)):
            sub = block[str(j)]
            if "in_layers" in sub:
                h = resblock(sub, h, emb)
            elif "transformer_blocks" in sub:
                h = spatial_transformer(sub, h, context, cfg, ("input", i), hooks)
            elif "op" in sub:
                h = nn.conv2d(h, sub["op"], stride=2, padding=1)
            elif "weight" in sub:  # input_blocks.0.0 stem conv
                h = nn.conv2d(h, sub, padding=1)
        h = _apply_control(h, control, "input", i)
        for fn in hooks.get("input_block_patch", ()):  # extension ABI
            h = fn(h, ("input", i))
        hs.append(h)
        for fn in hooks.get("input_block_patch_after_skip", ()):
            h = fn(h, ("input", i))

    mid = params["middle_block"]
    h = resblock(mid["0"], h, emb)
    h = spatial_transformer(mid["1"], h, context, cfg, ("middle", 0), hooks)
    h = resblock(mid["2"], h, emb)
    h = _apply_control(h, control, "middle", 0)
    for fn in hooks.get("middle_block_patch", ()):
        h = fn(h, ("middle", 0))

    for i in range(len(output_blocks)):
        block = output_blocks[str(i)]
        skip = hs.pop()
        skip = _apply_control(skip, control, "output", i)
        for fn in hooks.get("output_block_patch", ()):
            h, skip = fn(h, skip, ("output", i))
        h = jnp.concatenate([h, skip], axis=-1)
        for j in range(len(block)):
            sub = block[str(j)]
            if "in_layers" in sub:
                h = resblock(sub, h, emb)
            elif "transformer_blocks" in sub:
                h = spatial_transformer(sub, h, context, cfg, ("output", i), hooks)
            elif "conv" in sub:  # upsample
                h = nn.upsample_nearest_2x(h)
                h = nn.conv2d(h, sub["conv"], padding=1)
        # 'after'-flagged block modifiers (reference unet block_modifiers with
        # flag 'after'; used by reference-adain, forge_reference.py:95-133)
        for fn in hooks.get("output_block_patch_after", ()):
            h = fn(h, ("output", i))

    h = nn.group_norm(h, params["out"]["0"], act="silu")
    h = nn.conv2d(h, params["out"]["2"], padding=1)
    return h
