"""ControlNet (cldm) as a pure function.

Behavioral twin of the reference's ControlNet model + patcher
(backend/nn/cnets/cldm.py:7, backend/patcher/controlnet.py:282-358): a copy
of the UNet encoder whose per-block outputs pass through zero-convs to become
residuals, plus an input-hint conv stack. Residuals are consumed by
unet_apply's `control` argument ({'output': [...], 'middle': [...]}).

Key space mirrors checkpoint keys ('input_blocks.*', 'zero_convs.*',
'input_hint_block.*', 'middle_block_out.*'), nested by '.' like all params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import nn
from .unet import UNetConfig, resblock, spatial_transformer


def controlnet_apply(
    params: Mapping[str, Any],
    x: jax.Array,
    hint: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    y: Optional[jax.Array] = None,
    cfg: UNetConfig = UNetConfig(),
) -> Dict[str, List[jax.Array]]:
    """x [B,h,w,4] latent, hint [B,H,W,3] control image in [0,1] (full res).

    → {'output': [residual per input block], 'middle': [residual]} matching
    the UNet's consumption indices.
    """
    model_channels = params["time_embed"]["0"]["weight"].shape[1]
    t_emb = nn.timestep_embedding(timesteps, model_channels, dtype=x.dtype)
    emb = nn.linear(t_emb, params["time_embed"]["0"])
    emb = nn.linear(nn.silu(emb), params["time_embed"]["2"])

    if y is not None and "label_emb" in params:
        le = params["label_emb"]["0"]
        v = nn.linear(y.astype(emb.dtype), le["0"])
        v = nn.linear(nn.silu(v), le["2"])
        emb = emb + v

    # input hint stack: conv/silu ladder downsampling 8× to latent resolution.
    # Normalize grayscale hints to HWC3 first (the reference runs every
    # annotator output through HWC3, annotator/util.py).
    if hint.ndim == 3:
        hint = hint[..., None]
    if hint.shape[-1] == 1:
        hint = jnp.broadcast_to(hint, hint.shape[:-1] + (3,))
    # match the current latent resolution: the hires-fix second pass (and any
    # img2img at a different size) denoises a larger latent than the hint was
    # prepared for; the reference re-crops/resizes the hint per sampling pass
    # (scripts/controlnet.py crop_and_resize per process_before_every_sampling)
    want = (x.shape[1] * 8, x.shape[2] * 8)
    if hint.shape[1:3] != want:
        hint = jax.image.resize(
            hint, (hint.shape[0], want[0], want[1], hint.shape[3]), "bilinear")
    guided = _hint_stack(params["input_hint_block"], hint)

    outs: List[jax.Array] = []
    h = x
    input_blocks = params["input_blocks"]
    zero_convs = params["zero_convs"]
    for i in range(len(input_blocks)):
        block = input_blocks[str(i)]
        for j in range(len(block)):
            sub = block[str(j)]
            if "in_layers" in sub:
                h = resblock(sub, h, emb)
            elif "transformer_blocks" in sub:
                h = spatial_transformer(sub, h, context, cfg, ("input", i), {})
            elif "op" in sub:
                h = nn.conv2d(h, sub["op"], stride=2, padding=1)
            elif "weight" in sub:
                h = nn.conv2d(h, sub, padding=1)
        if i == 0 and guided is not None:
            h = h + guided
            guided = None
        outs.append(nn.conv2d(h, zero_convs[str(i)]["0"]))

    mid = params["middle_block"]
    h = resblock(mid["0"], h, emb)
    h = spatial_transformer(mid["1"], h, context, cfg, ("middle", 0), {})
    h = resblock(mid["2"], h, emb)
    middle = nn.conv2d(h, params["middle_block_out"]["0"])

    # unet_apply consumes control['output'][j] at output step j (deepest
    # first); the encoder produced skips shallow-first → reverse here. The
    # reference gets the same alignment from list.pop() (unet.py:46).
    return {"output": outs[::-1], "middle": [middle]}


def _hint_stack(hb: Mapping[str, Any], hint: jax.Array) -> jax.Array:
    """The cldm input_hint_block: 8 convs with SiLU between, stride 2 at the
    3rd, 5th and 7th conv (256→32 spatial, 16→…→256 channels)."""
    conv_idx = sorted(int(k) for k in hb.keys())
    h = hint
    n = len(conv_idx)
    for pos, idx in enumerate(conv_idx):
        p = hb[str(idx)]
        # stride-2 convs are those whose in/out channel jump matches the
        # canonical ladder: detect via spatial kernel + channel growth
        w = p["weight"]
        cin, cout = w.shape[2], w.shape[3]
        stride = 2 if (pos in (2, 4, 6) and n == 8) else 1
        h = nn.conv2d(h, p, stride=stride, padding=1)
        if pos != n - 1:
            h = nn.silu(h)
    return h


@dataclasses.dataclass
class ControlNetState:
    """One attached ControlNet: params + hint + strength + σ-range gating
    (reference ControlBase strength/timestep-range, patcher/controlnet.py:190)."""

    params: Any
    hint: jax.Array  # [B,H,W,3]
    strength: float = 1.0
    start_percent: float = 0.0
    end_percent: float = 1.0
    cfg: UNetConfig = UNetConfig()
    # per-control-slot weights (reference advanced weighting,
    # patcher/controlnet.py:86 compute_controlnet_weighting): weight i scales
    # residual i of each kind; shorter lists pad with 1.0
    block_weights: Optional[Sequence[float]] = None
    # stable content token for jit-cache keys (core/digest.py): set to the
    # checkpoint hash + hint hash at load; None falls back to a slow walk
    digest: Optional[str] = None
    # InstantID coupling: replaces the text cross-attn context fed to THIS
    # ControlNet with image-prompt tokens [2B, n, ctx] (cond‖uncond — the
    # reference's controlnet_conditioning_modifier c_crossattn swap)
    context_override: Optional[jax.Array] = None


def run_controlnets(
    states: Sequence[ControlNetState],
    x: jax.Array,
    timesteps: jax.Array,
    sigma_frac: jax.Array,  # scalar in [0,1]: fraction of schedule elapsed
    context: jax.Array,
    y: Optional[jax.Array] = None,
) -> Optional[Dict[str, List[jax.Array]]]:
    """Evaluate attached ControlNets and merge residual dicts (linked-list
    eval in the reference, sampling_function.py:261-268)."""
    if not states:
        return None
    merged: Dict[str, List[Any]] = {}
    for st in states:
        if hasattr(st, "features"):  # T2IAdapterState: hint-only, precomputed
            out = st.features()
        else:
            ctx = context
            override = getattr(st, "context_override", None)
            if override is not None:
                ctx = override.astype(context.dtype)
                if ctx.shape[0] != x.shape[0]:  # skip-uncond: cond half only
                    ctx = ctx[: x.shape[0]]
            out = controlnet_apply(st.params, x, st.hint, timesteps, ctx, y=y, cfg=st.cfg)
        active = jnp.logical_and(
            sigma_frac >= st.start_percent, sigma_frac <= st.end_percent
        ).astype(x.dtype)
        gate = active * st.strength
        bw = getattr(st, "block_weights", None)
        for kind, residuals in out.items():
            tgt = merged.setdefault(kind, [None] * len(residuals))
            if len(tgt) < len(residuals):
                tgt.extend([None] * (len(residuals) - len(tgt)))
            for i, r in enumerate(residuals):
                if r is None:
                    continue
                w = gate if bw is None else gate * float(bw[i] if i < len(bw) else 1.0)
                if r.shape[0] != x.shape[0]:  # broadcast hint batch to CFG batch
                    r = jnp.broadcast_to(r, (x.shape[0],) + r.shape[1:])
                r = r.astype(x.dtype) * w
                tgt[i] = r if tgt[i] is None else tgt[i] + r
    return merged
