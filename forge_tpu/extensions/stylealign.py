"""StyleAlign (arXiv:2312.02133): style-consistent batches via shared attention.

Behavioral twin of sd_forge_stylealign (forge_stylealign.py:38-88
attn1_proc): within each CFG group (cond rows, uncond rows) the self-attention
sequences of all batch images are joined into one long sequence, so every
image attends to every other image's keys/values — aligning style across the
batch. strength blends shared vs. original attention.

Our compiled batch layout is [B cond | B uncond] (cfg.py make_cfg_model_fn
concatenation), so the group structure is static: leading dim // batch_size
groups of batch_size rows each — no index bookkeeping needed at runtime.
"""

from __future__ import annotations

from typing import Any, Dict

from ..ops.attention import attention


def build_stylealign_hooks(batch_size: int, strength: float = 1.0) -> Dict[str, Any]:
    def attn1_shared(q, k, v, extra):
        heads = extra["n_heads"]
        b, l, c = q.shape
        groups = max(b // max(batch_size, 1), 1)

        def join(t):
            return t.reshape(groups, (b // groups) * l, c)

        shared = attention(join(q), join(k), join(v), heads=heads).reshape(b, l, c)
        if strength > 0.99:
            return shared
        original = attention(q, k, v, heads=heads)
        if strength < 0.01:
            return original
        return (1.0 - strength) * original + strength * shared

    return {"attn1_replace_all": attn1_shared}


def attach(p, args: Dict[str, Any]) -> None:
    """alwayson_scripts wiring: {"shared_attention": true, "strength": 1.0}."""
    if not args.get("shared_attention", True):
        return
    strength = float(args.get("strength", 1.0))
    p.unet_hooks = {**(p.unet_hooks or {}),
                    **build_stylealign_hooks(p.batch_size, strength)}
    p.extra_generation_params["StyleAlign enabled"] = "True"
    p.extra_generation_params["StyleAlign strength"] = strength
