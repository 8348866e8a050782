"""Device mesh + sharding policies.

The reference is single-GPU (SURVEY.md §2.4: no torch.distributed anywhere);
scale-out is the TPU-native capability this framework adds. Design follows
the GSPMD recipe: build a Mesh, annotate parameter/activation shardings with
NamedSharding, let XLA insert the collectives over ICI.

Axes:
  dp — data parallel: batch fan-out (images, cond+uncond pairs)
  tp — tensor parallel: attention heads / MLP columns of the big matmuls
       (for models like Flux-12B that exceed one chip's HBM)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp})*tp({tp}) != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# tensor-parallel parameter shardings for the SD UNet / transformer blocks


def _unet_param_spec(path: str, leaf) -> P:
    """Megatron-style column/row split of the transformer matmuls.

    Linear weights are [out, in]: shard `out` (axis 0) for the up-projections
    (qkv, ff in) and `in` (axis 1) for the down-projections (attn out, ff out)
    so each chip computes a head/column slice and the output needs one
    reduce-scatter/all-reduce that XLA inserts automatically.
    """
    if getattr(leaf, "ndim", 0) != 2:
        return P()  # convs/norms/embeddings replicated
    # SD UNet transformer blocks
    if any(s in path for s in (".to_q.", ".to_k.", ".to_v.", ".ff.net.0.proj.")):
        return P("tp", None)
    if any(s in path for s in (".to_out.0.", ".ff.net.2.")):
        return P(None, "tp")
    # Flux double/single stream blocks (fused qkv / linear1 shard the out
    # axis; GSPMD reshards across the q|k|v|mlp split boundaries as needed)
    if any(s in path for s in (".img_attn.qkv.", ".txt_attn.qkv.",
                               ".img_mlp.0.", ".txt_mlp.0.", ".linear1.")):
        return P("tp", None)
    if any(s in path for s in (".img_attn.proj.", ".txt_attn.proj.",
                               ".img_mlp.2.", ".txt_mlp.2.", ".linear2.")):
        return P(None, "tp")
    # SD3 MMDiT joint blocks
    if any(s in path for s in (".attn.qkv.", ".attn2.qkv.", ".mlp.fc1.")):
        return P("tp", None)
    if any(s in path for s in (".attn.proj.", ".attn2.proj.", ".mlp.fc2.")):
        return P(None, "tp")
    return P()


def shard_unet_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a UNet param tree on the mesh with tp sharding of the
    transformer matmuls (no-op layout-wise when tp == 1)."""
    from ..core.tree import map_leaves

    def place(path, leaf):
        spec = _unet_param_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return map_leaves(place, params)


def shard_replicated(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sh), tree)
