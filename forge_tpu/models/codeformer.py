"""CodeFormer face restoration network, pure JAX.

Re-implementation of the published CodeFormer architecture
(sczhou/CodeFormer codeformer_arch.py + vqgan_arch.py; the reference loads
the same net through spandrel, modules/codeformer_model.py:37-41): a VQGAN
autoencoder whose 16×16 latent is re-predicted token-by-token by a 9-layer
transformer over a 1024-code codebook, then decoded with optional
controllable feature fusion (w∈[0,1]; w=0 → maximum restoration, w=1 →
maximum fidelity to the degraded input).

Parameters load from the official ``codeformer-v0.1.0.pth`` key space
(``encoder.blocks.N.*``, ``generator.blocks.N.*``, ``quantize.embedding``,
``ft_layers.N.*``, ``fuse_convs_dict.{32,64,128,256}.*``), conv kernels
pre-transposed to HWIO by core.state_dict.transform_for_jax. Block types are
classified from their key signature, so the walk mirrors the constructor
without hardcoding indices. Activations NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn


# -- VQGAN blocks (vqgan_arch.py) --------------------------------------------


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(x, p):
    """GroupNorm(32) as in vqgan_arch normalize(); group count clamps to the
    channel count so scaled-down test nets stay valid."""
    c = x.shape[-1]
    return nn.group_norm(x, p, num_groups=min(32, c), eps=1e-6)


def _resblock(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    h = _gn(x, p["norm1"])
    h = nn.conv2d(_swish(h), p["conv1"], padding=1)
    h = _gn(h, p["norm2"])
    h = nn.conv2d(_swish(h), p["conv2"], padding=1)
    if "conv_out" in p:
        x = nn.conv2d(x, p["conv_out"])
    return x + h


def _attnblock(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    hn = _gn(x, p["norm"])
    q = nn.conv2d(hn, p["q"]).reshape(b, h * w, c)
    k = nn.conv2d(hn, p["k"]).reshape(b, h * w, c)
    v = nn.conv2d(hn, p["v"]).reshape(b, h * w, c)
    attn = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / jnp.sqrt(c), axis=-1)
    out = (attn @ v).reshape(b, h, w, c)
    return x + nn.conv2d(out, p["proj_out"])


def _block_type(p: Mapping[str, Any]) -> str:
    if "norm1" in p:
        return "res"
    if "q" in p:
        return "attn"
    if "conv" in p:
        return "resample"  # Downsample (encoder) / Upsample (generator)
    w = p.get("weight")
    if w is not None and getattr(w, "ndim", 0) == 4:
        return "conv"
    return "norm"


def _walk_blocks(blocks: Mapping[str, Any], x: jax.Array, *, upsample: bool,
                 taps: Dict[int, jax.Array] = None,
                 fuse: Dict[int, Any] = None) -> jax.Array:
    """Execute an encoder/generator blocks list in index order.
    taps: filled with {spatial_size: feature} after each block (encoder side).
    fuse: {spatial_size: fn(x)} applied after the block that reaches that
    size (generator side, codeformer_arch fuse_generator_block semantics)."""
    fused = set()
    for i in range(len(blocks)):
        p = blocks[str(i)]
        kind = _block_type(p)
        if kind == "res":
            x = _resblock(p, x)
        elif kind == "attn":
            x = _attnblock(p, x)
        elif kind == "conv":
            x = nn.conv2d(x, p, padding=1)
        elif kind == "norm":
            x = _swish(_gn(x, p))
        elif kind == "resample":
            if upsample:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = nn.conv2d(x, p["conv"], padding=1)
            else:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.conv2d(x, p["conv"], stride=2)
        if taps is not None:
            taps[x.shape[1]] = x
        # generator fuse points are the FIRST ResBlock at each spatial size
        # (codeformer_arch fuse_generator_block {32:9, 64:12, 128:15, 256:18})
        if fuse and kind == "res" and x.shape[1] in fuse and x.shape[1] not in fused:
            x = fuse[x.shape[1]](x)
            fused.add(x.shape[1])
    return x


# -- transformer (codeformer_arch.py TransformerSALayer) ---------------------


def _mha(p: Mapping[str, Any], q, k, v, heads: int = 8) -> jax.Array:
    """torch nn.MultiheadAttention with packed in_proj. Inputs [L, B, C]."""
    w = p["in_proj_weight"]  # [3C, C]
    b = p["in_proj_bias"]
    c = q.shape[-1]
    qp = q @ w[:c].T + b[:c]
    kp = k @ w[c:2 * c].T + b[c:2 * c]
    vp = v @ w[2 * c:].T + b[2 * c:]

    def split(t):  # [L,B,C] → [B,H,L,D]
        l, bb, _ = t.shape
        return jnp.transpose(t.reshape(l, bb, heads, c // heads), (1, 2, 0, 3))

    qh, kh, vh = split(qp), split(kp), split(vp)
    attn = jax.nn.softmax(qh @ jnp.swapaxes(kh, -1, -2) / jnp.sqrt(c // heads), axis=-1)
    out = attn @ vh  # [B,H,L,D]
    out = jnp.transpose(out, (2, 0, 1, 3)).reshape(q.shape)
    return nn.linear(out, p["out_proj"])


def _transformer_layer(p: Mapping[str, Any], tgt: jax.Array,
                       query_pos: jax.Array) -> jax.Array:
    """norm-first self-attention layer (codeformer_arch TransformerSALayer)."""
    t2 = nn.layer_norm(tgt, p["norm1"])
    qk = t2 + query_pos
    tgt = tgt + _mha(p["self_attn"], qk, qk, t2)
    t2 = nn.layer_norm(tgt, p["norm2"])
    t2 = nn.linear(jax.nn.gelu(nn.linear(t2, p["linear1"]), approximate=False),
                   p["linear2"])
    return tgt + t2


# -- fuse block (codeformer_arch Fuse_sft_block) ------------------------------


def _fuse_sft(p: Mapping[str, Any], enc_feat: jax.Array, dec_feat: jax.Array,
              w: float) -> jax.Array:
    feat = _resblock(p["encode_enc"], jnp.concatenate([enc_feat, dec_feat], axis=-1))
    scale = nn.conv2d(jax.nn.leaky_relu(
        nn.conv2d(feat, p["scale"]["0"], padding=1), 0.2), p["scale"]["2"], padding=1)
    shift = nn.conv2d(jax.nn.leaky_relu(
        nn.conv2d(feat, p["shift"]["0"], padding=1), 0.2), p["shift"]["2"], padding=1)
    return dec_feat + w * (dec_feat * scale + shift)


def _adain(content: jax.Array, style: jax.Array) -> jax.Array:
    """Adaptive instance norm over spatial dims (codeformer_arch :24-35)."""
    cm = content.mean(axis=(1, 2), keepdims=True)
    cs = content.std(axis=(1, 2), keepdims=True) + 1e-5
    sm = style.mean(axis=(1, 2), keepdims=True)
    ss = style.std(axis=(1, 2), keepdims=True) + 1e-5
    return (content - cm) / cs * ss + sm


# -- full model ----------------------------------------------------------------


def codeformer_apply(params: Mapping[str, Any], x: jax.Array,
                     w: float = 0.5, adain: bool = True) -> jax.Array:
    """x: [B,512,512,3] face crop in [-1,1] → restored [B,512,512,3].

    Mirrors CodeFormer.forward (codeformer_arch.py:221-280): encode → token
    transformer predicts codebook indices → quantized feature (+adain) →
    generator with w-weighted SFT fusion of encoder skips at 32..256."""
    # fusable sizes come from the checkpoint itself (official: 32..256,
    # codeformer_arch connect_list)
    connect = tuple(sorted(params.get("fuse_convs_dict", {}), key=int))
    taps: Dict[int, jax.Array] = {}
    lq_feat = _walk_blocks(params["encoder"]["blocks"], x, upsample=False,
                           taps=taps)
    b, hh, ww, c = lq_feat.shape  # 16,16,256

    # token transformer over the 256 latent positions
    pos = params["position_emb"]  # [256, 512]
    feat = nn.linear(lq_feat.reshape(b, hh * ww, c), params["feat_emb"])
    query = jnp.transpose(feat, (1, 0, 2))  # [L,B,512]
    qpos = pos[:, None, :]
    ft = params["ft_layers"]
    for i in range(len(ft)):
        query = _transformer_layer(ft[str(i)], query, qpos)
    logits = nn.linear(nn.layer_norm(query, params["idx_pred_layer"]["0"]),
                       params["idx_pred_layer"]["1"])  # [L,B,1024]
    idx = jnp.argmax(logits, axis=-1)  # [L,B]

    codebook = params["quantize"]["embedding"]["weight"]  # [1024, 256]
    quant = codebook[jnp.transpose(idx)]  # [B,L,256]
    quant = quant.reshape(b, hh, ww, c)
    if adain:
        quant = _adain(quant, lq_feat)

    fuse_params = params["fuse_convs_dict"]
    enc_by_size = {size: taps[int(size)] for size in connect if int(size) in taps}
    fuse = {
        int(size): (lambda xx, _p=fuse_params[size], _e=enc_by_size[size]:
                    _fuse_sft(_p, _e, xx, w))
        for size in connect if size in fuse_params and size in enc_by_size
    } if w > 0 else {}

    out = _walk_blocks(params["generator"]["blocks"], quant, upsample=True,
                       fuse=fuse)
    return out


def load_codeformer(path: str) -> Dict[str, Any]:
    """Load the official checkpoint (handles the ``params_ema`` wrapper the
    release file uses) into a nested HWIO tree."""
    from ..core.state_dict import load_state_dict, transform_for_jax
    from ..core.tree import nest

    sd = load_state_dict(path)
    if "params_ema" in sd and isinstance(sd["params_ema"], dict):
        sd = sd["params_ema"]
    sd = {k: v for k, v in sd.items() if not k.startswith(("quantize.ema", "loss"))}
    return nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})
