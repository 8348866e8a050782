"""Synthetic checkpoint synthesis: reference-format state dicts with real key
names/shapes but generated weights.

Two uses: (1) tiny random checkpoints for pipeline tests (the analog of
upstream A1111's empty.pt dummy checkpoint, SURVEY.md §4); (2) full-size
zero-filled checkpoints for performance benchmarking on TPU without model
downloads — matmul timing is data-independent, so zeros benchmark exactly
like trained weights.

The UNet builder mirrors the ldm UNetModel construction algorithm (level/block
layout, skip-channel bookkeeping) so key sets match real checkpoints of the
same hyperparameters.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class _Fill:
    def __init__(self, mode: str, seed: int = 0, scale: float = 0.02):
        self.mode = mode
        self.rng = np.random.default_rng(seed)
        self.scale = scale

    def w(self, *shape):
        if self.mode == "zeros":
            return np.zeros(shape, np.float32)
        return (self.rng.standard_normal(shape) * self.scale).astype(np.float32)

    def ones(self, *shape):
        return np.ones(shape, np.float32)

    def zeros(self, *shape):
        return np.zeros(shape, np.float32)


def synth_unet_sd(
    model_channels: int = 320,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    transformer_depth: Sequence[int] = (1, 1, 1, 0),
    context_dim: int = 768,
    adm_in_channels: Optional[int] = None,
    in_channels: int = 4,
    out_channels: int = 4,
    ff_mult: int = 4,
    middle_depth: Optional[int] = None,
    encoder_hid_dim: Optional[int] = None,  # Kolors 4096→context projection
    fill: str = "zeros",
    seed: int = 1,
    prefix: str = "model.diffusion_model.",
) -> Dict[str, np.ndarray]:
    f = _Fill(fill, seed)
    sd: Dict[str, np.ndarray] = {}
    emb = model_channels * 4
    if encoder_hid_dim:
        sd[prefix + "encoder_hid_proj.weight"] = f.w(context_dim, encoder_hid_dim)
        sd[prefix + "encoder_hid_proj.bias"] = f.zeros(context_dim)

    def norm(key, ch):
        sd[key + ".weight"] = f.ones(ch)
        sd[key + ".bias"] = f.zeros(ch)

    def lin(key, o, i, bias=True):
        sd[key + ".weight"] = f.w(o, i)
        if bias:
            sd[key + ".bias"] = f.zeros(o)

    def conv(key, o, i, k=3):
        sd[key + ".weight"] = f.w(o, i, k, k)
        sd[key + ".bias"] = f.zeros(o)

    def resblock(key, cin, cout):
        norm(key + ".in_layers.0", cin)
        conv(key + ".in_layers.2", cout, cin)
        lin(key + ".emb_layers.1", cout, emb)
        norm(key + ".out_layers.0", cout)
        conv(key + ".out_layers.3", cout, cout)
        if cin != cout:
            conv(key + ".skip_connection", cout, cin, 1)

    def transformer(key, ch, depth):
        norm(key + ".norm", ch)
        linear_proj = context_dim >= 1024  # SD2/SDXL use linear projections
        if linear_proj:
            lin(key + ".proj_in", ch, ch)
        else:
            conv(key + ".proj_in", ch, ch, 1)
        for d in range(depth):
            tb = f"{key}.transformer_blocks.{d}"
            for an, ctx in (("attn1", ch), ("attn2", context_dim)):
                lin(f"{tb}.{an}.to_q", ch, ch, bias=False)
                lin(f"{tb}.{an}.to_k", ch, ctx, bias=False)
                lin(f"{tb}.{an}.to_v", ch, ctx, bias=False)
                lin(f"{tb}.{an}.to_out.0", ch, ch)
            norm(tb + ".norm1", ch)
            norm(tb + ".norm2", ch)
            norm(tb + ".norm3", ch)
            lin(tb + ".ff.net.0.proj", ch * ff_mult * 2, ch)
            lin(tb + ".ff.net.2", ch, ch * ff_mult)
        if linear_proj:
            lin(key + ".proj_out", ch, ch)
        else:
            conv(key + ".proj_out", ch, ch, 1)

    lin(prefix + "time_embed.0", emb, model_channels)
    lin(prefix + "time_embed.2", emb, emb)
    if adm_in_channels:
        lin(prefix + "label_emb.0.0", emb, adm_in_channels)
        lin(prefix + "label_emb.0.2", emb, emb)

    # -- input blocks -------------------------------------------------------
    conv(prefix + "input_blocks.0.0", model_channels, in_channels)
    skip_chans = [model_channels]
    ch = model_channels
    idx = 1
    nlevels = len(channel_mult)
    for level, mult in enumerate(channel_mult):
        out_ch = model_channels * mult
        for _ in range(num_res_blocks):
            resblock(f"{prefix}input_blocks.{idx}.0", ch, out_ch)
            ch = out_ch
            if transformer_depth[level] > 0:
                transformer(f"{prefix}input_blocks.{idx}.1", ch, transformer_depth[level])
            skip_chans.append(ch)
            idx += 1
        if level != nlevels - 1:
            conv(f"{prefix}input_blocks.{idx}.0.op", ch, ch)
            skip_chans.append(ch)
            idx += 1

    # -- middle -------------------------------------------------------------
    md = middle_depth if middle_depth is not None else (transformer_depth[-1] or transformer_depth[-2] or 1)
    resblock(prefix + "middle_block.0", ch, ch)
    transformer(prefix + "middle_block.1", ch, md)
    resblock(prefix + "middle_block.2", ch, ch)

    # -- output blocks ------------------------------------------------------
    idx = 0
    for level in reversed(range(nlevels)):
        out_ch = model_channels * channel_mult[level]
        for r in range(num_res_blocks + 1):
            skip = skip_chans.pop()
            resblock(f"{prefix}output_blocks.{idx}.0", ch + skip, out_ch)
            ch = out_ch
            j = 1
            if transformer_depth[level] > 0:
                transformer(f"{prefix}output_blocks.{idx}.{j}", ch, transformer_depth[level])
                j += 1
            if level != 0 and r == num_res_blocks:
                conv(f"{prefix}output_blocks.{idx}.{j}.conv", ch, ch)
            idx += 1

    norm(prefix + "out.0", model_channels)
    conv(prefix + "out.2", out_channels, model_channels)
    return sd


def synth_vae_sd(
    ch: int = 128,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res: int = 2,
    z_channels: int = 4,
    fill: str = "zeros",
    seed: int = 2,
    prefix: str = "first_stage_model.",
) -> Dict[str, np.ndarray]:
    f = _Fill(fill, seed)
    sd: Dict[str, np.ndarray] = {}

    def norm(key, c):
        sd[key + ".weight"] = f.ones(c)
        sd[key + ".bias"] = f.zeros(c)

    def conv(key, o, i, k=3):
        sd[key + ".weight"] = f.w(o, i, k, k)
        sd[key + ".bias"] = f.zeros(o)

    def res(key, cin, cout):
        norm(key + ".norm1", cin)
        conv(key + ".conv1", cout, cin)
        norm(key + ".norm2", cout)
        conv(key + ".conv2", cout, cout)
        if cin != cout:
            conv(key + ".nin_shortcut", cout, cin, 1)

    def attn(key, c):
        norm(key + ".norm", c)
        for n in ("q", "k", "v", "proj_out"):
            conv(key + "." + n, c, c, 1)

    nlev = len(ch_mult)
    e = prefix + "encoder."
    conv(e + "conv_in", ch, 3)
    cur = ch
    for level, mult in enumerate(ch_mult):
        out_c = ch * mult
        for b in range(num_res):
            res(f"{e}down.{level}.block.{b}", cur, out_c)
            cur = out_c
        if level != nlev - 1:
            conv(f"{e}down.{level}.downsample.conv", cur, cur)
    res(e + "mid.block_1", cur, cur)
    attn(e + "mid.attn_1", cur)
    res(e + "mid.block_2", cur, cur)
    norm(e + "norm_out", cur)
    conv(e + "conv_out", z_channels * 2, cur)

    d = prefix + "decoder."
    conv(d + "conv_in", cur, z_channels)
    res(d + "mid.block_1", cur, cur)
    attn(d + "mid.attn_1", cur)
    res(d + "mid.block_2", cur, cur)
    for level in reversed(range(nlev)):
        out_c = ch * ch_mult[level]
        for b in range(num_res + 1):
            res(f"{d}up.{level}.block.{b}", cur, out_c)
            cur = out_c
        if level != 0:
            conv(f"{d}up.{level}.upsample.conv", cur, cur)
    norm(d + "norm_out", cur)
    conv(d + "conv_out", 3, cur)

    conv(prefix + "quant_conv", z_channels * 2, z_channels * 2, 1)
    conv(prefix + "post_quant_conv", z_channels, z_channels, 1)
    return sd


def synth_clip_sd(
    width: int = 768,
    layers: int = 12,
    vocab: int = 49408,
    fill: str = "zeros",
    seed: int = 3,
    prefix: str = "cond_stage_model.transformer.",
    text_projection: bool = False,
) -> Dict[str, np.ndarray]:
    f = _Fill(fill, seed)
    sd: Dict[str, np.ndarray] = {}
    tm = prefix + "text_model."
    sd[tm + "embeddings.token_embedding.weight"] = f.w(vocab, width)
    sd[tm + "embeddings.position_embedding.weight"] = f.w(77, width)
    for i in range(layers):
        base = f"{tm}encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[base + f"self_attn.{n}.weight"] = f.w(width, width)
            sd[base + f"self_attn.{n}.bias"] = f.zeros(width)
        for n in ("layer_norm1", "layer_norm2"):
            sd[base + n + ".weight"] = f.ones(width)
            sd[base + n + ".bias"] = f.zeros(width)
        sd[base + "mlp.fc1.weight"] = f.w(width * 4, width)
        sd[base + "mlp.fc1.bias"] = f.zeros(width * 4)
        sd[base + "mlp.fc2.weight"] = f.w(width, width * 4)
        sd[base + "mlp.fc2.bias"] = f.zeros(width)
    sd[tm + "final_layer_norm.weight"] = f.ones(width)
    sd[tm + "final_layer_norm.bias"] = f.zeros(width)
    if text_projection:
        sd[prefix + "text_projection.weight"] = f.w(width, width)
    return sd


def synth_sd15_checkpoint(fill: str = "zeros", seed: int = 0) -> Dict[str, np.ndarray]:
    """Full-size SD1.5: 320ch UNet, 768-wide CLIP-L×12, 128ch VAE."""
    sd = {}
    sd.update(synth_unet_sd(fill=fill, seed=seed + 1))
    sd.update(synth_vae_sd(fill=fill, seed=seed + 2))
    sd.update(synth_clip_sd(fill=fill, seed=seed + 3))
    return sd


def synth_sdxl_checkpoint(fill: str = "zeros", seed: int = 0) -> Dict[str, np.ndarray]:
    """Full-size SDXL base: 320ch UNet mult(1,2,4) depths(0,2,10), dual TEs."""
    sd = {}
    sd.update(
        synth_unet_sd(
            channel_mult=(1, 2, 4),
            transformer_depth=(0, 2, 10),
            context_dim=2048,
            adm_in_channels=2816,
            middle_depth=10,
            fill=fill,
            seed=seed + 1,
        )
    )
    sd.update(synth_vae_sd(fill=fill, seed=seed + 2))
    sd.update(synth_clip_sd(fill=fill, seed=seed + 3, prefix="conditioner.embedders.0.transformer."))
    # CLIP-G in open_clip layout
    f = _Fill(fill, seed + 4)
    g = "conditioner.embedders.1.model."
    width, layers = 1280, 32
    sd[g + "positional_embedding"] = f.w(77, width)
    sd[g + "token_embedding.weight"] = f.w(49408, width)
    sd[g + "ln_final.weight"] = f.ones(width)
    sd[g + "ln_final.bias"] = f.zeros(width)
    sd[g + "text_projection"] = f.w(width, width)
    for i in range(layers):
        base = f"{g}transformer.resblocks.{i}."
        sd[base + "attn.in_proj_weight"] = f.w(width * 3, width)
        sd[base + "attn.in_proj_bias"] = f.zeros(width * 3)
        sd[base + "attn.out_proj.weight"] = f.w(width, width)
        sd[base + "attn.out_proj.bias"] = f.zeros(width)
        sd[base + "ln_1.weight"] = f.ones(width)
        sd[base + "ln_1.bias"] = f.zeros(width)
        sd[base + "ln_2.weight"] = f.ones(width)
        sd[base + "ln_2.bias"] = f.zeros(width)
        sd[base + "mlp.c_fc.weight"] = f.w(width * 4, width)
        sd[base + "mlp.c_fc.bias"] = f.zeros(width * 4)
        sd[base + "mlp.c_proj.weight"] = f.w(width, width * 4)
        sd[base + "mlp.c_proj.bias"] = f.zeros(width)
    return sd


def synth_flux_sd(
    hidden: int = 3072,
    num_heads: int = 24,
    depth: int = 19,
    depth_single: int = 38,
    context_dim: int = 4096,
    pooled_dim: int = 768,
    in_channels: int = 64,
    guidance: bool = True,
    mlp_ratio: float = 4.0,
    fill: str = "zeros",
    seed: int = 5,
    prefix: str = "model.diffusion_model.",
):
    """Flux-format state dict (flux-dev defaults; pass smaller dims for tests)."""
    f = _Fill(fill, seed)
    sd = {}
    mlp = int(hidden * mlp_ratio)
    head_dim = hidden // num_heads

    def lin(key, o, i):
        sd[key + ".weight"] = f.w(o, i)
        sd[key + ".bias"] = f.zeros(o)

    lin(prefix + "img_in", hidden, in_channels)
    lin(prefix + "txt_in", hidden, context_dim)
    lin(prefix + "time_in.in_layer", hidden, 256)
    lin(prefix + "time_in.out_layer", hidden, hidden)
    lin(prefix + "vector_in.in_layer", hidden, pooled_dim)
    lin(prefix + "vector_in.out_layer", hidden, hidden)
    if guidance:
        lin(prefix + "guidance_in.in_layer", hidden, 256)
        lin(prefix + "guidance_in.out_layer", hidden, hidden)

    for i in range(depth):
        b = f"{prefix}double_blocks.{i}."
        for s in ("img", "txt"):
            lin(b + f"{s}_mod.lin", hidden * 6, hidden)
            lin(b + f"{s}_attn.qkv", hidden * 3, hidden)
            sd[b + f"{s}_attn.norm.query_norm.scale"] = f.ones(head_dim)
            sd[b + f"{s}_attn.norm.key_norm.scale"] = f.ones(head_dim)
            lin(b + f"{s}_attn.proj", hidden, hidden)
            lin(b + f"{s}_mlp.0", mlp, hidden)
            lin(b + f"{s}_mlp.2", hidden, mlp)

    for i in range(depth_single):
        b = f"{prefix}single_blocks.{i}."
        lin(b + "linear1", hidden * 3 + mlp, hidden)
        lin(b + "linear2", hidden, hidden + mlp)
        sd[b + "norm.query_norm.scale"] = f.ones(head_dim)
        sd[b + "norm.key_norm.scale"] = f.ones(head_dim)
        lin(b + "modulation.lin", hidden * 3, hidden)

    lin(prefix + "final_layer.linear", in_channels, hidden)
    lin(prefix + "final_layer.adaLN_modulation.1", hidden * 2, hidden)
    return sd


def synth_mmdit_sd(
    hidden: int = 1536,
    depth: int = 24,
    context_dim: int = 4096,
    pooled_dim: int = 2048,
    in_channels: int = 16,
    patch: int = 2,
    pos_max: int = 192,
    qk_norm: bool = False,
    x_attn2: bool = False,
    fill: str = "zeros",
    seed: int = 6,
    prefix: str = "model.diffusion_model.",
):
    """SD3-format state dict (sd3-medium defaults)."""
    f = _Fill(fill, seed)
    sd = {}
    mlp = hidden * 4

    def lin(key, o, i):
        sd[key + ".weight"] = f.w(o, i)
        sd[key + ".bias"] = f.zeros(o)

    sd[prefix + "x_embedder.proj.weight"] = f.w(hidden, in_channels, patch, patch)
    sd[prefix + "x_embedder.proj.bias"] = f.zeros(hidden)
    sd[prefix + "pos_embed"] = f.w(1, pos_max * pos_max, hidden)
    lin(prefix + "t_embedder.mlp.0", hidden, 256)
    lin(prefix + "t_embedder.mlp.2", hidden, hidden)
    lin(prefix + "y_embedder.mlp.0", hidden, pooled_dim)
    lin(prefix + "y_embedder.mlp.2", hidden, hidden)
    lin(prefix + "context_embedder", hidden, context_dim)

    for i in range(depth):
        pre_only = i == depth - 1
        for blk in ("context_block", "x_block"):
            b = f"{prefix}joint_blocks.{i}.{blk}."
            lin(b + "attn.qkv", hidden * 3, hidden)
            if qk_norm:
                sd[b + "attn.ln_q.weight"] = f.ones(hidden // (hidden // 64))
                sd[b + "attn.ln_k.weight"] = f.ones(hidden // (hidden // 64))
            if blk == "context_block" and pre_only:
                lin(b + "adaLN_modulation.1", hidden * 2, hidden)
                continue
            lin(b + "attn.proj", hidden, hidden)
            n_mod = 9 if (x_attn2 and blk == "x_block") else 6
            lin(b + "adaLN_modulation.1", hidden * n_mod, hidden)
            lin(b + "mlp.fc1", mlp, hidden)
            lin(b + "mlp.fc2", hidden, mlp)
            if x_attn2 and blk == "x_block":
                lin(b + "attn2.qkv", hidden * 3, hidden)
                lin(b + "attn2.proj", hidden, hidden)

    lin(prefix + "final_layer.linear", patch * patch * in_channels, hidden)
    lin(prefix + "final_layer.adaLN_modulation.1", hidden * 2, hidden)
    return sd


def synth_t5_sd(
    width: int = 4096,
    layers: int = 24,
    heads: int = 64,
    ff: int = 10240,
    vocab: int = 32128,
    fill: str = "zeros",
    seed: int = 7,
    prefix: str = "text_encoders.t5xxl.transformer.",
):
    f = _Fill(fill, seed)
    sd = {}
    kv = 64 * heads

    def w(key, o, i):
        sd[key + ".weight"] = f.w(o, i)

    sd[prefix + "shared.weight"] = f.w(vocab, width)
    for i in range(layers):
        b = f"{prefix}encoder.block.{i}.layer."
        for n in ("q", "k", "v"):
            w(b + f"0.SelfAttention.{n}", kv, width)
        w(b + "0.SelfAttention.o", width, kv)
        if i == 0:
            sd[b + "0.SelfAttention.relative_attention_bias.weight"] = f.w(32, heads)
        sd[b + "0.layer_norm.weight"] = f.ones(width)
        w(b + "1.DenseReluDense.wi_0", ff, width)
        w(b + "1.DenseReluDense.wi_1", ff, width)
        w(b + "1.DenseReluDense.wo", width, ff)
        sd[b + "1.layer_norm.weight"] = f.ones(width)
    sd[prefix + "encoder.final_layer_norm.weight"] = f.ones(width)
    return sd


def synth_chroma_sd(
    hidden: int = 3072,
    num_heads: int = 24,
    depth: int = 19,
    depth_single: int = 38,
    context_dim: int = 4096,
    approx_hidden: int = 5120,
    approx_layers: int = 5,
    fill: str = "zeros",
    seed: int = 8,
    prefix: str = "model.diffusion_model.",
):
    """Chroma-format state dict: flux blocks minus per-block modulation lins,
    plus the distilled_guidance_layer Approximator."""
    sd = synth_flux_sd(hidden=hidden, num_heads=num_heads, depth=depth,
                       depth_single=depth_single, context_dim=context_dim,
                       pooled_dim=16, guidance=False, fill=fill, seed=seed,
                       prefix=prefix)
    # strip flux-only modulation/vector/time paths
    for k in list(sd):
        if any(t in k for t in ("img_mod.lin", "txt_mod.lin", "modulation.lin",
                                 "time_in.", "vector_in.", "adaLN_modulation")):
            del sd[k]
    f = _Fill(fill, seed + 1)
    mod_len = depth * 12 + depth_single * 3 + 2
    g = prefix + "distilled_guidance_layer."
    sd[g + "in_proj.weight"] = f.w(approx_hidden, 64)
    sd[g + "in_proj.bias"] = f.zeros(approx_hidden)
    for i in range(approx_layers):
        sd[g + f"layers.{i}.in_layer.weight"] = f.w(approx_hidden, approx_hidden)
        sd[g + f"layers.{i}.in_layer.bias"] = f.zeros(approx_hidden)
        sd[g + f"layers.{i}.out_layer.weight"] = f.w(approx_hidden, approx_hidden)
        sd[g + f"layers.{i}.out_layer.bias"] = f.zeros(approx_hidden)
        sd[g + f"norms.{i}.scale"] = f.ones(approx_hidden)
    sd[g + "out_proj.weight"] = f.w(hidden, approx_hidden)
    sd[g + "out_proj.bias"] = f.zeros(hidden)
    return sd


def synth_controlnet_sd(
    model_channels: int = 320,
    channel_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    transformer_depth: Sequence[int] = (0, 2, 10),
    context_dim: int = 2048,
    adm_in_channels: Optional[int] = 2816,
    fill: str = "zeros",
    seed: int = 7,
) -> Dict[str, np.ndarray]:
    """Full-size cldm ControlNet state dict (SDXL geometry by default):
    the UNet encoder copy + zero convs + canonical 8-conv hint ladder
    (reference backend/nn/cnets/cldm.py:7 ControlNet.__init__)."""
    f = _Fill(fill, seed)
    sd = {
        k: v for k, v in synth_unet_sd(
            model_channels=model_channels, channel_mult=channel_mult,
            num_res_blocks=num_res_blocks, transformer_depth=transformer_depth,
            context_dim=context_dim, adm_in_channels=adm_in_channels,
            fill=fill, seed=seed, prefix="",
        ).items()
        if k.startswith(("time_embed", "label_emb", "input_blocks", "middle_block"))
    }

    def conv(key, o, i, k=3):
        sd[key + ".weight"] = f.w(o, i, k, k)
        sd[key + ".bias"] = f.zeros(o)

    # per-input-block output channels: conv_in, then res blocks + downsamples
    chans = [model_channels]
    ch = model_channels
    for li, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch = model_channels * mult
            chans.append(ch)
        if li != len(channel_mult) - 1:
            chans.append(ch)  # downsample block keeps channels
    for i, c in enumerate(chans):
        conv(f"zero_convs.{i}.0", c, c, 1)
    conv("middle_block_out.0", ch, ch, 1)
    ladder = [(16, 3, 1), (16, 16, 1), (32, 16, 2), (32, 32, 1),
              (96, 32, 2), (96, 96, 1), (256, 96, 2), (model_channels, 256, 1)]
    for pos, (o, i, _s) in enumerate(ladder):
        conv(f"input_hint_block.{pos * 2}", o, i)
    return sd


def synth_chatglm_sd(
    hidden: int = 4096,
    layers: int = 28,
    vocab: int = 65024,
    kv_groups: int = 2,
    ffn: Optional[int] = None,
    head_dim: int = 128,
    fill: str = "zeros",
    seed: int = 9,
    prefix: str = "text_encoders.chatglm.",
) -> Dict[str, np.ndarray]:
    """ChatGLM3-format state dict (Kolors text encoder; THUDM chatglm3-6b
    defaults — pass smaller dims for tests; hidden must be a multiple of
    head_dim)."""
    f = _Fill(fill, seed)
    ffn = ffn or int(hidden * 8 / 3 // 128 * 128) or hidden * 2
    sd = {prefix + "transformer.embedding.word_embeddings.weight": f.w(vocab, hidden)}
    kv_dim = kv_groups * head_dim
    for i in range(layers):
        b = f"{prefix}transformer.encoder.layers.{i}."
        sd[b + "input_layernorm.weight"] = f.ones(hidden)
        sd[b + "self_attention.query_key_value.weight"] = f.w(hidden + 2 * kv_dim, hidden)
        sd[b + "self_attention.query_key_value.bias"] = f.zeros(hidden + 2 * kv_dim)
        sd[b + "self_attention.dense.weight"] = f.w(hidden, hidden)
        sd[b + "post_attention_layernorm.weight"] = f.ones(hidden)
        sd[b + "mlp.dense_h_to_4h.weight"] = f.w(ffn * 2, hidden)
        sd[b + "mlp.dense_4h_to_h.weight"] = f.w(hidden, ffn)
    sd[prefix + "transformer.encoder.final_layernorm.weight"] = f.ones(hidden)
    return sd
