"""Synthetic tiny checkpoints in reference key format (the analog of upstream
A1111's empty.pt test checkpoint, SURVEY.md §4): random weights, real key
names/shapes, small dims — exercises the loader, guesser, and full pipeline
without real model files."""

from __future__ import annotations

import numpy as np

# tiny SD1.5-shaped config
MODEL_CH = 32
CTX = 64
CLIP_WIDTH = 64
CLIP_LAYERS = 2
CLIP_HEADS = 4
VAE_CH = 32
VOCAB = 49408


def _rng(seed=0):
    return np.random.default_rng(seed)


def _conv(r, o, i, k=3):
    return (r.standard_normal((o, i, k, k)) * 0.02).astype(np.float32)


def _lin(r, o, i):
    return (r.standard_normal((o, i)) * 0.02).astype(np.float32)


def _norm(o):
    return np.ones(o, np.float32), np.zeros(o, np.float32)


def make_unet_sd(prefix="model.diffusion_model.", seed=1):
    """Tiny SD1.5-structured UNet: model_channels 32, mult (1,2), 1 res block
    per level, attention at level 0 only + middle, context 64."""
    r = _rng(seed)
    sd = {}

    def add_norm(key, ch):
        w, b = _norm(ch)
        sd[key + ".weight"] = w
        sd[key + ".bias"] = b

    def add_lin(key, o, i, bias=True):
        sd[key + ".weight"] = _lin(r, o, i)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def add_conv(key, o, i, k=3):
        sd[key + ".weight"] = _conv(r, o, i, k)
        sd[key + ".bias"] = np.zeros(o, np.float32)

    emb = MODEL_CH * 4
    add_lin(prefix + "time_embed.0", emb, MODEL_CH)
    add_lin(prefix + "time_embed.2", emb, emb)

    def resblock(key, cin, cout):
        add_norm(key + ".in_layers.0", cin)
        add_conv(key + ".in_layers.2", cout, cin)
        add_lin(key + ".emb_layers.1", cout, emb)
        add_norm(key + ".out_layers.0", cout)
        add_conv(key + ".out_layers.3", cout, cout)
        if cin != cout:
            add_conv(key + ".skip_connection", cout, cin, 1)

    def transformer(key, ch):
        add_norm(key + ".norm", ch)
        add_conv(key + ".proj_in", ch, ch, 1)
        tb = key + ".transformer_blocks.0"
        for an, ctx in (("attn1", ch), ("attn2", CTX)):
            add_lin(f"{tb}.{an}.to_q", ch, ch, bias=False)
            add_lin(f"{tb}.{an}.to_k", ch, ctx, bias=False)
            add_lin(f"{tb}.{an}.to_v", ch, ctx, bias=False)
            add_lin(f"{tb}.{an}.to_out.0", ch, ch)
        add_norm(tb + ".norm1", ch)
        add_norm(tb + ".norm2", ch)
        add_norm(tb + ".norm3", ch)
        add_lin(tb + ".ff.net.0.proj", ch * 8, ch)
        add_lin(tb + ".ff.net.2", ch, ch * 4)
        add_conv(key + ".proj_out", ch, ch, 1)

    ch1, ch2 = MODEL_CH, MODEL_CH * 2
    # input blocks: 0 stem; 1 res+attn @ch1; 2 downsample; 3 res @ch2
    add_conv(prefix + "input_blocks.0.0", ch1, 4)
    resblock(prefix + "input_blocks.1.0", ch1, ch1)
    transformer(prefix + "input_blocks.1.1", ch1)
    add_conv(prefix + "input_blocks.2.0.op", ch1, ch1)
    resblock(prefix + "input_blocks.3.0", ch1, ch2)

    resblock(prefix + "middle_block.0", ch2, ch2)
    transformer(prefix + "middle_block.1", ch2)
    resblock(prefix + "middle_block.2", ch2, ch2)

    # output blocks (mirror): 0 res @ch2(+skip ch2); 1 res + upsample; 2/3 res+attn @ch1
    resblock(prefix + "output_blocks.0.0", ch2 + ch2, ch2)
    resblock(prefix + "output_blocks.1.0", ch2 + ch1, ch2)
    sd[prefix + "output_blocks.1.1.conv.weight"] = _conv(r, ch2, ch2)
    sd[prefix + "output_blocks.1.1.conv.bias"] = np.zeros(ch2, np.float32)
    resblock(prefix + "output_blocks.2.0", ch2 + ch1, ch1)
    transformer(prefix + "output_blocks.2.1", ch1)
    resblock(prefix + "output_blocks.3.0", ch1 + ch1, ch1)
    transformer(prefix + "output_blocks.3.1", ch1)

    add_norm(prefix + "out.0", ch1)
    add_conv(prefix + "out.2", 4, ch1)
    return sd


def make_vae_sd(prefix="first_stage_model.", seed=2):
    r = _rng(seed)
    sd = {}

    def add_norm(key, ch):
        w, b = _norm(ch)
        sd[key + ".weight"] = w
        sd[key + ".bias"] = b

    def add_conv(key, o, i, k=3):
        sd[key + ".weight"] = _conv(r, o, i, k)
        sd[key + ".bias"] = np.zeros(o, np.float32)

    def res(key, cin, cout):
        add_norm(key + ".norm1", cin)
        add_conv(key + ".conv1", cout, cin)
        add_norm(key + ".norm2", cout)
        add_conv(key + ".conv2", cout, cout)
        if cin != cout:
            add_conv(key + ".nin_shortcut", cout, cin, 1)

    def attn(key, ch):
        add_norm(key + ".norm", ch)
        for n in ("q", "k", "v", "proj_out"):
            add_conv(key + "." + n, ch, ch, 1)

    c1, c2 = VAE_CH, VAE_CH * 2
    e = prefix + "encoder."
    add_conv(e + "conv_in", c1, 3)
    res(e + "down.0.block.0", c1, c1)
    add_conv(e + "down.0.downsample.conv", c1, c1)
    res(e + "down.1.block.0", c1, c2)
    add_conv(e + "down.1.downsample.conv", c2, c2)
    res(e + "down.2.block.0", c2, c2)
    add_conv(e + "down.2.downsample.conv", c2, c2)
    res(e + "down.3.block.0", c2, c2)
    res(e + "mid.block_1", c2, c2)
    attn(e + "mid.attn_1", c2)
    res(e + "mid.block_2", c2, c2)
    add_norm(e + "norm_out", c2)
    add_conv(e + "conv_out", 8, c2)

    d = prefix + "decoder."
    add_conv(d + "conv_in", c2, 4)
    res(d + "mid.block_1", c2, c2)
    attn(d + "mid.attn_1", c2)
    res(d + "mid.block_2", c2, c2)
    res(d + "up.3.block.0", c2, c2)
    res(d + "up.3.block.1", c2, c2)
    add_conv(d + "up.3.upsample.conv", c2, c2)
    res(d + "up.2.block.0", c2, c2)
    res(d + "up.2.block.1", c2, c2)
    add_conv(d + "up.2.upsample.conv", c2, c2)
    res(d + "up.1.block.0", c2, c2)
    res(d + "up.1.block.1", c2, c2)
    add_conv(d + "up.1.upsample.conv", c2, c2)
    res(d + "up.0.block.0", c2, c1)
    res(d + "up.0.block.1", c1, c1)
    add_norm(d + "norm_out", c1)
    add_conv(d + "conv_out", 3, c1)

    sd[prefix + "quant_conv.weight"] = _conv(r, 8, 8, 1)
    sd[prefix + "quant_conv.bias"] = np.zeros(8, np.float32)
    sd[prefix + "post_quant_conv.weight"] = _conv(r, 4, 4, 1)
    sd[prefix + "post_quant_conv.bias"] = np.zeros(4, np.float32)
    return sd


def make_clip_sd(prefix="cond_stage_model.transformer.", seed=3,
                 width=CLIP_WIDTH, layers=CLIP_LAYERS, vocab=VOCAB):
    r = _rng(seed)
    sd = {}
    tm = prefix + "text_model."
    sd[tm + "embeddings.token_embedding.weight"] = (
        r.standard_normal((vocab, width)) * 0.02
    ).astype(np.float32)
    sd[tm + "embeddings.position_embedding.weight"] = (
        r.standard_normal((77, width)) * 0.01
    ).astype(np.float32)
    for i in range(layers):
        base = f"{tm}encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[base + f"self_attn.{n}.weight"] = _lin(r, width, width)
            sd[base + f"self_attn.{n}.bias"] = np.zeros(width, np.float32)
        for n in ("layer_norm1", "layer_norm2"):
            w, b = _norm(width)
            sd[base + n + ".weight"] = w
            sd[base + n + ".bias"] = b
        sd[base + "mlp.fc1.weight"] = _lin(r, width * 4, width)
        sd[base + "mlp.fc1.bias"] = np.zeros(width * 4, np.float32)
        sd[base + "mlp.fc2.weight"] = _lin(r, width, width * 4)
        sd[base + "mlp.fc2.bias"] = np.zeros(width, np.float32)
    w, b = _norm(width)
    sd[tm + "final_layer_norm.weight"] = w
    sd[tm + "final_layer_norm.bias"] = b
    return sd


def make_sd15_checkpoint(seed=0):
    sd = {}
    sd.update(make_unet_sd(seed=seed + 1))
    sd.update(make_vae_sd(seed=seed + 2))
    sd.update(make_clip_sd(seed=seed + 3))
    return sd


def make_tiny_engine(seed=0):
    """Full tiny engine (loader path) with config fixed for the small dims."""
    import jax.numpy as jnp

    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.models.unet import UNetConfig

    eng = load_engine(make_sd15_checkpoint(seed), dtype=jnp.float32)
    eng.unet_cfg = UNetConfig(context_dim=CLIP_WIDTH, num_heads=4)
    return eng
