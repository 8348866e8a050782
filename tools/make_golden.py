"""Regenerate tests/golden/*.npz from the REFERENCE torch implementation.

Runs only where /root/reference is mounted: instantiates the reference's
IntegratedUNet2DConditionModel / IntegratedAutoencoderKL on CPU torch with
light stubs for their unused heavyweight deps, strict-loads the SAME tiny
synthetic state dicts the test suite uses (tests/fixtures.py — strict load
doubles as a key-layout compatibility proof), and records forward outputs.
tests/test_golden_parity.py then gates our JAX implementations at
PSNR ≥ 40 dB against these (measured: UNet 108 dB, VAE 123 dB)."""

import sys
import types

import numpy as np


def _stub_reference_deps():
    sp = types.ModuleType("sentencepiece")
    sp.SentencePieceProcessor = object
    sys.modules["sentencepiece"] = sp
    d = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:  # noqa: D401
        pass

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = lambda fn: fn
    sys.modules.update({"diffusers": d, "diffusers.configuration_utils": cu})
    sys.argv = [sys.argv[0], "--always-cpu"]
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/packages_3rdparty")


def main():
    _stub_reference_deps()
    import torch

    from backend.nn.unet import IntegratedUNet2DConditionModel
    from backend.nn.vae import IntegratedAutoencoderKL

    sys.path.insert(0, "tests")
    from fixtures import CTX, MODEL_CH, VAE_CH, make_unet_sd, make_vae_sd

    # -- UNet -------------------------------------------------------------
    sd = make_unet_sd(prefix="", seed=1)
    model = IntegratedUNet2DConditionModel(
        in_channels=4, model_channels=MODEL_CH, out_channels=4,
        num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
        use_spatial_transformer=True, transformer_depth=[1, 0],
        transformer_depth_output=[1, 1, 0, 0], transformer_depth_middle=1,
        context_dim=CTX)
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    model.eval().float()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    t = np.asarray([5.0, 900.0], np.float32)
    ctx = rng.standard_normal((2, 9, CTX)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    np.savez("tests/golden/unet_sd15_tiny.npz", x=x, t=t, ctx=ctx, ref=ref)
    print("unet golden written", ref.shape)

    # -- VAE --------------------------------------------------------------
    vsd = make_vae_sd(prefix="", seed=2)
    vae = IntegratedAutoencoderKL(
        block_out_channels=(VAE_CH, 2 * VAE_CH, 2 * VAE_CH, 2 * VAE_CH),
        layers_per_block=1)
    missing, unexpected = vae.load_state_dict(
        {k: torch.tensor(v) for k, v in vsd.items()}, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    vae.eval().float()
    rng = np.random.default_rng(9)
    z = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    img = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        dec = vae.decode(torch.tensor(z)).numpy()
        enc = vae.quant_conv(vae.encoder(torch.tensor(img))).numpy()
    np.savez("tests/golden/vae_sd15_tiny.npz", z=z, img=img, dec=dec,
             enc_moments=enc)
    print("vae golden written", dec.shape)

    # -- CLIP text encoder (HF transformers is the reference implementation
    # the reference wraps — classic_engine.py builds on CLIPTextModel) ------
    from transformers import CLIPTextConfig, CLIPTextModel

    from fixtures import CLIP_LAYERS, CLIP_WIDTH, VOCAB, make_clip_sd

    csd = make_clip_sd(prefix="", seed=3)
    ccfg = CLIPTextConfig(vocab_size=VOCAB, hidden_size=CLIP_WIDTH,
                          intermediate_size=CLIP_WIDTH * 4,
                          num_hidden_layers=CLIP_LAYERS,
                          num_attention_heads=4, max_position_embeddings=77,
                          hidden_act="quick_gelu", eos_token_id=VOCAB - 1)
    clip = CLIPTextModel(ccfg)
    clip.load_state_dict({k: torch.tensor(v) for k, v in csd.items()},
                         strict=False)
    clip.eval()
    rng = np.random.default_rng(11)
    toks = rng.integers(0, VOCAB - 1, (2, 77)).astype(np.int64)
    toks[:, -1] = VOCAB - 1
    with torch.no_grad():
        out = clip(torch.tensor(toks), output_hidden_states=True)
    np.savez("tests/golden/clip_sd15_tiny.npz", toks=toks,
             ref=out.last_hidden_state.numpy(),
             pooled=out.pooler_output.numpy(),
             hidden_m2=out.hidden_states[-2].numpy())
    print("clip golden written", out.last_hidden_state.shape)

    # -- T5 encoder (HF is the implementation the reference wraps) --------
    from transformers import T5Config, T5EncoderModel

    from forge_tpu.core.synth import synth_flux_sd, synth_t5_sd

    tsd = synth_t5_sd(width=64, layers=2, heads=4, ff=128, vocab=100,
                      fill="random", seed=24, prefix="")
    tcfg = T5Config(d_model=64, num_layers=2, num_heads=4, d_kv=64, d_ff=128,
                    vocab_size=100, feed_forward_proj="gated-gelu",
                    dense_act_fn="gelu_new", is_gated_act=True,
                    tie_word_embeddings=False)
    t5 = T5EncoderModel(tcfg)
    t5.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in tsd.items()},
                       strict=False)  # embed_tokens ties to shared
    t5.eval()
    rng = np.random.default_rng(13)
    toks = rng.integers(0, 100, (2, 32)).astype(np.int64)
    mask = np.ones((2, 32), np.int64)
    mask[1, 20:] = 0
    with torch.no_grad():
        ref = t5(torch.tensor(toks),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    np.savez("tests/golden/t5_tiny.npz", toks=toks, mask=mask, ref=ref)
    print("t5 golden written", ref.shape)

    # -- Flux transformer (reference backend/nn/flux.py) ------------------
    from backend.nn.flux import IntegratedFluxTransformer2DModel

    fsd = synth_flux_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                        context_dim=64, pooled_dim=64, fill="random",
                        seed=21, prefix="")
    flux = IntegratedFluxTransformer2DModel(
        in_channels=16, vec_in_dim=64, context_in_dim=64, hidden_size=64,
        mlp_ratio=4.0, num_heads=4, depth=2, depth_single_blocks=2,
        axes_dim=[4, 6, 6], theta=10000, qkv_bias=True, guidance_embed=True)
    missing, unexpected = flux.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in fsd.items()}, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    flux.eval().float()
    rng = np.random.default_rng(17)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 12, 64)).astype(np.float32)
    yv = rng.standard_normal((1, 64)).astype(np.float32)
    t = np.asarray([0.35], np.float32)
    gd = np.asarray([4.0], np.float32)
    with torch.no_grad():
        ref = flux(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                   torch.tensor(yv), guidance=torch.tensor(gd)).numpy()
    np.savez("tests/golden/flux_tiny.npz", x=x, ctx=ctx, y=yv, t=t, g=gd, ref=ref)
    print("flux golden written", ref.shape)

    # -- SD3 MMDiTX (reference backend/nn/mmditx.py) ----------------------
    from backend.nn.mmditx import MMDiTX

    from forge_tpu.core.synth import synth_mmdit_sd

    msd = synth_mmdit_sd(hidden=64, depth=1, context_dim=32, pooled_dim=48,
                         in_channels=16, pos_max=8, fill="random", seed=31,
                         prefix="")
    mm = MMDiTX(patch_size=2, in_channels=16, depth=1, adm_in_channels=48,
                context_embedder_config={
                    "target": "torch.nn.Linear",
                    "params": {"in_features": 32, "out_features": 64}},
                pos_embed_max_size=8, num_patches=64)
    missing, unexpected = mm.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in msd.items()}, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    mm.eval().float()
    rng = np.random.default_rng(19)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    t = np.asarray([350.0], np.float32)
    ctx = rng.standard_normal((1, 10, 32)).astype(np.float32)
    yv = rng.standard_normal((1, 48)).astype(np.float32)
    with torch.no_grad():
        ref = mm(torch.tensor(x), torch.tensor(t), y=torch.tensor(yv),
                 context=torch.tensor(ctx)).numpy()
    np.savez("tests/golden/mmdit_tiny.npz", x=x, t=t, ctx=ctx, y=yv, ref=ref)
    print("mmdit golden written", ref.shape)

    # -- Chroma (reference backend/nn/chroma.py) --------------------------
    from backend.nn.chroma import IntegratedChromaTransformer2DModel

    from forge_tpu.core.synth import synth_chroma_sd

    csd2 = synth_chroma_sd(hidden=64, num_heads=4, depth=2, depth_single=2,
                           context_dim=32, approx_hidden=64, approx_layers=2,
                           fill="random", seed=8, prefix="")
    ch = IntegratedChromaTransformer2DModel(
        in_channels=16, vec_in_dim=16, context_in_dim=32, hidden_size=64,
        mlp_ratio=4.0, num_heads=4, depth=2, depth_single_blocks=2,
        axes_dim=[4, 6, 6], theta=10000, qkv_bias=True,
        guidance_out_dim=64, guidance_hidden_dim=64, guidance_n_layers=2)
    missing, unexpected = ch.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in csd2.items()}, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    ch.eval().float()
    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    ctx = rng.standard_normal((1, 12, 32)).astype(np.float32)
    with torch.no_grad():
        ref = ch(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    np.savez("tests/golden/chroma_tiny.npz", x=x, t=t, ctx=ctx, ref=ref)
    print("chroma golden written", ref.shape)


if __name__ == "__main__":
    main()
