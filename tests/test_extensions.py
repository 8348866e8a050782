"""Extension-ABI tests: FreeU hooks, MultiDiffusion tiling math, masking
geometry, IP-Adapter projection + hook plumbing, script lifecycle."""

import numpy as np
import pytest

import jax.numpy as jnp

from fixtures import CTX, make_tiny_engine

from forge_tpu.pipeline.processing import Processing, process_images


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def test_freeu_changes_output(engine):
    from forge_tpu.extensions.freeu import build_freeu_hooks

    base = process_images(engine, Processing(prompt="cat", seed=9, steps=2, width=32, height=32)).images[0]
    hooks = build_freeu_hooks(model_channels=32, b1=1.4, b2=1.6, s1=0.5, s2=0.5)
    p = Processing(prompt="cat", seed=9, steps=2, width=32, height=32, unet_hooks=hooks)
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out)
    assert np.isfinite(out.astype(np.float32)).all()


def test_fourier_filter_identity():
    from forge_tpu.extensions.freeu import fourier_filter

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 4)), jnp.float32)
    out = fourier_filter(x, threshold=1, scale=1.0)
    assert np.allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_multidiffusion_matches_untiled_for_linear_model():
    from forge_tpu.sampling.tiled import make_tiled_apply, split_bboxes

    assert split_bboxes(64, 96, 32) == [0]
    assert split_bboxes(128, 96, 32) == [0, 32]

    # a spatially-local model (scalar multiply) must be exactly preserved
    def apply_model(x, sigma, cond):
        return x * 0.5

    tiled = make_tiled_apply(apply_model, 16, 16, tile=8, overlap=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 16, 4)), jnp.float32)
    out = tiled(x, jnp.asarray(1.0), {})
    assert np.allclose(np.asarray(out), np.asarray(x) * 0.5, atol=1e-5)


def test_masking_geometry():
    from forge_tpu.pipeline.masking import expand_crop_region, get_crop_region

    mask = np.zeros((100, 200), np.float32)
    mask[40:60, 150:170] = 1
    region = get_crop_region(mask, pad=4)
    assert region == (146, 36, 174, 64)
    expanded = expand_crop_region(region, 64, 64, 200, 100)
    x1, y1, x2, y2 = expanded
    assert (x2 - x1) == (y2 - y1)  # square aspect
    assert 0 <= x1 and x2 <= 200 and 0 <= y1 and y2 <= 100


def test_ip_adapter_hooks(engine):
    # synthetic simple (non-plus) adapter matched to the tiny UNet (ctx 64)
    rng = np.random.default_rng(3)
    ctx_dim, embed_dim, n_tokens = CTX, 32, 4
    adapter = {
        "image_proj": {
            "proj": {"weight": jnp.asarray(rng.standard_normal((ctx_dim * n_tokens, embed_dim)), jnp.float32),
                     "bias": jnp.zeros((ctx_dim * n_tokens,), jnp.float32)},
            "norm": {"weight": jnp.ones((ctx_dim,), jnp.float32),
                     "bias": jnp.zeros((ctx_dim,), jnp.float32)},
        },
        "ip_adapter": {
            "1": {"to_k_ip": {"weight": jnp.asarray(rng.standard_normal((32, ctx_dim)) * 0.1, jnp.float32)},
                  "to_v_ip": {"weight": jnp.asarray(rng.standard_normal((32, ctx_dim)) * 0.1, jnp.float32)}},
        },
    }
    from forge_tpu.pipeline.ipadapter import IPAdapterState, project_image_embeds

    embeds = jnp.asarray(rng.standard_normal((1, embed_dim)), jnp.float32)
    tokens = project_image_embeds(adapter, embeds)
    assert tokens.shape == (1, n_tokens, ctx_dim)

    hooks = IPAdapterState(adapter, tokens, weight=1.0).build_hooks()
    base = process_images(engine, Processing(prompt="cat", seed=4, steps=2, width=32, height=32)).images[0]
    out = process_images(engine, Processing(prompt="cat", seed=4, steps=2, width=32, height=32,
                                            unet_hooks=hooks)).images[0]
    assert not np.array_equal(base, out)


def test_script_lifecycle(engine):
    from forge_tpu.runtime.scripts import Script, ScriptRunner

    calls = []

    class Probe(Script):
        name = "probe"

        def process(self, p):
            calls.append("process")

        def process_before_every_sampling(self, p, **kw):
            calls.append("before_sampling")

        def postprocess_image(self, p, image, **kw):
            calls.append("post_image")
            return np.zeros_like(image)

        def postprocess(self, p, processed):
            calls.append("postprocess")

    runner = ScriptRunner()
    runner.register(Probe())
    r = process_images(engine, Processing(prompt="cat", seed=5, steps=2, width=32, height=32,
                                          scripts=runner))
    assert calls == ["process", "before_sampling", "post_image", "postprocess"]
    assert np.all(r.images[0] == 0)  # postprocess_image replaced the output


def test_stealth_infotext_roundtrip():
    from forge_tpu.pipeline.stealth_infotext import add_stealth_infotext, read_stealth_infotext

    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    text = "a cat\nSteps: 20, Sampler: Euler a, Seed: 42"
    rgba = add_stealth_infotext(img, text)
    assert rgba.shape == (64, 64, 4)
    assert read_stealth_infotext(rgba) == text
    assert read_stealth_infotext(np.concatenate([img, np.full((64, 64, 1), 255, np.uint8)], -1)) is None


def test_memory_plan():
    from forge_tpu.runtime.memory import plan_generation

    plan = plan_generation(batch=8, height=1024, width=1024,
                           weight_bytes=5 << 30, free_bytes=10 << 30)
    assert 1 <= plan.batch_chunk <= 8
    small = plan_generation(batch=1, height=512, width=512,
                            weight_bytes=2 << 30, free_bytes=12 << 30)
    assert small.batch_chunk == 1 and not small.tiled_vae


def test_sag_changes_output(engine):
    from forge_tpu.extensions.sag import build_sag

    base = process_images(engine, Processing(prompt="cat", seed=6, steps=2,
                                             width=32, height=32)).images[0]
    cond = engine.get_learned_conditioning(["cat"], 32, 32)
    hooks, post_cfg = build_sag(engine, cond, sag_scale=1.0)
    p = Processing(prompt="cat", seed=6, steps=2, width=32, height=32,
                   unet_hooks=hooks, post_cfg_hooks=[post_cfg])
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out)
    assert np.isfinite(out.astype(np.float32)).all()


def test_pag_changes_output(engine):
    from forge_tpu.extensions.pag import build_pag_post_cfg

    base = process_images(engine, Processing(prompt="cat", seed=8, steps=2,
                                             width=32, height=32)).images[0]
    cond = engine.get_learned_conditioning(["cat"], 32, 32)
    post_cfg = build_pag_post_cfg(engine, cond, pag_scale=2.0)
    p = Processing(prompt="cat", seed=8, steps=2, width=32, height=32,
                   post_cfg_hooks=[post_cfg])
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out)
    assert np.isfinite(out.astype(np.float32)).all()


def test_xyz_grid(engine):
    from forge_tpu.extensions.xyz_grid import Axis, run_xyz_grid

    base = Processing(prompt="a cat", seed=1, steps=2, width=32, height=32)
    grids = run_xyz_grid(
        engine, base,
        x_axis=Axis("seed", [1, 2]),
        y_axis=Axis("cfg_scale", [3.0, 7.0]),
        draw_legends=False,
    )
    assert len(grids) == 1
    assert grids[0].shape == (64, 64, 3)
    # different seeds along X produce different tiles
    assert not np.array_equal(grids[0][:32, :32], grids[0][:32, 32:])


# -- round-2 extension batch: dynamic thresholding, stylealign, kohya hrfix,
#    soft inpainting (reference extensions-builtin/sd_forge_* twins)


def test_dynthresh_constant_mimic_equals_cfg():
    """With mimic == cfg and Constant modes, dynthresh must be ~the plain
    CFG combine (the rescale is a no-op when targets coincide)."""
    from forge_tpu.extensions.dynamic_thresholding import build_dynthresh_cfg_fn

    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    uncond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    fn = build_dynthresh_cfg_fn(mimic_scale=7.0)
    out = np.asarray(fn(cond, uncond, None, jnp.asarray(1.0), jnp.asarray(7.0)))
    ref = np.asarray(uncond + 7.0 * (cond - uncond))
    assert np.allclose(out, ref, atol=1e-3)


def test_dynthresh_limits_variability():
    """High cfg with low mimic: result variability matches the mimic target's,
    not the raw CFG's (the point of the extension)."""
    from forge_tpu.extensions.dynamic_thresholding import build_dynthresh_cfg_fn

    rng = np.random.default_rng(4)
    cond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    uncond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    fn = build_dynthresh_cfg_fn(mimic_scale=3.0, variability_measure="STD")
    out = np.asarray(fn(cond, uncond, None, jnp.asarray(1.0), jnp.asarray(30.0)))
    raw = np.asarray(uncond + 30.0 * (cond - uncond))
    mim = np.asarray(uncond + 3.0 * (cond - uncond))
    assert out.std() < raw.std() * 0.5
    assert abs(out.std() - mim.std()) < mim.std() * 0.35


def test_dynthresh_e2e(engine):
    from forge_tpu.extensions.dynamic_thresholding import attach as attach_dt

    base = process_images(engine, Processing(prompt="cat", seed=11, steps=2,
                                             width=32, height=32)).images[0]
    p = Processing(prompt="cat", seed=11, steps=2, width=32, height=32, cfg_scale=15.0)
    attach_dt(p, {"mimic_scale": 4.0})
    out = process_images(engine, p).images[0]
    assert np.isfinite(out.astype(np.float32)).all()
    assert not np.array_equal(base, out)
    assert "Mimic scale" in p.extra_generation_params


def test_stylealign_shares_attention(engine):
    from forge_tpu.extensions.stylealign import attach as attach_sa

    p0 = Processing(prompt="cat", seed=21, steps=2, width=32, height=32, batch_size=2)
    base = process_images(engine, p0).images

    p = Processing(prompt="cat", seed=21, steps=2, width=32, height=32, batch_size=2)
    attach_sa(p, {"shared_attention": True, "strength": 1.0})
    out = process_images(engine, p).images
    assert len(out) == 2
    assert not np.array_equal(base[0], out[0])
    assert p.extra_generation_params["StyleAlign enabled"] == "True"


def test_kohya_hrfix_phases(engine):
    from forge_tpu.extensions.kohya_hrfix import attach as attach_kohya

    base = process_images(engine, Processing(prompt="cat", seed=31, steps=4,
                                             width=64, height=64)).images[0]
    p = Processing(prompt="cat", seed=31, steps=4, width=64, height=64)
    attach_kohya(p, {"block_number": 1, "downscale_factor": 2.0, "end_percent": 0.5})
    out = process_images(engine, p).images[0]
    assert out.shape == base.shape
    assert np.isfinite(out.astype(np.float32)).all()
    assert not np.array_equal(base, out)


def test_soft_inpainting_latent_blend():
    from forge_tpu.extensions.soft_inpainting import (
        SoftInpaintingSettings, get_modified_nmask, latent_blend)

    s = SoftInpaintingSettings()
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    # t=0 → a; t=1 → b (endpoints exact up to magnitude renorm epsilon)
    t0 = jnp.zeros((1, 8, 8, 1))
    t1 = jnp.ones((1, 8, 8, 1))
    assert np.allclose(np.asarray(latent_blend(s, a, b, t0)), np.asarray(a), atol=1e-3)
    assert np.allclose(np.asarray(latent_blend(s, a, b, t1)), np.asarray(b), atol=1e-3)
    # σ-schedule: higher σ → more transparent (denoiser dominates)
    m = jnp.full((1, 8, 8, 1), 0.5)
    hi = np.asarray(get_modified_nmask(s, m, jnp.asarray(10.0)))
    lo = np.asarray(get_modified_nmask(s, m, jnp.asarray(0.1)))
    assert hi.mean() < lo.mean()  # 0.5^(10·0.5) << 0.5^(0.1·0.5)


def test_soft_inpainting_e2e(engine):
    from forge_tpu.extensions.soft_inpainting import attach as attach_soft

    img = np.full((32, 32, 3), 128, np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    p = Processing(prompt="cat", seed=41, steps=3, width=32, height=32,
                   init_images=[img], inpaint_mask=mask, denoising_strength=0.8)
    attach_soft(p, {"Schedule bias": 1.0, "Preservation strength": 0.5})
    out = process_images(engine, p).images[0]
    assert np.isfinite(out.astype(np.float32)).all()
    assert p.extra_generation_params["Soft inpainting"] == "True"


def test_latent_modifier_tonemap_modes():
    from forge_tpu.extensions.latent_modifier import (
        LatentModifierSpec, build_latent_modifier_cfg_fn)

    rng = np.random.default_rng(7)
    cond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)) * 5, jnp.float32)
    uncond = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    for method in ("reinhard", "reinhard_perchannel", "arctan", "quantile",
                   "cfg-mimic", "spatial-norm"):
        spec = LatentModifierSpec(tonemap_multiplier=1.0, tonemap_method=method)
        fn = build_latent_modifier_cfg_fn(spec)
        out = np.asarray(fn(cond, uncond, None, jnp.asarray(1.0), jnp.asarray(7.0)))
        assert np.isfinite(out).all(), method
    # multiplier 0 → plain CFG
    fn = build_latent_modifier_cfg_fn(LatentModifierSpec())
    out = np.asarray(fn(cond, uncond, None, jnp.asarray(1.0), jnp.asarray(7.0)))
    ref = np.asarray(uncond + 7.0 * (cond - uncond))
    assert np.allclose(out, ref, atol=1e-4)


def test_latent_modifier_rejects_unported_noise():
    from forge_tpu.extensions.latent_modifier import LatentModifierSpec

    with pytest.raises(ValueError):
        LatentModifierSpec(extra_noise_multiplier=1.0, extra_noise_type="perlin")


def test_latent_modifier_e2e(engine):
    from forge_tpu.extensions.latent_modifier import attach as attach_lm

    base = process_images(engine, Processing(prompt="cat", seed=13, steps=2,
                                             width=32, height=32)).images[0]
    p = Processing(prompt="cat", seed=13, steps=2, width=32, height=32)
    attach_lm(p, {"tonemap_multiplier": 1.2, "tonemap_method": "reinhard",
                  "combat_cfg_drift": 0.5})
    out = process_images(engine, p).images[0]
    assert np.isfinite(out.astype(np.float32)).all()
    assert not np.array_equal(base, out)


def _tiny_lllite_sd(in_dim=32, mlp=8, ce=16):
    """Synthetic ControlLLLite checkpoint: one module on input block 1 attn1
    to_q, linear (SDXL-style), depth 1, HWIO conv layout."""
    rng = np.random.default_rng(8)
    pre = "lllite_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"
    f32 = np.float32
    return {
        f"{pre}.conditioning1.0.weight": rng.standard_normal((4, 4, 3, ce // 2)).astype(f32) * 0.1,
        f"{pre}.conditioning1.0.bias": np.zeros(ce // 2, f32),
        f"{pre}.conditioning1.2.weight": rng.standard_normal((2, 2, ce // 2, ce)).astype(f32) * 0.1,
        f"{pre}.conditioning1.2.bias": np.zeros(ce, f32),
        f"{pre}.down.0.weight": rng.standard_normal((mlp, in_dim)).astype(f32) * 0.1,
        f"{pre}.down.0.bias": np.zeros(mlp, f32),
        f"{pre}.mid.0.weight": rng.standard_normal((mlp, mlp + ce)).astype(f32) * 0.1,
        f"{pre}.mid.0.bias": np.zeros(mlp, f32),
        f"{pre}.up.0.weight": rng.standard_normal((in_dim, mlp)).astype(f32) * 0.1,
        f"{pre}.up.0.bias": np.zeros(in_dim, f32),
    }


def test_controlllite_module_shapes():
    from forge_tpu.extensions.controllllite import (
        _apply_module, _cond_embed, _module_meta, split_lllite_modules)

    sd = _tiny_lllite_sd()
    modules = split_lllite_modules(sd)
    assert len(modules) == 1
    name, weights = next(iter(modules.items()))
    meta = _module_meta(weights)
    assert meta["depth"] == 1 and not meta["is_conv2d"]
    assert meta["in_dim"] == 32 and meta["mlp_dim"] == 8
    cond = jnp.zeros((1, 32, 32, 3), jnp.float32) + 0.5
    emb = _cond_embed(weights, cond, meta["depth"])
    assert emb.shape == (1, 4, 4, 16)  # 32/4/2 = 4 tokens/side
    x = jnp.ones((2, 16, 32), jnp.float32)
    out = _apply_module(weights, meta, emb, x, multiplier=1.0)
    assert out.shape == x.shape


def test_controlllite_e2e(engine):
    from forge_tpu.extensions.controllllite import build_lllite_hooks

    base = process_images(engine, Processing(prompt="cat", seed=17, steps=2,
                                             width=32, height=32)).images[0]
    hint = np.full((32, 32, 3), 200, np.uint8)
    hooks = build_lllite_hooks(_tiny_lllite_sd(), hint, multiplier=100.0)
    p = Processing(prompt="cat", seed=17, steps=2, width=32, height=32,
                   unet_hooks=hooks)
    out = process_images(engine, p).images[0]
    assert np.isfinite(out.astype(np.float32)).all()
    assert not np.array_equal(base, out)


def test_fooocus_dequant_and_head():
    from forge_tpu.extensions.fooocus_inpaint import (
        build_inpaint_head_hooks, dequantize_fooocus, inpaint_head_feature,
        is_fooocus_patch, load_fooocus_patches)

    w = np.array([[0, 128, 255]], np.uint8)
    deq = dequantize_fooocus([w, np.float32(-1.0), np.float32(1.0)])
    assert np.allclose(deq, [[-1.0, 128 / 255 * 2 - 1, 1.0]], atol=1e-6)

    sd = {"diffusion_model.time_embed.0.weight":
          [np.zeros((4, 4), np.uint8), np.float32(0), np.float32(0.5)]}
    assert is_fooocus_patch(sd)
    patches, s = load_fooocus_patches(sd, strength=0.8)
    assert "time_embed.0.weight" in patches and s == 0.8

    head = np.random.default_rng(9).standard_normal((3, 3, 5, 32)).astype(np.float32)
    mask = jnp.ones((1, 8, 8, 1))
    lat = jnp.zeros((1, 8, 8, 4))
    feat = inpaint_head_feature(head, mask, lat)
    assert feat.shape == (1, 8, 8, 32)
    hooks = build_inpaint_head_hooks(feat)
    h = jnp.zeros((2, 8, 8, 32))
    out = hooks["input_block_patch"][0](h, ("input", 0))
    assert out.shape == h.shape and float(jnp.abs(out).sum()) > 0
    # other blocks untouched
    out2 = hooks["input_block_patch"][0](h, ("input", 1))
    assert float(jnp.abs(out2).sum()) == 0


def test_fooocus_inpaint_e2e(engine):
    from forge_tpu.extensions.fooocus_inpaint import attach as attach_fi

    rng = np.random.default_rng(10)
    # tiny engine model_channels: derive from the unet tree stem conv
    stem = engine.loaded.unet["input_blocks"]["0"]["0"]["weight"]
    mc = stem.shape[-1]
    head = rng.standard_normal((3, 3, 5, mc)).astype(np.float32) * 0.05
    patch_sd = {"diffusion_model.out.2.bias":
                [np.full((engine.latent_format.latent_channels,), 255, np.uint8),
                 np.float32(0.0), np.float32(0.1)]}
    img = np.full((32, 32, 3), 100, np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0

    base_p = Processing(prompt="cat", seed=19, steps=2, width=32, height=32,
                        init_images=[img], inpaint_mask=mask)
    base = process_images(engine, base_p).images[0]

    p = Processing(prompt="cat", seed=19, steps=2, width=32, height=32,
                   init_images=[img], inpaint_mask=mask)
    attach_fi(p, {}, patch_sd=patch_sd, head_weight=head)
    out = process_images(engine, p).images[0]
    assert np.isfinite(out.astype(np.float32)).all()
    assert not np.array_equal(base, out)
    assert p.extra_generation_params["Fooocus inpaint"] == "True"


def test_hypernetwork_apply(engine):
    """Legacy hypernetwork: per-dim k/v context MLPs change the image;
    identity-weight modules are a no-op (residual form)."""
    from forge_tpu.extensions.hypernetworks import (
        Hypernetwork, attach as attach_hn, load_hypernetwork)

    ctx_dim = engine.loaded.unet["input_blocks"]["1"]["1"]["transformer_blocks"]["0"][
        "attn2"]["to_k"]["weight"].shape[1]
    rng = np.random.default_rng(23)

    def module_sd(scale):
        return {
            "linear1.weight": (rng.standard_normal((ctx_dim * 2, ctx_dim)) * scale).astype(np.float32),
            "linear1.bias": np.zeros(ctx_dim * 2, np.float32),
            "linear2.weight": (rng.standard_normal((ctx_dim, ctx_dim * 2)) * scale).astype(np.float32),
            "linear2.bias": np.zeros(ctx_dim, np.float32),
        }

    hn = load_hypernetwork({ctx_dim: [module_sd(0.05), module_sd(0.05)],
                            "activation_func": "relu"}, name="test-hn")
    assert ctx_dim in hn.modules

    base = process_images(engine, Processing(prompt="cat", seed=51, steps=2,
                                             width=32, height=32)).images[0]
    p = Processing(prompt="cat", seed=51, steps=2, width=32, height=32)
    attach_hn(p, hn)
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out)
    assert p.extra_generation_params["Hypernet"] == "test-hn"

    # zero-weight modules → residual is identity → same image as base
    hn0 = load_hypernetwork({ctx_dim: [module_sd(0.0), module_sd(0.0)]})
    p0 = Processing(prompt="cat", seed=51, steps=2, width=32, height=32)
    attach_hn(p0, hn0)
    out0 = process_images(engine, p0).images[0]
    assert np.array_equal(base, out0)


def test_tiled_diffusion_pipeline_wiring():
    """p.tiled_diffusion routes the denoiser through MultiDiffusion tiling
    inside the compiled loop (the reference sd_forge_multidiffusion path)."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    eng = make_tiny_engine()
    base = process_images(eng, Processing(prompt="x", seed=5, steps=2,
                                          width=64, height=64, sampler_name="Euler"))
    p = Processing(prompt="x", seed=5, steps=2, width=64, height=64,
                   sampler_name="Euler")
    p.tiled_diffusion = {"tile": 6, "overlap": 2}
    tiled = process_images(eng, p)
    assert tiled.images[0].shape == base.images[0].shape
    # tiling changes the denoiser's receptive field → different image
    assert not np.array_equal(base.images[0], tiled.images[0])
    assert "Tiled Diffusion" in tiled.infotexts[0]
