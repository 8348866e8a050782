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
