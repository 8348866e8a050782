"""PhotoMaker stacked-ID conditioning (pipeline/photomaker.py) on synthetic
weights: trigger-token discovery, fuse-module splice, qformer id tokens, and
the bundled Space pipeline end-to-end through a tiny SDXL engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.pipeline.photomaker import (
    build_cond_transform, encode_id_images, find_trigger_position,
    fuse_id_embeds, load_photomaker)

from test_sdxl import CTX, _tiny_sdxl_checkpoint

VIT_W = 64
PATCH = 32
QDIM = 64
NTOK = 2


def _tiny_photomaker_sd(with_qformer=True):
    r = np.random.default_rng(5)
    sd = {}

    def lin(key, o, i, bias=True):
        sd[key + ".weight"] = (r.standard_normal((o, i)) * 0.05).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def norm(key, d):
        sd[key + ".weight"] = np.ones(d, np.float32)
        sd[key + ".bias"] = np.zeros(d, np.float32)

    v = "id_encoder.vision_model."
    sd[v + "embeddings.patch_embedding.weight"] = (
        r.standard_normal((VIT_W, 3, PATCH, PATCH)) * 0.05).astype(np.float32)
    sd[v + "embeddings.class_embedding"] = np.zeros(VIT_W, np.float32)
    n_pos = (224 // PATCH) ** 2 + 1
    sd[v + "embeddings.position_embedding.weight"] = (
        r.standard_normal((n_pos, VIT_W)) * 0.02).astype(np.float32)
    for i in range(2):
        b = f"{v}encoder.layers.{i}."
        norm(b + "layer_norm1", VIT_W)
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(b + "self_attn." + p, VIT_W, VIT_W)
        norm(b + "layer_norm2", VIT_W)
        lin(b + "mlp.fc1", VIT_W * 4, VIT_W)
        lin(b + "mlp.fc2", VIT_W, VIT_W * 4)
    norm(v + "post_layernorm", VIT_W)

    lin("id_encoder.visual_projection", CTX, VIT_W, bias=False)

    if with_qformer:
        q = "id_encoder.qformer."
        lin(q + "proj_in", QDIM, 512)
        sd[q + "latents"] = (r.standard_normal((NTOK, QDIM)) * 0.05).astype(np.float32)
        b = q + "layers.0."
        norm(b + "0.norm1", QDIM)
        norm(b + "0.norm2", QDIM)
        lin(b + "0.to_q", QDIM, QDIM, bias=False)
        lin(b + "0.to_kv", QDIM * 2, QDIM, bias=False)
        lin(b + "0.to_out", QDIM, QDIM, bias=False)
        norm(b + "1.0", QDIM)
        lin(b + "1.1", QDIM * 4, QDIM)
        lin(b + "1.3", QDIM, QDIM * 4)
        lin(q + "proj_out", CTX, QDIM)
        norm(q + "norm_out", CTX)

    f = "id_encoder.fuse_module."
    lin(f + "mlp1.0", CTX, 2 * CTX)
    lin(f + "mlp1.2", CTX, CTX)
    lin(f + "mlp2.0", CTX, CTX)
    lin(f + "mlp2.2", CTX, CTX)
    norm(f + "layer_norm", CTX)
    return sd


@pytest.fixture(scope="module")
def engine():
    from forge_tpu.pipeline.engine import load_engine

    return load_engine(_tiny_sdxl_checkpoint(), dtype=jnp.float32)


@pytest.fixture(scope="module")
def pm():
    return load_photomaker(_tiny_photomaker_sd())


def test_trigger_position(engine):
    pos = find_trigger_position(engine, "a photo of a person img, smiling")
    assert pos == 6  # BOS + 5 preceding tokens
    with pytest.raises(ValueError):
        find_trigger_position(engine, "a photo of a person")
    with pytest.raises(ValueError):
        find_trigger_position(engine, "img img")


def test_encode_and_fuse_shapes(pm):
    pix = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 224, 224, 3)).astype(np.float32))
    fe = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 512)).astype(np.float32))
    ids = encode_id_images(pm, None, pix, face_embeds=fe)
    assert ids.shape == (2, NTOK, CTX)
    # no face embeds → single projection token per image
    ids1 = encode_id_images(pm, None, pix)
    assert ids1.shape == (2, 1, CTX)

    ctx = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 77, CTX)).astype(np.float32))
    fused = fuse_id_embeds(pm, ctx, ids, trigger_pos=6)
    assert fused.shape == ctx.shape
    # tokens before the trigger untouched; trigger span replaced
    np.testing.assert_array_equal(np.asarray(fused[:, :6]), np.asarray(ctx[:, :6]))
    assert not np.allclose(np.asarray(fused[:, 6]), np.asarray(ctx[:, 6]))


def test_cond_transform_changes_generation(engine, pm):
    from forge_tpu.pipeline.processing import Processing, process_images

    face = np.full((64, 64, 3), 128, np.uint8)
    face[20:44, 20:44] = 200
    prompt = "a photo of a person img"
    transform = build_cond_transform(engine, pm, prompt, id_images=[face])
    kw = dict(prompt=prompt, seed=3, steps=2, width=32, height=32,
              do_not_save_samples=True, do_not_save_grid=True)
    base = process_images(engine, Processing(**kw)).images[0]
    cond = process_images(engine, Processing(cond_transform=transform, **kw)).images[0]
    assert base.shape == cond.shape == (32, 32, 3)
    assert not np.array_equal(base, cond)


def test_space_pipeline(engine, pm):
    import importlib.util
    import os

    path = os.path.join("extensions-builtin", "forge_space_photo_maker_v2",
                        "forge_app.py")
    spec = importlib.util.spec_from_file_location("photomaker_app", path)
    app = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(app)

    pipe = app.PhotoMakerPipeline(engine, pm)
    face = np.full((48, 48, 3), 150, np.uint8)
    out = pipe.run([face], "portrait of a person img", seed=7, steps=2,
                   style="Cinematic", width=32, height=32,
                   face_embeds=[list(np.zeros(512, np.float32))])
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_cond_transform_survives_hires_reencode(engine, pm):
    """hires checkpoint-switch re-encodes conds; the trigger-token splice
    must be reapplied on the same-family hires engine."""
    from forge_tpu.pipeline.processing import Processing, process_images

    face = np.full((64, 64, 3), 128, np.uint8)
    prompt = "a photo of a person img"
    transform = build_cond_transform(engine, pm, prompt, id_images=[face])
    kw = dict(prompt=prompt, seed=11, steps=2, width=32, height=32,
              enable_hr=True, hr_scale=2.0,
              hr_upscaler="Latent (nearest-exact)",
              do_not_save_samples=True, do_not_save_grid=True)
    pa = Processing(cond_transform=transform, **kw)
    pa._hr_engine = engine  # force the re-encode path (same family)
    a = process_images(engine, pa).images[0]
    pb = Processing(**kw)
    pb._hr_engine = engine
    b = process_images(engine, pb).images[0]
    assert a.shape == b.shape == (64, 64, 3)
    assert not np.array_equal(a, b)
