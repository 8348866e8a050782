"""Revision workflow (pipeline/revision.py): CLIP-vision image embeds replace
the SDXL pooled conditioning through the ControlNet unit path
(reference forge_preprocessor_revision)."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.save import save_safetensors

from test_sdxl import _tiny_sdxl_checkpoint, ADM, CTX, GW


@pytest.fixture(scope="module")
def engine():
    from forge_tpu.models.unet import UNetConfig
    from forge_tpu.pipeline.engine import load_engine

    eng = load_engine(_tiny_sdxl_checkpoint(), dtype=jnp.float32)
    eng.unet_cfg = UNetConfig(context_dim=CTX, num_heads=4,
                              use_linear_projection=True, adm_in_channels=ADM)
    return eng


def _tiny_clipvision_sd(proj_out=GW, width=64, patch=32):
    r = np.random.default_rng(31)
    sd = {}

    def lin(key, o, i, bias=True):
        sd[key + ".weight"] = (r.standard_normal((o, i)) * 0.05).astype(np.float32)
        if bias:
            sd[key + ".bias"] = np.zeros(o, np.float32)

    def norm(key, d):
        sd[key + ".weight"] = np.ones(d, np.float32)
        sd[key + ".bias"] = np.zeros(d, np.float32)

    v = "vision_model."
    sd[v + "embeddings.patch_embedding.weight"] = (
        r.standard_normal((width, 3, patch, patch)) * 0.05).astype(np.float32)
    sd[v + "embeddings.class_embedding"] = np.zeros(width, np.float32)
    sd[v + "embeddings.position_embedding.weight"] = (
        r.standard_normal(((224 // patch) ** 2 + 1, width)) * 0.02).astype(np.float32)
    norm(v + "pre_layrnorm", width)
    b = v + "encoder.layers.0."
    norm(b + "layer_norm1", width)
    for pn in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(b + "self_attn." + pn, width, width)
    norm(b + "layer_norm2", width)
    lin(b + "mlp.fc1", width * 4, width)
    lin(b + "mlp.fc2", width, width * 4)
    norm(v + "post_layernorm", width)
    lin("visual_projection", proj_out, width, bias=False)
    return sd


@pytest.fixture(scope="module")
def cv_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cv") / "bigG.safetensors")
    save_safetensors(_tiny_clipvision_sd(), path)
    return path


def _img(seed=9):
    return np.random.default_rng(seed).integers(0, 255, (64, 64, 3), dtype=np.uint8)


def _run(engine, units=None, **pkw):
    from forge_tpu.extensions.controlnet import ControlNetScript
    from forge_tpu.pipeline.processing import Processing, process_images

    base = dict(prompt="a fortress", negative_prompt="bad", seed=21, steps=2,
                width=32, height=32, cfg_scale=7.0, sampler_name="Euler")
    base.update(pkw)
    p = Processing(**base)
    if units:
        p.controlnet_units = units
        ControlNetScript().process(p)
    return process_images(engine, p).images[0]


def test_revision_changes_output(engine, cv_path):
    base = _run(engine)
    rev = _run(engine, units=[{"enabled": True, "module": "CLIP-G (Revision)",
                               "image": _img(), "weight": 1.0,
                               "clip_vision_path": cv_path}])
    assert not np.array_equal(base, rev)


def test_revision_ignore_prompt_differs(engine, cv_path):
    a = _run(engine, units=[{"enabled": True, "module": "CLIP-G (Revision)",
                             "image": _img(), "weight": 1.0,
                             "clip_vision_path": cv_path}])
    b = _run(engine, units=[{"enabled": True,
                             "module": "CLIP-G (Revision ignore prompt)",
                             "image": _img(), "weight": 1.0,
                             "clip_vision_path": cv_path}])
    assert not np.array_equal(a, b)


def test_revision_two_units_sum(engine, cv_path):
    """Two units accumulate (Σ wᵢ embedᵢ, preprocessor_revision.py:18-45)."""
    u1 = {"enabled": True, "module": "CLIP-G (Revision)", "image": _img(1),
          "weight": 0.6, "clip_vision_path": cv_path}
    u2 = {**u1, "image": _img(2), "weight": 0.4}
    single = _run(engine, units=[u1])
    both = _run(engine, units=[u1, u2])
    assert not np.array_equal(single, both)


def test_revision_y_rewrite_unit():
    from forge_tpu.pipeline.revision import apply_revision

    class P:
        extra_generation_params = {}

    p = P()
    cond = {"y": jnp.ones((2, 16)), "context": jnp.ones((2, 3, 4))}
    uncond = {"y": jnp.ones((2, 16)), "context": jnp.ones((2, 3, 4))}
    emb = jnp.full((1, 8), 2.0)
    apply_revision(p, cond, uncond, emb, ignore_prompt=False)
    assert np.allclose(np.asarray(cond["y"])[:, :8], 2.0)
    assert np.allclose(np.asarray(cond["y"])[:, 8:], 1.0)
    assert np.allclose(np.asarray(uncond["y"])[:, :8], 0.0)
    # second unit accumulates
    apply_revision(p, cond, uncond, jnp.full((1, 8), 1.0), ignore_prompt=True)
    assert np.allclose(np.asarray(cond["y"])[:, :8], 3.0)
    assert np.allclose(np.asarray(cond["context"]), 0.0)
