"""IP-Adapter FaceID / FaceID-Plus / InstantID on synthetic weights
(VERDICT r2 next #6): projections produce the right token shapes, the e2e
generation is face-conditioned (≠ base output), and InstantID's coupled
ControlNet attends to image tokens instead of text."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "tests")

from fixtures import CTX, MODEL_CH, make_tiny_engine
from forge_tpu.pipeline.ipadapter import (IPAdapterState, build_faceid_hooks,
                                          build_instantid, is_faceid_adapter,
                                          project_faceid_embeds)
from forge_tpu.pipeline.processing import Processing, process_images

ID_DIM = 64  # tiny stand-in for the 512-d insightface embedding


def _faceid_sd(rng, ctx=CTX, n_tokens=4, plus=False, n_attn=8):
    t = {}

    def lin(o, i):
        return {"weight": jnp.asarray(rng.standard_normal((o, i)) * 0.05, jnp.float32),
                "bias": jnp.zeros((o,), jnp.float32)}

    proj = {
        "proj": {"0": lin(ID_DIM * 2, ID_DIM),
                 "2": lin(ctx * n_tokens, ID_DIM * 2)},
        "norm": {"weight": jnp.ones((ctx,), jnp.float32),
                 "bias": jnp.zeros((ctx,), jnp.float32)},
    }
    if plus:
        clip_dim, depth = 48, 2
        layers = {}
        for i in range(depth):
            layers[str(i)] = {
                "0": {"norm1": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
                      "norm2": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
                      "to_q": lin(ctx, ctx),
                      "to_kv": lin(ctx * 2, ctx),
                      "to_out": lin(ctx, ctx)},
                "1": {"0": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
                      "1": lin(ctx * 2, ctx),
                      "3": lin(ctx, ctx * 2)},
            }
        proj["perceiver_resampler"] = {
            "proj_in": lin(ctx, clip_dim),
            "proj_out": lin(ctx, ctx),
            "norm_out": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
            "layers": layers,
        }
    # tiny-engine cross-attn inner widths in trace order (probed)
    widths = [32, 64, 32, 32]
    ip = {}
    for i, wdt in enumerate(widths):  # sequential numbering marks FaceID
        ip[str(i)] = {
            "to_k_ip": {"weight": jnp.asarray(rng.standard_normal((wdt, ctx)) * 0.05, jnp.float32)},
            "to_v_ip": {"weight": jnp.asarray(rng.standard_normal((wdt, ctx)) * 0.05, jnp.float32)},
            "to_q_lora": {"down": {"weight": jnp.zeros((4, wdt), jnp.float32)}},
        }
    return {"image_proj": proj, "ip_adapter": ip}


def test_faceid_projection_shapes():
    rng = np.random.default_rng(0)
    sd = _faceid_sd(rng)
    assert is_faceid_adapter(sd)
    fe = jnp.asarray(rng.standard_normal((1, ID_DIM)), jnp.float32)
    toks = project_faceid_embeds(sd, fe)
    assert toks.shape == (1, 4, CTX)

    sd_plus = _faceid_sd(rng, plus=True)
    clip = jnp.asarray(rng.standard_normal((1, 10, 48)), jnp.float32)
    toks_p = project_faceid_embeds(sd_plus, fe, clip)
    assert toks_p.shape == (1, 4, CTX)
    # v2 shortcut changes the output
    toks_v2 = project_faceid_embeds(sd_plus, fe, clip, shortcut=True)
    assert not np.allclose(np.asarray(toks_p), np.asarray(toks_v2))


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def _p(**kw):
    return Processing(prompt="a person", seed=3, steps=2, width=32, height=32,
                      sampler_name="Euler", **kw)


def test_faceid_e2e_changes_image(engine):
    rng = np.random.default_rng(1)
    base = process_images(engine, _p()).images[0]
    p = _p()
    p.unet_hooks = build_faceid_hooks(_faceid_sd(rng),
                                      rng.standard_normal(ID_DIM), weight=1.5)
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out), "FaceID attached but image unchanged"
    # deterministic per embed: same embed → same image
    p2 = _p()
    p2.unet_hooks = build_faceid_hooks(_faceid_sd(rng := np.random.default_rng(1)),
                                       rng.standard_normal(ID_DIM), weight=1.5)
    assert np.array_equal(out, process_images(engine, p2).images[0])


def test_instantid_e2e_with_controlnet(engine):
    from test_controlnet import CN_CFG, make_cldm_sd

    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import nest
    from forge_tpu.models.controlnet import ControlNetState

    rng = np.random.default_rng(2)
    # instantid adapter: plus-style resampler image_proj over the id embed
    ctx = CTX
    n_tok = 4

    def lin(o, i):
        return {"weight": jnp.asarray(rng.standard_normal((o, i)) * 0.05, jnp.float32),
                "bias": jnp.zeros((o,), jnp.float32)}

    layers = {"0": {
        "0": {"norm1": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
              "norm2": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
              "to_q": lin(ctx, ctx), "to_kv": lin(ctx * 2, ctx), "to_out": lin(ctx, ctx)},
        "1": {"0": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
              "1": lin(ctx * 2, ctx), "3": lin(ctx, ctx * 2)},
    }}
    sd = {
        "image_proj": {
            "latents": jnp.asarray(rng.standard_normal((1, n_tok, ctx)) * 0.05, jnp.float32),
            "proj_in": lin(ctx, ID_DIM),
            "proj_out": lin(ctx, ctx),
            "norm_out": {"weight": jnp.ones((ctx,)), "bias": jnp.zeros((ctx,))},
            "layers": layers,
        },
        "ip_adapter": {str(i): {
            "to_k_ip": {"weight": jnp.asarray(rng.standard_normal((wdt, ctx)) * 0.05, jnp.float32)},
            "to_v_ip": {"weight": jnp.asarray(rng.standard_normal((wdt, ctx)) * 0.05, jnp.float32)},
        } for i, wdt in enumerate([32, 64, 32, 32])},
    }
    cn_params = nest(transform_for_jax(make_cldm_sd()))
    hint = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    cn = ControlNetState(params=cn_params, hint=hint, cfg=CN_CFG, digest="iid")
    hooks, cn2 = build_instantid(sd, rng.standard_normal(ID_DIM),
                                 controlnet_state=cn, weight=1.0)
    assert cn2.context_override is not None
    assert cn2.context_override.shape == (2, n_tok, ctx)

    base = process_images(engine, _p()).images[0]
    p = _p()
    p.unet_hooks = hooks
    p.controlnets = [cn2]
    out = process_images(engine, p).images[0]
    assert not np.array_equal(base, out)
    # the context override itself must matter: same setup with text context
    p3 = _p()
    p3.unet_hooks = hooks
    import dataclasses as _dc

    p3.controlnets = [_dc.replace(cn2, context_override=None, digest="iid-noctx")]
    out3 = process_images(engine, p3).images[0]
    assert not np.array_equal(out, out3), "controlnet context override is a no-op"


def test_ipadapter_survives_hires_pass(engine):
    """Regression: the attn2 layer indexing must be idempotent across jit
    traces — a monotonic counter kept advancing on the hires re-trace and
    the second pass silently rendered without the adapter."""
    import jax.numpy as jnp

    from forge_tpu.pipeline.ipadapter import IPAdapterState
    from forge_tpu.pipeline.processing import Processing, process_images

    rng = np.random.default_rng(0)
    # attn2 widths in trace order (input blocks asc, middle, output blocks
    # asc) straight from the engine tree
    tree = engine.loaded.unet
    widths = []
    for section in ("input_blocks", "middle_block", "output_blocks"):
        sec = tree[section]
        groups = [sec] if section == "middle_block" else [
            sec[k] for k in sorted(sec, key=int)]
        for g in groups:
            for sub in ([g[k] for k in sorted(g, key=int)]
                        if section != "middle_block" else [g[k] for k in sorted(g, key=int)]):
                if isinstance(sub, dict) and "transformer_blocks" in sub:
                    tb = sub["transformer_blocks"]
                    for i in sorted(tb, key=int):
                        widths.append(tb[i]["attn2"]["to_q"]["weight"].shape[0])
    layers = {str(i * 2 + 1): {
        "to_k_ip": {"weight": jnp.asarray(
            rng.standard_normal((w, CTX)) * 0.05, jnp.float32)},
        "to_v_ip": {"weight": jnp.asarray(
            rng.standard_normal((w, CTX)) * 0.05, jnp.float32)},
    } for i, w in enumerate(widths)}
    toks = jnp.asarray(rng.standard_normal((1, 4, CTX)) * 0.3, jnp.float32)

    def make_p():
        p = Processing(prompt="cat", seed=5, steps=2, width=32, height=32,
                       enable_hr=True, hr_scale=2.0, hr_second_pass_steps=2,
                       hr_denoising_strength=0.6)
        st = IPAdapterState(params={"ip_adapter": layers}, ip_tokens=toks,
                            weight=1.0)
        p.unet_hooks = st.build_hooks()
        return p

    base = Processing(prompt="cat", seed=5, steps=2, width=32, height=32,
                      enable_hr=True, hr_scale=2.0, hr_second_pass_steps=2,
                      hr_denoising_strength=0.6)
    with_ip = process_images(engine, make_p())
    without = process_images(engine, base)
    assert with_ip.images[0].shape == (64, 64, 3)
    assert not np.array_equal(with_ip.images[0], without.images[0]), \
        "adapter had no effect on the hires output"
