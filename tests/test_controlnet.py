"""ControlNet ecosystem e2e: preprocessors, unit attach via the API payload
schema, per-block weighting, T2I-Adapter math (VERDICT r1 item #4)."""

import base64
import io
import json
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "tests")

from fixtures import CTX, MODEL_CH, make_tiny_engine, make_unet_sd
from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest
from forge_tpu.models.controlnet import ControlNetState, controlnet_apply, run_controlnets
from forge_tpu.models.unet import UNetConfig
from forge_tpu.pipeline.processing import Processing, process_images


def make_cldm_sd(seed=9):
    """Tiny cldm matching fixtures.make_unet_sd geometry: input blocks 0-3 +
    middle, zero convs, canonical 8-conv hint ladder (3→model_ch, 8× down)."""
    r = np.random.default_rng(seed)
    sd = {k: v for k, v in make_unet_sd(prefix="", seed=seed).items()
          if k.startswith(("time_embed", "input_blocks", "middle_block"))}
    ch1, ch2 = MODEL_CH, MODEL_CH * 2

    def conv(key, o, i, k=3):
        sd[key + ".weight"] = (r.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)
        sd[key + ".bias"] = np.zeros(o, np.float32)

    for i, ch in enumerate([ch1, ch1, ch1, ch2]):
        conv(f"zero_convs.{i}.0", ch, ch, 1)
    conv("middle_block_out.0", ch2, ch2, 1)
    ladder = [(16, 3, 1), (16, 16, 1), (32, 16, 2), (32, 32, 1),
              (96, 32, 2), (96, 96, 1), (256, 96, 2), (ch1, 256, 1)]
    for pos, (o, i, _s) in enumerate(ladder):
        conv(f"input_hint_block.{pos * 2}", o, i)
    return sd


def make_t2i_sd(seed=11, channels=(32, 64), cin=192):
    r = np.random.default_rng(seed)
    sd = {}

    def conv(key, o, i, k=3):
        sd[key + ".weight"] = (r.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)
        sd[key + ".bias"] = np.zeros(o, np.float32)

    conv("conv_in", channels[0], cin)
    idx = 0
    prev = channels[0]
    for li, ch in enumerate(channels):
        if ch != prev:
            conv(f"body.{idx}.in_conv", ch, prev)
        conv(f"body.{idx}.block1", ch, ch)
        conv(f"body.{idx}.block2", ch, ch)
        prev = ch
        idx += 1
    return sd


@pytest.fixture(scope="module")
def cn_params():
    return nest(transform_for_jax(make_cldm_sd()))


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


CN_CFG = UNetConfig(context_dim=CTX, num_heads=4)


def _hint(h=32, w=32, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(size=(1, h, w, 3)).astype(np.float32))


def test_controlnet_apply_shapes(cn_params):
    x = jnp.zeros((2, 4, 4, 4))
    out = controlnet_apply(cn_params, x, _hint(), jnp.zeros((2,)), jnp.zeros((2, 77, CTX)), cfg=CN_CFG)
    # consumption order: deepest skip first (matches unet output step index)
    assert [r.shape for r in out["output"]] == [
        (2, 2, 2, 64), (2, 2, 2, 32), (2, 4, 4, 32), (2, 4, 4, 32)]
    assert out["middle"][0].shape == (2, 2, 2, 64)


def test_block_weights_gate(cn_params):
    x = jnp.ones((2, 4, 4, 4))
    st = ControlNetState(params=cn_params, hint=_hint(), cfg=CN_CFG)
    st_zero = ControlNetState(params=cn_params, hint=_hint(), cfg=CN_CFG,
                              block_weights=[0.0] * 5)
    base = run_controlnets([st], x, jnp.zeros((2,)), jnp.asarray(0.5), jnp.zeros((2, 77, CTX)))
    zeroed = run_controlnets([st_zero], x, jnp.zeros((2,)), jnp.asarray(0.5), jnp.zeros((2, 77, CTX)))
    assert float(np.abs(np.asarray(base["middle"][0])).max()) > 0
    assert float(np.abs(np.asarray(zeroed["middle"][0])).max()) == 0
    # sigma-range gating: outside [start, end] the net contributes nothing
    st_late = ControlNetState(params=cn_params, hint=_hint(), cfg=CN_CFG,
                              start_percent=0.9, end_percent=1.0)
    gated = run_controlnets([st_late], x, jnp.zeros((2,)), jnp.asarray(0.5), jnp.zeros((2, 77, CTX)))
    assert float(np.abs(np.asarray(gated["middle"][0])).max()) == 0


def test_e2e_controlnet_changes_image(engine, cn_params):
    base = process_images(engine, Processing(
        prompt="cat", seed=3, steps=3, width=32, height=32, sampler_name="Euler"))
    p = Processing(prompt="cat", seed=3, steps=3, width=32, height=32, sampler_name="Euler")
    p.controlnets = [ControlNetState(params=cn_params, hint=_hint(), strength=1.5,
                                     cfg=CN_CFG, digest="testcn")]
    cond = process_images(engine, p)
    assert not np.array_equal(base.images[0], cond.images[0]), \
        "controlnet attached but image unchanged"


def test_t2i_adapter_apply():
    from forge_tpu.models.t2i_adapter import adapter_apply, detect_adapter_config

    params = nest(transform_for_jax(make_t2i_sd()))
    cfg = detect_adapter_config(params)
    assert not cfg.xl and cfg.unshuffle == 8 and tuple(cfg.channels) == (32, 64)
    out = adapter_apply(params, _hint(32, 32), cfg)
    feats = out["input"]
    assert len(feats) == 6
    assert feats[0] is None and feats[1] is None
    assert feats[2].shape == (1, 4, 4, 32)
    assert feats[5].shape == (1, 4, 4, 64)  # no downsample block in tiny net


def test_t2i_state_merges():
    from forge_tpu.models.t2i_adapter import T2IAdapterState

    params = nest(transform_for_jax(make_t2i_sd()))
    st = T2IAdapterState(params=params, hint=_hint(32, 32), strength=0.5, digest="t2i")
    x = jnp.ones((2, 4, 4, 4))
    merged = run_controlnets([st], x, jnp.zeros((2,)), jnp.asarray(0.0), jnp.zeros((2, 77, CTX)))
    assert merged["input"][2].shape == (2, 4, 4, 32)  # broadcast to CFG batch
    assert merged["input"][0] is None


def test_api_unit_attach(tmp_path, engine, cn_params):
    """Full API-schema path: save a synthetic cldm, post a unit dict through
    alwayson_scripts, get a visibly conditioned image."""
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.extensions import controlnet as cn_ext

    model_path = tmp_path / "tiny_canny.safetensors"
    save_safetensors(make_cldm_sd(), str(model_path))
    cn_ext.set_model_dirs([str(tmp_path)])
    cn_ext._MODEL_CACHE.clear()
    try:
        from PIL import Image

        img = np.zeros((32, 32, 3), np.uint8)
        img[8:24, 8:24] = 255
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        unit = {"enabled": True, "module": "canny", "model": "tiny_canny",
                "image": b64, "weight": 1.5, "guidance_start": 0.0,
                "guidance_end": 1.0, "processor_res": 32}
        p = Processing(prompt="cat", seed=3, steps=3, width=32, height=32,
                       sampler_name="Euler")
        # cldm cfg sniffed from checkpoint can't know tiny head count; patch it
        n = cn_ext.attach_units(p, [unit])
        assert n == 1
        p.controlnets[0].cfg = CN_CFG
        assert p.controlnets[0].digest
        # regression: params must be device arrays — numpy leaves are
        # re-uploaded by jax on every dispatch (40 s/image over the tunnel)
        import jax as _jax

        for leaf in _jax.tree.leaves(p.controlnets[0].params):
            assert isinstance(leaf, _jax.Array), type(leaf)
        out = process_images(engine, p)
        base = process_images(engine, Processing(
            prompt="cat", seed=3, steps=3, width=32, height=32, sampler_name="Euler"))
        assert not np.array_equal(out.images[0], base.images[0])
    finally:
        cn_ext.set_model_dirs(["models/ControlNet", "models/controlnet"])
        cn_ext._MODEL_CACHE.clear()


def test_unknown_alwayson_script_raises():
    from forge_tpu.api.server import ApiError, _apply_alwayson_scripts

    p = Processing()
    with pytest.raises(ApiError):
        _apply_alwayson_scripts(p, {"no_such_script": {"args": []}})


def test_preprocessor_registry_contract():
    from forge_tpu.preprocessors import get_preprocessor, preprocessor_names

    names = preprocessor_names()
    assert {"none", "canny", "invert", "lineart_standard"} <= set(names)
    # model-based annotators register unconditionally (discoverable in the
    # UI/API listing like the reference) and fail with a clear pointer to
    # the expected weights directory when called without a checkpoint
    assert {"depth_midas", "openpose_full", "softedge_hed", "mlsd",
            "lineart_realistic", "normalbae", "seg_ufade20k"} <= set(names)
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 200
    for name in names:
        p = get_preprocessor(name)
        if p.needs_weights:
            with pytest.raises(RuntimeError, match="models/|mediapipe"):
                p(img, 64)
            continue
        out = p(img, 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.float32, name
        assert 0.0 <= out.min() and out.max() <= 1.0001, name
    edges = get_preprocessor("canny")(img, 64)
    assert 0.001 < edges.mean() < 0.3  # square outline found, not everything


def test_control_lora_assembly_and_e2e(tmp_path, engine):
    """ControlLora: encoder trunk from the live UNet + up/down deltas +
    control-specific weights; deferred attach produces a conditioned image."""
    from forge_tpu.core.save import save_safetensors
    from forge_tpu.core.tree import flatten
    from forge_tpu.extensions import controlnet as cn_ext

    r = np.random.default_rng(5)
    # control-specific weights: hint ladder + zero convs + middle_block_out
    base_cldm = make_cldm_sd()
    sd = {k: v for k, v in base_cldm.items()
          if k.startswith(("zero_convs", "middle_block_out", "input_hint_block"))}
    sd["lora_controlnet"] = np.zeros((), np.float32)  # marker key
    # one low-rank delta on a shared UNet weight (dense conv in block 0)
    flat_unet = flatten(engine.loaded.unet)
    wkey = next(k for k in flat_unet
                if k.startswith("input_blocks.1") and k.endswith("in_layers.2.weight"))
    hwio = np.asarray(flat_unet[wkey])
    co, ci, kh, kw = hwio.shape[3], hwio.shape[2], hwio.shape[0], hwio.shape[1]
    rank = 2
    sd[wkey[: -len(".weight")] + ".up"] = (
        r.standard_normal((co, rank, 1, 1)) * 0.2).astype(np.float32)
    sd[wkey[: -len(".weight")] + ".down"] = (
        r.standard_normal((rank, ci, kh, kw)) * 0.2).astype(np.float32)

    path = tmp_path / "tiny_control_lora.safetensors"
    save_safetensors(sd, str(path))
    cn_ext.set_model_dirs([str(tmp_path)])
    cn_ext._MODEL_CACHE.clear()
    cn_ext._CL_CACHE.clear()
    try:
        kind, raw, cfg, digest = cn_ext.load_control_model(str(path))
        assert kind == "control_lora"
        params, ucfg = cn_ext.assemble_control_lora(engine, raw, digest)
        # delta applied: assembled weight differs from the UNet's
        merged = flatten(params)[wkey]
        assert merged.shape == hwio.shape
        assert not np.allclose(np.asarray(merged), hwio)
        # trunk copied: an untouched shared weight is identical
        other = next(k for k in flat_unet
                     if k.startswith("input_blocks.2") and k.endswith("weight"))
        assert np.allclose(np.asarray(flatten(params)[other]),
                           np.asarray(flat_unet[other]))

        img = np.zeros((32, 32, 3), np.uint8)
        img[10:20, 10:20] = 255
        unit = {"enabled": True, "module": "none", "model": "tiny_control_lora",
                "image": img, "weight": 1.2}
        p = Processing(prompt="cat", seed=4, steps=3, width=32, height=32,
                       sampler_name="Euler")
        n = cn_ext.attach_units(p, [unit])
        assert n == 1 and p.deferred_hooks and not p.controlnets
        out = process_images(engine, p)
        assert p.controlnets  # deferred builder ran and attached the state
        base = process_images(engine, Processing(
            prompt="cat", seed=4, steps=3, width=32, height=32, sampler_name="Euler"))
        assert not np.array_equal(out.images[0], base.images[0])
    finally:
        cn_ext.set_model_dirs(["models/ControlNet", "models/controlnet"])
        cn_ext._MODEL_CACHE.clear()
        cn_ext._CL_CACHE.clear()
