"""Selectable scripts (reference scripts/: prompt_matrix, prompts_from_file,
loopback, sd_upscale, outpainting, custom_code) driven through the registry
and the API script_name dispatch."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from fixtures import make_tiny_engine
from forge_tpu.pipeline.processing import Processing
from forge_tpu.pipeline.selectable_scripts import get_script, parse_prompt_line


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def _p(**kw):
    kw.setdefault("steps", 2)
    kw.setdefault("width", 32)
    kw.setdefault("height", 32)
    kw.setdefault("seed", 7)
    kw.setdefault("do_not_save_samples", True)
    return Processing(**kw)


def test_unknown_script_raises():
    with pytest.raises(KeyError, match="selectable"):
        get_script("no such script")


def test_prompt_matrix(engine):
    r = get_script("prompt matrix").run(
        engine, _p(prompt="a cat|wearing a hat|in space"))
    # 2^2 combos + leading grid image
    assert len(r.images) == 5
    assert r.images[0].shape[0] >= 32 and r.images[0].shape[1] >= 64


def test_prompt_line_parsing():
    d = parse_prompt_line('a cat --steps 3 --width 64 --prompt "a dog"')
    assert d == {"steps": 3, "width": 64, "prompt": "a dog"}
    assert parse_prompt_line("plain words") == {"prompt": "plain words"}


def test_prompts_from_file(engine):
    r = get_script("Prompts from file or textbox").run(
        engine, _p(), False, False, "a cat\na dog --steps 3\n")
    assert len(r.images) == 2
    assert "Steps: 3" in r.infotexts[1]


def test_loopback(engine):
    init = np.full((32, 32, 3), 128, np.uint8)
    r = get_script("Loopback").run(
        engine, _p(init_images=[init], denoising_strength=0.4), 2, 0.6)
    assert len(r.images) == 2
    assert not np.array_equal(r.images[0], r.images[1])


def test_sd_upscale(engine):
    init = np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype(np.uint8)
    r = get_script("SD upscale").run(
        engine, _p(init_images=[init], denoising_strength=0.3),
        None, 16, "Lanczos", 2.0)
    assert r.images[0].shape == (96, 96, 3)


def test_poor_mans_outpainting(engine):
    init = np.full((32, 32, 3), 100, np.uint8)
    r = get_script("Poor man's outpainting").run(
        engine, _p(init_images=[init], denoising_strength=0.7),
        8, 2, "fill", ["right", "down"])
    assert r.images[0].shape == (64, 64, 3)  # 64-rounded canvas


def test_outpainting_mk2(engine):
    init = np.random.default_rng(1).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    r = get_script("Outpainting mk2").run(
        engine, _p(init_images=[init], denoising_strength=0.7),
        None, 8, 4, ["left"], 1.0, 0.1)
    assert r.images[0].shape == (64, 64, 3)  # 64-rounded canvas


def test_custom_code_gated(engine):
    from forge_tpu.api.server import CMD_FLAGS

    sc = get_script("Custom code")
    CMD_FLAGS.pop("allow_code", None)
    with pytest.raises(PermissionError, match="allow-code"):
        sc.run(engine, _p(prompt="x"), "p.steps = 1")
    CMD_FLAGS["allow_code"] = True
    try:
        r = sc.run(engine, _p(prompt="x"),
                   "p.steps = 1\nresult = process_images(engine, p)")
        assert len(r.images) == 1
    finally:
        CMD_FLAGS.pop("allow_code", None)


def test_img2img_alt_roundtrip(engine):
    """Reverse-Euler reconstruction: zero randomness + the original prompt
    re-samples close to the init image (the script's defining property)."""
    rng = np.random.default_rng(3)
    # deliberately non-/64 dims: the script must fit them to the processing
    # size (odd latent sides break UNet skip shapes)
    init = rng.integers(60, 200, (50, 37, 3)).astype(np.uint8)
    r = get_script("img2img alternative test").run(
        engine, _p(prompt="a cat", cfg_scale=1.5, init_images=[init],
                   width=64, height=64),
        None, True, "a cat", "", True, 6, 0.0, True)
    assert r.images[0].shape == (64, 64, 3)
    # different target prompt changes the output
    r2 = get_script("img2img alternative test").run(
        engine, _p(prompt="a dog in space", cfg_scale=7.0, init_images=[init],
                   width=64, height=64),
        None, True, "a cat", "", True, 6, 0.0, True)
    assert not np.array_equal(r.images[0], r2.images[0])
