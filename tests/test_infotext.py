"""Infotext serializer/parser parity tests.

The infotext line is the ecosystem's regression oracle (reference
modules/processing.py:668-798 create_infotext, infotext_utils.py:251-491
parse_generation_parameters): serialize → parse → re-serialize must be a
fixpoint, and every Processing field that affects the image must survive
the round trip.
"""

import dataclasses

import pytest

from forge_tpu.pipeline.infotext import (
    build_generation_params,
    create_infotext,
    infotext_to_processing_args,
    parse_generation_parameters,
    quote,
    unquote,
)
from forge_tpu.pipeline.processing import Processing, _record_generation_params


class _FakeEngine:
    family = "sd15"
    checkpoint_name = "tiny-sd15.safetensors"
    checkpoint_hash = "abc123def0"


def _mk(**kw):
    p = Processing(prompt="a cat", **kw)
    _record_generation_params(_FakeEngine(), p)
    return p


def test_quote_roundtrip():
    for s in ["plain", "with, comma", "with: colon", 'with "quotes", and: more',
              "multi\nline"]:
        assert unquote(str(quote(s))) == s


def test_basic_keys_present():
    p = _mk(steps=25, sampler_name="DPM++ 2M", scheduler="karras",
            cfg_scale=6.5, width=640, height=512, clip_skip=2,
            eta_noise_seed_delta=31337)
    text = create_infotext(p, seed=42, subseed=0)
    d = parse_generation_parameters(text)
    assert d["Prompt"] == "a cat"
    assert d["Steps"] == "25"
    assert d["Sampler"] == "DPM++ 2M"
    assert d["Schedule type"] == "Karras"
    assert d["CFG scale"] == "6.5"
    assert d["Seed"] == "42"
    assert d["Size-1"] == "640" and d["Size-2"] == "512"
    assert d["Clip skip"] == "2"
    assert d["ENSD"] == "31337"
    assert d["Model"] == "tiny-sd15"
    assert d["Model hash"] == "abc123def0"
    assert "Version" in d


def test_negative_prompt_and_quoting():
    p = _mk(negative_prompt="ugly, bad anatomy")
    p.extra_generation_params["Lora hashes"] = "style: 1a2b3c4d5e, detail: f6e5d4c3b2"
    text = create_infotext(p, 1, 0)
    d = parse_generation_parameters(text)
    assert d["Negative prompt"] == "ugly, bad anatomy"
    # value with commas+colons must round-trip through quoting
    assert d["Lora hashes"] == "style: 1a2b3c4d5e, detail: f6e5d4c3b2"


def test_parser_default_shims():
    d = parse_generation_parameters("a cat\nSteps: 20, Sampler: Euler a, CFG scale: 7, Seed: 1")
    assert d["Clip skip"] == "1"
    assert d["Schedule type"] == "Automatic"
    assert d["Hires sampler"] == "Use same sampler"
    assert d["Hires checkpoint"] == "Use same checkpoint"
    assert d["Mask mode"] == "Inpaint masked"
    assert d["Inpaint area"] == "Whole picture"
    assert d["RNG"] == "GPU"
    assert d["VAE Encoder"] == "Full"


def test_hires_keys():
    p = _mk(enable_hr=True, hr_scale=2.0, hr_second_pass_steps=12,
            hr_upscaler="Lanczos", hr_denoising_strength=0.55,
            hr_resize_x=1216, hr_resize_y=832)
    text = create_infotext(p, 7, 0)
    d = parse_generation_parameters(text)
    assert d["Hires upscale"] == "2.0"
    assert d["Hires steps"] == "12"
    assert d["Hires upscaler"] == "Lanczos"
    assert d["Denoising strength"] == "0.55"
    assert d["Hires resize-1"] == "1216" and d["Hires resize-2"] == "832"
    args = infotext_to_processing_args(text)
    assert args["enable_hr"] is True
    assert args["hr_scale"] == 2.0
    assert args["hr_second_pass_steps"] == 12
    assert args["hr_denoising_strength"] == 0.55
    assert args["hr_resize_x"] == 1216


def test_img2img_mask_keys():
    import numpy as np

    p = _mk(init_images=[np.zeros((64, 64, 3), np.uint8)],
            inpaint_mask=np.ones((64, 64), np.float32),
            denoising_strength=0.6, mask_blur=8.0,
            inpainting_mask_invert=True, inpaint_full_res=True,
            inpaint_full_res_padding=48, inpainting_fill="latent_noise")
    text = create_infotext(p, 7, 0)
    d = parse_generation_parameters(text)
    assert d["Denoising strength"] == "0.6"
    assert d["Mask blur"] == "8.0"
    assert d["Mask mode"] == "Inpaint not masked"
    assert d["Inpaint area"] == "Only masked"
    assert d["Masked area padding"] == "48"
    assert d["Masked content"] == "latent noise"
    args = infotext_to_processing_args(text)
    assert args["inpainting_mask_invert"] is True
    assert args["inpaint_full_res"] is True
    assert args["inpaint_full_res_padding"] == 48
    assert args["inpainting_fill"] == "latent_noise"
    assert args["mask_blur"] == 8.0


def test_refiner_and_sampler_keys():
    p = _mk(sampler_name="DPM2", refiner_checkpoint="xl-refiner",
            refiner_switch_at=0.8, s_churn=0.5, s_noise=1.1, eta_ddim=0.0)
    text = create_infotext(p, 7, 0)
    d = parse_generation_parameters(text)
    assert d["Refiner"] == "xl-refiner"
    assert d["Refiner switch at"] == "0.8"
    assert d["Sigma churn"] == "0.5"
    assert d["Sigma noise"] == "1.1"
    assert d["Discard penultimate sigma"] == "True"
    args = infotext_to_processing_args(text)
    assert args["refiner_checkpoint"] == "xl-refiner"
    assert args["refiner_switch_at"] == 0.8
    assert args["s_churn"] == 0.5


def test_serialize_parse_serialize_fixpoint():
    """The fixpoint property over a broadly-populated Processing."""
    p = _mk(
        negative_prompt="bad, worse: worst",
        steps=28, sampler_name="DPM++ 2M SDE", scheduler="exponential",
        cfg_scale=5.5, width=768, height=512, clip_skip=2,
        subseed=99, subseed_strength=0.3,
        seed_resize_from_w=512, seed_resize_from_h=512,
        enable_hr=True, hr_scale=1.5, hr_upscaler="Latent",
        hr_denoising_strength=0.45, s_noise=1.05,
    )
    text1 = create_infotext(p, seed=1234, subseed=99)
    args = infotext_to_processing_args(text1)
    p2 = Processing(**{k: v for k, v in args.items()
                       if k in {f.name for f in dataclasses.fields(Processing)}})
    _record_generation_params(_FakeEngine(), p2)
    text2 = create_infotext(p2, seed=1234, subseed=99)
    assert text1 == text2


def test_variation_seed_fields():
    p = _mk(subseed_strength=0.25)
    text = create_infotext(p, seed=10, subseed=20)
    args = infotext_to_processing_args(text)
    assert args["seed"] == 10
    assert args["subseed"] == 20
    assert args["subseed_strength"] == 0.25


def test_flux_distilled_cfg():
    p = Processing(prompt="x", distilled_cfg_scale=4.0)

    class _Flux(_FakeEngine):
        family = "flux"

    _record_generation_params(_Flux(), p)
    d = build_generation_params(p, 1, 0)
    assert d["Distilled CFG Scale"] == 4.0
    text = create_infotext(p, 1, 0)
    assert infotext_to_processing_args(text)["distilled_cfg_scale"] == 4.0


def test_schedule_type_label_roundtrip():
    for sched, label in [("karras", "Karras"), ("sgm_uniform", "SGM Uniform"),
                         ("align_your_steps", "Align Your Steps")]:
        p = _mk(scheduler=sched)
        text = create_infotext(p, 1, 0)
        assert f"Schedule type: {label}" in text
        assert infotext_to_processing_args(text)["scheduler"] == sched


def test_params_txt(tmp_path):
    from forge_tpu.pipeline.infotext import write_params_txt

    path = tmp_path / "params.txt"
    write_params_txt("hello\nSteps: 20", str(path))
    assert path.read_text() == "hello\nSteps: 20"


def test_options_registry_parity():
    """Options registry carries the reference's key names (shared_options.py)
    and supports aliases + per-request overrides."""
    from forge_tpu.runtime.options import opts

    reg = opts.dump_registry()
    assert len(reg) >= 150, f"registry too small: {len(reg)}"
    for key in ("face_restoration_model", "code_former_weight", "jpeg_quality",
                "CLIP_stop_at_last_layers", "initial_noise_multiplier",
                "img2img_color_correction", "eta_ancestral", "s_churn",
                "live_previews_enable", "show_progress_type",
                "add_model_hash_to_info", "forge_unet_storage_dtype"):
        assert key in reg, key
    # alias: old forge-tpu spelling resolves to the canonical key
    assert opts.get("emphasis_mode") == opts.get("emphasis")
    with opts.override({"jpeg_quality": 33}):
        assert opts.get("jpeg_quality") == 33
    assert opts.get("jpeg_quality") == 80


def test_option_defaults_seed_processing():
    from forge_tpu.runtime.options import opts
    from forge_tpu.pipeline.processing import Processing, _apply_option_defaults

    with opts.override({"s_churn": 0.7, "eta_ancestral": 0.9, "CLIP_stop_at_last_layers": 2}):
        p = Processing(prompt="x")
        _apply_option_defaults(p)
        assert p.s_churn == 0.7
        assert p.eta == 0.9
        assert p.clip_skip == 2
    # explicit request values win over option defaults
    with opts.override({"s_churn": 0.7}):
        p = Processing(prompt="x", s_churn=0.2)
        _apply_option_defaults(p)
        assert p.s_churn == 0.2


def test_color_correction_matches_histogram():
    import numpy as np

    from forge_tpu.pipeline.images import apply_color_correction, setup_color_correction

    rng = np.random.default_rng(0)
    target = rng.integers(100, 200, (64, 64, 3), dtype=np.uint8)
    src = rng.integers(0, 80, (64, 64, 3), dtype=np.uint8)
    out = apply_color_correction(setup_color_correction(target), src)
    assert out.shape == src.shape
    # corrected image's brightness moves toward the target's
    assert abs(out.mean() - target.mean()) < abs(src.mean() - target.mean())


def test_save_image_options(tmp_path):
    """save_image honors format/quality/save_txt/log.csv/date-dirs options
    and embeds infotext (reference images.py:627-788)."""
    import os

    import numpy as np

    from forge_tpu.pipeline.images import read_infotext, save_image
    from forge_tpu.runtime.options import opts

    img = np.full((16, 16, 3), 200, np.uint8)
    with opts.override({"save_to_dirs": False, "save_txt": True,
                        "save_write_log_csv": True, "samples_format": "png",
                        "samples_filename_pattern": "[seed]-[prompt_words]"}):
        path = save_image(img, outdir=str(tmp_path), infotext="a cat\nSteps: 3",
                          seed=7, prompt="a cat on a mat")
    assert os.path.basename(path).endswith("7-a_cat_on_a_mat.png")
    assert read_infotext(path) == "a cat\nSteps: 3"
    assert os.path.exists(os.path.splitext(path)[0] + ".txt")
    assert os.path.exists(tmp_path / "log.csv")

    with opts.override({"save_to_dirs": True,
                        "directories_filename_pattern": "[date]"}):
        path2 = save_image(img, outdir=str(tmp_path), infotext="x\nSteps: 1",
                           seed=1, prompt="p")
    import datetime

    assert datetime.datetime.now().strftime("%Y-%m-%d") in path2


def test_filename_tokens():
    from forge_tpu.pipeline.images import apply_filename_pattern

    out = apply_filename_pattern(
        "[model_name]-[sampler]-[steps]-[cfg]-[prompt_hash]",
        seed=3, prompt="hello world", model_name="sd15", sampler="Euler a",
        steps=20, cfg=7.0)
    assert out.startswith("sd15-Euler a-20-7.0-")
    assert apply_filename_pattern("[none]", seed=9) == "9"
