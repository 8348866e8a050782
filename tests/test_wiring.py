"""The formerly-orphaned components are actually wired (VERDICT r1 item #8):
plan_generation chunks batches and selects tiled VAE from process_images,
test_for_nans raises the actionable message on a poisoned latent, and
callback events fire at load/save boundaries."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from fixtures import make_tiny_engine
from forge_tpu.pipeline.processing import Processing, process_images
from forge_tpu.runtime import scripts as scripts_mod
from forge_tpu.runtime.memory import plan_generation
from forge_tpu.runtime.profiling import NansException
from forge_tpu.runtime.profiling import test_for_nans as check_nans


def test_plan_chunks_batch():
    plan = plan_generation(8, 1024, 1024, weight_bytes=5 << 30,
                           free_bytes=6 << 30)
    assert plan.batch_chunk < 8
    plan2 = plan_generation(2, 256, 256, weight_bytes=1 << 28,
                            free_bytes=12 << 30)
    assert plan2.batch_chunk == 2 and not plan2.tiled_vae


def test_plan_applied_in_pipeline():
    eng = make_tiny_engine()
    p = Processing(prompt="x", seed=1, steps=2, width=32, height=32,
                   batch_size=2, sampler_name="Euler")
    r = process_images(eng, p)
    assert hasattr(p, "_plan")
    assert len(r.images) == 2  # chunking preserves total image count


def test_nan_check_message():
    bad = np.full((1, 4, 4, 4), np.nan, np.float32)
    with pytest.raises(NansException, match="UNet"):
        check_nans(bad, "unet")
    with pytest.raises(NansException, match="VAE"):
        check_nans(bad, "vae")
    check_nans(np.zeros(4), "unet")  # finite: no raise
    check_nans(bad, "unet", enabled=False)  # disabled: no raise


def test_nan_check_fires_in_pipeline(monkeypatch):
    eng = make_tiny_engine()
    import forge_tpu.pipeline.processing as proc

    def poison(engine, p, x, sigmas, noise, cond, uncond, skip_uncond, **kw):
        import jax.numpy as jnp

        return jnp.full((p.batch_size, 4, 4, 4), jnp.nan)

    monkeypatch.setattr(proc, "_run_sampler", poison)
    p = Processing(prompt="x", seed=1, steps=2, width=32, height=32)
    with pytest.raises(NansException, match="UNet"):
        process_images(eng, p)


def test_callbacks_fire():
    seen = []
    scripts_mod.on("before_process", lambda p: seen.append("bp"))
    scripts_mod.on("model_loaded", lambda e: seen.append("ml"))
    try:
        eng = make_tiny_engine()
        from forge_tpu.runtime.models import ModelManager

        mm = ModelManager()
        mm.set_engine(eng)
        assert "ml" in seen
        p = Processing(prompt="x", seed=1, steps=2, width=32, height=32)
        process_images(eng, p)
        assert "bp" in seen
    finally:
        scripts_mod.clear("before_process")
        scripts_mod.clear("model_loaded")


def test_image_saved_callbacks(tmp_path):
    seen = []
    scripts_mod.on("before_image_saved", lambda path, img, info: seen.append(("pre", path)))
    scripts_mod.on("image_saved", lambda path, img, info: seen.append(("post", path)))
    try:
        from forge_tpu.pipeline.images import save_image

        img = np.zeros((8, 8, 3), np.uint8)
        path = save_image(img, outdir=str(tmp_path), seed=1, prompt="t")
        assert ("pre", path) in seen and ("post", path) in seen
    finally:
        scripts_mod.clear("before_image_saved")
        scripts_mod.clear("image_saved")


def test_extension_manager(tmp_path):
    """Discovery, metadata ordering, disable flags, script loading, and
    config-state snapshot (reference modules/extensions.py + config_states)."""
    import os

    from forge_tpu.runtime.extensions import (
        list_extensions, load_extension_scripts, restore_config_state,
        save_config_state)
    from forge_tpu.runtime.options import opts
    from forge_tpu.runtime.scripts import ScriptRunner

    base = tmp_path / "extensions"
    for name, meta, script in [
        ("zeta", "[Extension]\nName = zeta\nRequires = alpha\n",
         "from forge_tpu.runtime.scripts import Script\n"
         "class Z(Script):\n    name = 'zeta-script'\n"),
        ("alpha", "",
         "from forge_tpu.runtime.scripts import Script\n"
         "class A(Script):\n    name = 'alpha-script'\n"),
    ]:
        d = base / name / "scripts"
        os.makedirs(d)
        (base / name / "metadata.ini").write_text(meta)
        (d / "main.py").write_text(script)

    exts = list_extensions([str(base)])
    assert [e.name for e in exts] == ["alpha", "zeta"]  # Requires ordering
    assert all(e.enabled for e in exts)

    with opts.override({"disabled_extensions": ["zeta"]}):
        exts2 = list_extensions([str(base)])
        assert {e.name: e.enabled for e in exts2} == {"alpha": True, "zeta": False}

        runner = ScriptRunner()
        load_extension_scripts(runner, [str(base)])
        assert [s.name for s in runner.scripts] == ["alpha-script"]

    # config state snapshot round-trips option values
    opts.set("jpeg_quality", 42, run_onchange=False)
    path = save_config_state("t", dirname=str(tmp_path / "cs"))
    opts.set("jpeg_quality", 80, run_onchange=False)
    restore_config_state(path)
    assert opts.get("jpeg_quality") == 42
    opts.set("jpeg_quality", 80, run_onchange=False)


def test_never_oom_vae_always_tiled():
    """NeverOOM equivalent (reference sd_forge_neveroom): the option forces
    tiled VAE in the generation plan regardless of the memory estimate."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine
    from forge_tpu.pipeline.processing import Processing, process_images
    from forge_tpu.runtime.options import opts

    eng = make_tiny_engine()
    p = Processing(prompt="cat", seed=1, steps=2, width=32, height=32)
    process_images(eng, p)
    assert not p._plan.tiled_vae  # tiny shapes never need tiling on merit
    opts.set("vae_always_tiled", True, run_onchange=False)
    try:
        p2 = Processing(prompt="cat", seed=1, steps=2, width=32, height=32)
        process_images(eng, p2)
        assert p2._plan.tiled_vae
    finally:
        opts.set("vae_always_tiled", False, run_onchange=False)


def test_ngms_skips_uncond_below_threshold():
    """s_min_uncond (NGMS): the low-sigma tail runs without the uncond
    pass — output changes vs plain CFG and infotext records the knob."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine
    from forge_tpu.pipeline.processing import Processing, process_images
    from forge_tpu.runtime.options import opts

    eng = make_tiny_engine()
    base = process_images(eng, Processing(prompt="cat", seed=2, steps=6,
                                          width=32, height=32, cfg_scale=7.0))
    opts.set("s_min_uncond", 5.0, run_onchange=False)
    try:
        p = Processing(prompt="cat", seed=2, steps=6, width=32, height=32,
                       cfg_scale=7.0)
        ngms = process_images(eng, p)
        assert p.extra_generation_params.get("NGMS") == 5.0
        assert not np.array_equal(base.images[0], ngms.images[0])
    finally:
        opts.set("s_min_uncond", 0.0, run_onchange=False)
