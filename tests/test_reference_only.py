"""Reference-only / reference-adain guidance (pipeline/reference_only.py):
the weightless style-transfer preprocessors change the output on a fixed
seed, respect the σ window, and attach through the ControlNet unit path
(reference extensions-builtin/forge_preprocessor_reference)."""

import numpy as np
import pytest

from fixtures import make_tiny_engine

from forge_tpu.pipeline.processing import Processing, process_images


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def _ref_image(seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)


def _p(**kw):
    base = dict(prompt="a castle", negative_prompt="blurry", seed=11, steps=3,
                width=32, height=32, cfg_scale=7.0, sampler_name="Euler")
    base.update(kw)
    return Processing(**base)


def _unit(module, **kw):
    # weight 1.5 drops the minimal-channel gates (1500−1280w / 1500−1000w,
    # forge_reference.py:109,147) below the tiny net's 32-channel blocks
    u = {"enabled": True, "module": module, "image": _ref_image(),
         "weight": 1.5, "threshold_a": 0.5}
    u.update(kw)
    return u


def _run(engine, units=None, **pkw):
    p = _p(**pkw)
    if units:
        p.controlnet_units = units
        from forge_tpu.extensions.controlnet import ControlNetScript

        ControlNetScript().process(p)
    return process_images(engine, p).images[0]


def test_reference_only_changes_output(engine):
    base = _run(engine)
    ref = _run(engine, units=[_unit("reference_only")])
    assert ref.shape == base.shape
    assert not np.array_equal(base, ref)


def test_reference_adain_changes_output(engine):
    base = _run(engine)
    ref = _run(engine, units=[_unit("reference_adain")])
    assert not np.array_equal(base, ref)


def test_reference_adain_attn_differs_from_attn_only(engine):
    a = _run(engine, units=[_unit("reference_only")])
    b = _run(engine, units=[_unit("reference_adain+attn")])
    assert not np.array_equal(a, b)


def test_reference_deterministic(engine):
    a = _run(engine, units=[_unit("reference_only")])
    b = _run(engine, units=[_unit("reference_only")])
    assert np.array_equal(a, b)


def test_style_fidelity_matters(engine):
    lo = _run(engine, units=[_unit("reference_only", threshold_a=0.0)])
    hi = _run(engine, units=[_unit("reference_only", threshold_a=1.0)])
    assert not np.array_equal(lo, hi)


def test_window_gating(engine):
    """A zero-length guidance window (start>end) must reproduce the base
    image exactly — every step takes the one_pass branch."""
    base = _run(engine)
    gated = _run(engine, units=[_unit("reference_only", guidance_start=0.9,
                                      guidance_end=0.1)])
    assert np.array_equal(base, gated)


def test_reference_with_cfg1_skip_uncond(engine):
    img = _run(engine, units=[_unit("reference_only")], cfg_scale=1.0)
    assert np.isfinite(img.astype(np.float32)).all()


def test_reference_registered_in_preprocessors():
    from forge_tpu.preprocessors import get_preprocessor

    for name in ("reference_only", "reference_adain", "reference_adain+attn"):
        p = get_preprocessor(name)
        assert p.slider_a[0] == "Style Fidelity"
