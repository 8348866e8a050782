"""LaMa FFC generator (preprocessors/lama.py) vs the reference's torch
implementation on random synthetic weights (same strategy as
tests/test_annotators.py), plus the inpaint_only+lama unit path."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.core.state_dict import transform_for_jax
from forge_tpu.core.tree import nest

torch = pytest.importorskip("torch")

FFC = ("/root/reference/extensions-builtin/forge_preprocessor_inpaint/"
       "annotator/lama/saicinpainting/training/modules/ffc.py")


def _load_ffc():
    """Import the reference ffc module with its saicinpainting deps stubbed."""
    for name, attrs in (
        ("annotator.lama.saicinpainting.training.modules.base",
         {"get_activation": lambda kind=True: (torch.nn.Sigmoid()
                                               if kind == "sigmoid" else torch.nn.Tanh()),
          "BaseDiscriminator": torch.nn.Module}),
        ("annotator.lama.saicinpainting.training.modules.spatial_transform",
         {"LearnableSpatialTransformWrapper": torch.nn.Identity}),
        ("annotator.lama.saicinpainting.training.modules.squeeze_excitation",
         {"SELayer": torch.nn.Identity}),
        ("annotator.lama.saicinpainting.utils",
         {"get_shape": lambda t: tuple(t.shape)}),
    ):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        parts = name.split(".")
        for i in range(1, len(parts)):
            pkg = ".".join(parts[:i])
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = []
                sys.modules[pkg] = m
    spec = importlib.util.spec_from_file_location("ref_ffc", FFC)
    m = importlib.util.module_from_spec(spec)
    sys.modules["ref_ffc"] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ffc_mod():
    return _load_ffc()


def _tiny_generator(ffc_mod, n_blocks=2, ngf=8):
    """big-lama shape at toy width: lama_config.yaml generator kwargs."""
    torch.manual_seed(0)
    kw = dict(ratio_gin=0, ratio_gout=0, enable_lfu=False)
    rkw = dict(ratio_gin=0.75, ratio_gout=0.75, enable_lfu=False)
    g = ffc_mod.FFCResNetGenerator(
        4, 3, ngf=ngf, n_downsampling=3, n_blocks=n_blocks,
        add_out_act="sigmoid", init_conv_kwargs=kw, downsample_conv_kwargs=kw,
        resnet_conv_kwargs=rkw)
    g.eval()
    # randomize BN stats so the test catches mean/var mix-ups
    for mod in g.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.6, 1.4)
    return g


def test_lama_parity(ffc_mod):
    from forge_tpu.preprocessors.lama import lama_apply

    g = _tiny_generator(ffc_mod)
    x = torch.rand(1, 4, 32, 32)
    with torch.no_grad():
        ref = g(x).permute(0, 2, 3, 1).numpy()
    sd = {f"model.{k}": v for k, v in g.model.state_dict().items()}
    params = nest({k: jnp.asarray(v) for k, v in transform_for_jax(sd).items()})
    out = np.asarray(lama_apply(params, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy())))
    assert out.shape == ref.shape
    assert float(np.abs(out - ref).max()) <= 2e-3


def test_lama_detector_roundtrip(ffc_mod, tmp_path, monkeypatch):
    """End-to-end inpaint() through a checkpoint on disk (generator.* keys)."""
    import forge_tpu.preprocessors.lama as lama_mod

    g = _tiny_generator(ffc_mod)
    sd = {f"generator.model.{k}": v for k, v in g.model.state_dict().items()}
    mdir = tmp_path / "lama"
    mdir.mkdir()
    torch.save(sd, mdir / "ControlNetLama.pth")
    det = lama_mod.LamaDetector(model_dir=str(mdir))
    assert det.available
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
    mask = np.zeros((80, 96), np.float32)
    mask[20:60, 30:70] = 1.0
    out = det.inpaint(img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    # untouched pixels pass through; masked region is repainted
    assert np.array_equal(out[:10, :10], img[:10, :10])
    assert not np.array_equal(out[25:55, 35:65], img[25:55, 35:65])


def test_inpaint_unit_without_model_runs_composites():
    """inpaint_only with no control model still arms latent+final composites
    and changes only the masked region of the output."""
    from fixtures import make_tiny_engine

    from forge_tpu.extensions.controlnet import ControlNetScript
    from forge_tpu.pipeline.processing import Processing, process_images

    eng = make_tiny_engine()
    rng = np.random.default_rng(3)
    src = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    p = Processing(prompt="fill", seed=5, steps=3, width=32, height=32,
                   cfg_scale=7.0, sampler_name="Euler")
    p.controlnet_units = [{"enabled": True, "module": "inpaint_only",
                           "image": src, "mask": (mask * 255).astype(np.uint8),
                           "model": "None"}]
    ControlNetScript().process(p)
    assert p.deferred_hooks
    img = process_images(eng, p).images[0]
    assert img.shape == (32, 32, 3)
    # beyond the dilate(7)+blur(7) feather the source passes through exactly;
    # inside the mask the image is regenerated
    assert np.abs(img[:2, :2].astype(int) - src[:2, :2].astype(int)).max() <= 1
    assert not np.array_equal(img[10:22, 10:22], src[10:22, 10:22])
