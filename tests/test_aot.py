"""AOT program store (runtime/aot.py): artifact round-trip, trace skipping,
and end-to-end pipeline equivalence through exported artifacts."""

import numpy as np
import pytest

import jax.numpy as jnp

import forge_tpu.runtime.aot as aot


@pytest.fixture()
def aot_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_DISABLED", False)
    return tmp_path


def test_artifact_roundtrip_skips_retrace(aot_dir):
    calls = []

    def f(w, x):
        calls.append(1)
        return jnp.tanh(x @ w)

    w, x = jnp.ones((8, 8)), jnp.ones((2, 8))
    g1 = aot.aot_jit(f, key="t1")
    out1 = np.asarray(g1(w, x))
    assert len(list(aot_dir.glob("*.jaxexp"))) == 1
    assert calls

    calls.clear()
    g2 = aot.aot_jit(f, key="t1")  # fresh wrapper = simulated fresh process
    out2 = np.asarray(g2(w, x))
    assert not calls, "model fn must not be retraced when the artifact exists"
    assert np.allclose(out1, out2)


def test_signature_and_key_separate_artifacts(aot_dir):
    def f(x):
        return x * 2

    aot.aot_jit(f, key="a")(jnp.ones((4,)))
    aot.aot_jit(f, key="a")(jnp.ones((8,)))   # new shape
    aot.aot_jit(f, key="b")(jnp.ones((4,)))   # new key
    assert len(list(aot_dir.glob("*.jaxexp"))) == 3


def test_corrupt_artifact_falls_back(aot_dir):
    def f(x):
        return x + 1

    g = aot.aot_jit(f, key="c")
    out = np.asarray(g(jnp.ones((3,))))
    path = next(aot_dir.glob("*.jaxexp"))
    path.write_bytes(b"garbage")
    g2 = aot.aot_jit(f, key="c")
    assert np.allclose(np.asarray(g2(jnp.ones((3,)))), out)


def test_donation_preserved(aot_dir):
    def f(w, x):
        return x @ w

    g = aot.aot_jit(f, key="d", donate_argnums=(1,))
    w, x = jnp.ones((4, 4)), jnp.ones((2, 4))
    g(w, x)
    g2 = aot.aot_jit(f, key="d", donate_argnums=(1,))
    out = g2(w, jnp.ones((2, 4)))
    assert np.allclose(np.asarray(out), 4.0)


def test_pipeline_equivalence_through_artifacts(aot_dir):
    """A fresh engine in the same process (fresh AotFunction wrappers, warm
    artifact dir) reproduces the plain-jit image bit-exactly."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_tiny_engine

    from forge_tpu.pipeline.processing import Processing, process_images

    def _p():
        return Processing(prompt="a boat", seed=3, steps=2, width=32,
                          height=32, cfg_scale=7.0, sampler_name="Euler")

    img1 = process_images(make_tiny_engine(), _p()).images[0]
    n_artifacts = len(list(aot_dir.glob("*.jaxexp")))
    assert n_artifacts >= 2  # sample fn + vae decode at minimum
    img2 = process_images(make_tiny_engine(), _p()).images[0]
    assert np.array_equal(img1, img2)
    assert len(list(aot_dir.glob("*.jaxexp"))) == n_artifacts
