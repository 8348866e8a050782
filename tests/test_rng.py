"""Philox RNG parity: our generator must reproduce torch-CUDA randn semantics
bit-exactly (seeds are API surface; reference oracle modules/rng_philox.py)."""

import os

import numpy as np
import pytest

from forge_tpu.ops import rng_philox
from forge_tpu.ops.image_rng import ImageRNG, slerp

REF = "/root/reference/modules/rng_philox.py"


def _load_ref():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_rng", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docstring_vector():
    # the torch-CUDA reference output for seed 0, shape (3, 4)
    g = rng_philox.Generator(0)
    out = g.randn((3, 4))
    expected = np.array(
        [
            [-0.92466259, -0.42534415, -2.6438457, 0.14518388],
            [-0.12086647, -0.57972564, -0.62285122, -0.32838709],
            [-1.07454231, -0.36314407, -1.67105067, 2.26550497],
        ]
    )
    assert np.allclose(out, expected, atol=2e-6)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference oracle not mounted")
def test_bit_exact_vs_reference_oracle():
    ref = _load_ref()
    for seed in [0, 1, 12345, 2**33 + 7, 2**63 + 11]:
        rg, mg = ref.Generator(seed), rng_philox.Generator(seed)
        for shape in [(8,), (4, 8, 8), (7,), (3, 5), (1,)]:
            a = np.asarray(rg.randn(shape))
            b = mg.randn(shape)
            assert np.array_equal(a, b), (seed, shape)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference oracle not mounted")
def test_offset_stream_matches():
    ref = _load_ref()
    rg, mg = ref.Generator(99), rng_philox.Generator(99)
    for _ in range(5):
        assert np.array_equal(np.asarray(rg.randn((16,))), mg.randn((16,)))


def test_image_rng_deterministic():
    a = ImageRNG((4, 8, 8), [1234, 1235]).next()
    b = ImageRNG((4, 8, 8), [1234, 1235]).next()
    assert a.shape == (2, 4, 8, 8)
    assert np.array_equal(a, b)
    # per-image streams are independent: single-seed run matches row 0
    c = ImageRNG((4, 8, 8), [1234]).next()
    assert np.array_equal(a[0], c[0])


def test_image_rng_next_advances():
    rng = ImageRNG((4, 8, 8), [7])
    first = rng.next()
    second = rng.next()
    assert not np.array_equal(first, second)


def test_subseed_slerp():
    rng = ImageRNG((4, 8, 8), [1], subseeds=[2], subseed_strength=0.5)
    mixed = rng.next()
    pure = ImageRNG((4, 8, 8), [1]).next()
    assert not np.array_equal(mixed, pure)
    # strength 0 → identical to pure seed noise
    rng0 = ImageRNG((4, 8, 8), [1], subseeds=[2], subseed_strength=0.0)
    assert np.array_equal(rng0.next(), pure)


def test_ensd_changes_stream_not_first():
    base = ImageRNG((4, 8, 8), [5])
    delta = ImageRNG((4, 8, 8), [5], eta_noise_seed_delta=31337)
    assert np.array_equal(base.next(), delta.next())  # first() identical
    assert not np.array_equal(base.next(), delta.next())  # streams diverge
