"""Brownian-tree SDE noise: determinism, bridge consistency, schedule
stability (reference BrownianTreeNoiseSampler semantics,
modules/sd_samplers_common.py:343-350)."""

import numpy as np

from forge_tpu.sampling.brownian import BrownianTree, brownian_step_noise


def test_deterministic_per_seed():
    a = BrownianTree((4, 4), 42).increment(0.1, 0.7)
    b = BrownianTree((4, 4), 42).increment(0.1, 0.7)
    c = BrownianTree((4, 4), 43).increment(0.1, 0.7)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_bridge_consistency():
    t = BrownianTree((8, 8), 7)
    w_full = t.increment(0.0, 1.0)  # = W(1)/1
    a = t.increment(0.0, 0.5)
    b = t.increment(0.5, 1.0)
    np.testing.assert_allclose(w_full, (a + b) * np.sqrt(0.5), rtol=1e-5, atol=1e-6)


def test_schedule_stability():
    """Doubling the step count must keep the same underlying path."""
    sig10 = np.append(np.linspace(10, 0.1, 11), 0)
    sig20 = np.append(np.linspace(10, 0.1, 21), 0)
    n10 = brownian_step_noise(sig10, (2, 2, 1), [7])
    n20 = brownian_step_noise(sig20, (2, 2, 1), [7])
    lhs = n10[0, 0, 0] * np.sqrt(sig10[0] - sig10[1])
    rhs = (n20[0, 0, 0] * np.sqrt(sig20[0] - sig20[1])
           + n20[1, 0, 0] * np.sqrt(sig20[1] - sig20[2]))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-5)


def test_unit_variance_and_final_step_zero():
    sig = np.append(np.linspace(14.6, 0.03, 21), 0)
    n = brownian_step_noise(sig, (16, 16, 4), [1, 2, 3])
    assert n.shape == (21, 1, 3, 16, 16, 4)
    assert abs(float(np.std(n[:-1])) - 1.0) < 0.08
    assert np.all(n[-1] == 0)  # σ_next == 0 draws no noise


def test_per_image_seeds_differ():
    sig = np.append(np.linspace(10, 0.1, 6), 0)
    n = brownian_step_noise(sig, (4, 4, 2), [5, 6])
    assert np.abs(n[:, :, 0] - n[:, :, 1]).max() > 1e-3
