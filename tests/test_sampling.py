"""Sampler/schedule math tests.

The constant-denoiser oracle: if the model always predicts x0 = C, then every
consistent ODE sampler must return exactly C after integrating to σ=0
(the probe-flow trajectory is the straight ray through C). Ancestral/SDE
samplers must do the same when their terminal noise injection is zero."""

import numpy as np
import pytest

import jax.numpy as jnp

from forge_tpu.sampling import prediction as P
from forge_tpu.sampling.samplers import SAMPLERS, get_sampler
from forge_tpu.sampling.schedules import SCHEDULES, get_sigmas


@pytest.fixture(scope="module")
def pred():
    return P.DiscretePrediction()


def test_discrete_sigma_table(pred):
    assert pred.sigmas.shape == (1000,)
    assert pred.sigmas[0] < pred.sigmas[-1]
    assert abs(pred.sigma_min - 0.0292) < 1e-3
    assert abs(pred.sigma_max - 14.61) < 0.1


def test_timestep_sigma_roundtrip(pred):
    for t in [0.0, 10.5, 500.0, 999.0]:
        s = float(pred.sigma(np.asarray(t)))
        t2 = float(pred.timestep(np.asarray(s)))
        assert abs(t - t2) < 1e-2, (t, t2)


def test_flow_prediction_shift():
    fp = P.PredictionFlow(shift=3.0)
    assert abs(fp.sigma_max - 1.0) < 1e-6
    # shift moves mid-range sigmas up
    assert float(fp.sigma(np.asarray(500.0))) > 0.5


@pytest.mark.parametrize("name", [n for n, fn in SCHEDULES.items() if fn is not None])
def test_schedules_shape_and_monotonic(name, pred):
    sigmas = get_sigmas(name, 12, pred)
    assert sigmas[-1] == 0.0
    core = sigmas[:-1]
    assert len(sigmas) == 13
    assert np.all(np.diff(core) < 1e-7), name  # non-increasing
    assert core[0] > core[-1] > 0


def test_discard_penultimate(pred):
    base = get_sigmas("karras", 10, pred)
    disc = get_sigmas("karras", 10, pred, discard_next_to_last=True)
    assert len(disc) == len(base)
    assert disc[-1] == 0 and disc[-2] != base[-2]


SHAPE = (1, 8, 8, 4)


def _run(name, sigmas, const):
    info = get_sampler(name)
    if info.needs_uncond:  # CFG++ family: model_fn returns (x0, x0_uncond)
        model_fn = lambda x, sigma: (jnp.full_like(x, const), jnp.full_like(x, const))
    else:
        model_fn = lambda x, sigma: jnp.full_like(x, const)
    x0 = jnp.full(SHAPE, 5.0)
    x = x0 * sigmas[0]
    noise = None
    if info.noise_draws:
        noise = jnp.zeros((len(sigmas) - 1, info.noise_draws) + SHAPE)
    kwargs = {}
    if info.noise_draws:
        kwargs["noise"] = noise
    return np.asarray(info.fn(model_fn, x, jnp.asarray(sigmas), **kwargs))


@pytest.mark.parametrize("name", list(SAMPLERS.keys()))
def test_constant_denoiser_convergence(name, pred):
    info = get_sampler(name)
    sigmas = get_sigmas("karras", 8, pred, discard_next_to_last=info.discard_next_to_last_sigma)
    out = _run(name, sigmas, const=3.0)
    tol = 2e-2
    if name in ("DPM fast", "DPM adaptive"):
        # these integrate to σ_min, not 0 (reference passes sigma_sched[-2]):
        # the exact residual is d·σ_min along the constant-denoiser ray
        tol += float(sigmas[-2]) * abs(5.0 * sigmas[0] - 3.0) / float(sigmas[0])
    assert np.abs(out - 3.0).max() < tol, name


def test_euler_exact_trajectory(pred):
    # euler with constant denoiser: x_{i+1} - C = (x_i - C)·σ_{i+1}/σ_i exactly
    sigmas = np.asarray([2.0, 1.0, 0.5, 0.0], np.float32)
    info = get_sampler("Euler")
    c = 1.5
    model_fn = lambda x, sigma: jnp.full_like(x, c)
    x = jnp.full(SHAPE, 4.0)
    out = np.asarray(info.fn(model_fn, x, jnp.asarray(sigmas)))
    assert np.allclose(out, c, atol=1e-5)


def test_ancestral_noise_changes_result(pred):
    sigmas = get_sigmas("karras", 6, pred)
    info = get_sampler("Euler a")
    model_fn = lambda x, sigma: x * 0.5
    x = jnp.full(SHAPE, 5.0) * sigmas[0]
    n1 = jnp.zeros((6, 1) + SHAPE)
    n2 = jnp.ones((6, 1) + SHAPE)
    a = np.asarray(info.fn(model_fn, x, jnp.asarray(sigmas), noise=n1))
    b = np.asarray(info.fn(model_fn, x, jnp.asarray(sigmas), noise=n2))
    assert not np.allclose(a, b)


def test_ztsnr_rescale(pred):
    p2 = P.rescale_zero_terminal_snr(P.DiscretePrediction(prediction_type="v"))
    assert p2.sigma_max > 1e4  # terminal SNR → 0 means σ_max → huge
