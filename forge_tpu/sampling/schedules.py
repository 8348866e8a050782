"""Named σ-schedules (reference modules/sd_schedulers.py:29-228, 16 entries).

Each schedule maps (n_steps, σ_min, σ_max, predictor) → descending float32
σ array of length n+1 ending in 0. All host-side numpy: schedules are tiny
and precomputed before the compiled sampling loop.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import numpy as np


def _append_zero(sigmas: np.ndarray) -> np.ndarray:
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def karras(n, sigma_min, sigma_max, predictor=None, rho: float = 7.0):
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return _append_zero(sigmas)


def exponential(n, sigma_min, sigma_max, predictor=None):
    sigmas = np.exp(np.linspace(math.log(sigma_max), math.log(sigma_min), n, dtype=np.float64))
    return _append_zero(sigmas)


def polyexponential(n, sigma_min, sigma_max, predictor=None, rho: float = 1.0):
    ramp = np.linspace(1, 0, n, dtype=np.float64) ** rho
    sigmas = np.exp(ramp * (math.log(sigma_max) - math.log(sigma_min)) + math.log(sigma_min))
    return _append_zero(sigmas)


def normal(n, sigma_min, sigma_max, predictor):
    """Uniform in the predictor's timestep space ('normal'/'uniform')."""
    start = predictor.timestep(np.asarray(sigma_max, dtype=np.float64))
    end = predictor.timestep(np.asarray(sigma_min, dtype=np.float64))
    ts = np.linspace(float(start), float(end), n, dtype=np.float64)
    sigmas = np.asarray([float(predictor.sigma(np.asarray(t))) for t in ts])
    return _append_zero(sigmas)


def sgm_uniform(n, sigma_min, sigma_max, predictor):
    """Like normal but sampling n+1 points and dropping the final one before
    the trailing zero (SGM convention; needed by turbo/lightning models)."""
    start = predictor.timestep(np.asarray(sigma_max, dtype=np.float64))
    end = predictor.timestep(np.asarray(sigma_min, dtype=np.float64))
    ts = np.linspace(float(start), float(end), n + 1, dtype=np.float64)[:-1]
    sigmas = np.asarray([float(predictor.sigma(np.asarray(t))) for t in ts])
    return _append_zero(sigmas)


def simple(n, sigma_min, sigma_max, predictor):
    table = predictor.sigmas  # ascending [1000]
    ss = len(table) / n
    sigmas = [float(table[-(1 + int(x * ss))]) for x in range(n)]
    return _append_zero(np.asarray(sigmas))


def ddim_uniform(n, sigma_min, sigma_max, predictor):
    table = predictor.sigmas
    ss = max(len(table) // n, 1)
    timesteps = list(range(1, len(table), ss))[:n]
    sigmas = [float(table[t]) for t in reversed(timesteps)]
    return _append_zero(np.asarray(sigmas))


def kl_optimal(n, sigma_min, sigma_max, predictor=None):
    """AYS paper's KL-optimal analytic schedule (arXiv:2404.14507 eq. 33)."""
    adj_idxs = np.arange(n, dtype=np.float64) / (n - 1)
    sigmas = np.tan(adj_idxs * math.atan(sigma_min) + (1 - adj_idxs) * math.atan(sigma_max))
    return _append_zero(sigmas)


# Align-Your-Steps anchor tables (NVIDIA AYS, public):
_AYS_SD15 = [14.615, 6.315, 3.771, 2.181, 1.342, 0.862, 0.555, 0.380, 0.234, 0.113, 0.029]
_AYS_SDXL = [14.615, 6.315, 3.771, 2.181, 1.342, 0.862, 0.555, 0.380, 0.234, 0.113, 0.029]
_AYS_SD15_REAL = [14.615, 9.473, 6.500, 4.003, 2.437, 1.531, 0.978, 0.643, 0.436, 0.284, 0.175, 0.107, 0.058, 0.029]


def _loglinear_interp(t_steps, num_steps):
    """Log-linearly resample an anchor σ-list to num_steps points."""
    xs = np.linspace(0, 1, len(t_steps))
    ys = np.log(np.asarray(t_steps)[::-1])
    new_xs = np.linspace(0, 1, num_steps)
    new_ys = np.interp(new_xs, xs, ys)
    return np.exp(new_ys)[::-1].copy()


def align_your_steps(n, sigma_min, sigma_max, predictor=None, anchors=None):
    anchors = anchors or _AYS_SD15
    if n != len(anchors):
        sigmas = _loglinear_interp(anchors, n)
    else:
        sigmas = np.asarray(anchors, dtype=np.float64)
    return _append_zero(sigmas)


def align_your_steps_11(n, sigma_min, sigma_max, predictor=None):
    # preset anchor list resampled to the requested step count
    return align_your_steps(n, sigma_min, sigma_max, predictor, anchors=_AYS_SD15)


def align_your_steps_32(n, sigma_min, sigma_max, predictor=None):
    return align_your_steps(n, sigma_min, sigma_max, predictor, anchors=_AYS_SD15_REAL)


def beta_schedule(n, sigma_min, sigma_max, predictor=None, alpha: float = 0.6, beta: float = 0.6):
    import scipy.stats

    timesteps = 1 - np.linspace(0, 1, n)
    timesteps = scipy.stats.beta.ppf(timesteps, alpha, beta)
    sigmas = sigma_min + (timesteps * (sigma_max - sigma_min))
    return _append_zero(sigmas)


def turbo(n, sigma_min, sigma_max, predictor):
    """Trailing timesteps for few-step distilled models."""
    table = predictor.sigmas
    ts = [int(max(1000 / n * (n - i) - 1, 0)) for i in range(n)]
    sigmas = [float(predictor.sigma(np.asarray(float(t)))) for t in ts]
    return _append_zero(np.asarray(sigmas))


SCHEDULES: Dict[str, Callable] = {
    "automatic": None,  # resolved by the sampler (karras-default samplers etc.)
    "uniform": normal,
    "normal": normal,
    "karras": karras,
    "exponential": exponential,
    "polyexponential": polyexponential,
    "sgm_uniform": sgm_uniform,
    "kl_optimal": kl_optimal,
    "align_your_steps": align_your_steps,
    "align_your_steps_11": align_your_steps_11,
    "align_your_steps_32": align_your_steps_32,
    "simple": simple,
    "ddim": ddim_uniform,
    "beta": beta_schedule,
    "turbo": turbo,
}


def get_sigmas(
    name: str,
    n: int,
    predictor,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    discard_next_to_last: bool = False,
) -> np.ndarray:
    """Resolve a named schedule against a predictor. `discard_next_to_last`
    reproduces the reference's 'discard penultimate sigma' sampler quirk
    (sd_samplers_kdiffusion.py:81-134, needed by dpm2/dpm2-a samplers)."""
    sigma_min = predictor.sigma_min if sigma_min is None else sigma_min
    sigma_max = predictor.sigma_max if sigma_max is None else sigma_max
    steps = n + 1 if discard_next_to_last else n
    fn = SCHEDULES.get(name) or karras
    sigmas = fn(steps, sigma_min, sigma_max, predictor)
    if discard_next_to_last:
        sigmas = np.concatenate([sigmas[:-2], sigmas[-1:]])
    return sigmas.astype(np.float32)
