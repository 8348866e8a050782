"""σ-space prediction wrappers: how a diffusion net's raw output becomes an
x0 ("denoised") estimate, and how latents are noised for a given σ.

Behavioral port of the reference's predictor taxonomy
(backend/modules/k_prediction.py:67-331): discrete eps/v with beta schedules,
EDM, rectified flow, and Flux's resolution-shifted flow. All formulas in
numpy/jnp; σ-tables are small [1000] host arrays.

The model wrapper contract (reference KModel, backend/modules/k_model.py:25):
    input' = calculate_input(σ, x)         (c_in scaling)
    t      = timestep(σ)                   (net's native conditioning)
    out    = net(input', t, ...)
    x0     = calculate_denoised(σ, out, x)
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp


def make_beta_schedule(n: int = 1000, linear_start: float = 0.00085, linear_end: float = 0.012) -> np.ndarray:
    """LDM 'scaled linear' (sqrt-space linear) beta schedule."""
    betas = np.linspace(linear_start**0.5, linear_end**0.5, n, dtype=np.float64) ** 2
    return betas


class AbstractPrediction:
    sigma_data = 1.0

    def __init__(self, sigma_min: float, sigma_max: float):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def calculate_input(self, sigma, noisy):
        sigma = _bc(sigma, noisy)
        return noisy / (sigma**2 + self.sigma_data**2) ** 0.5

    def noise_scaling(self, sigma, noise, latent, max_denoise: bool = False):
        sigma = _bc(sigma, noise)
        if max_denoise:
            noise = noise * (1.0 + sigma**2) ** 0.5
        else:
            noise = noise * sigma
        return noise + latent

    def inverse_noise_scaling(self, sigma, latent):
        return latent


class DiscretePrediction(AbstractPrediction):
    """eps-prediction over a discrete 1000-step beta schedule (SD1.5/2/XL)."""

    def __init__(self, betas: Optional[np.ndarray] = None, prediction_type: str = "eps"):
        betas = make_beta_schedule() if betas is None else betas
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        self.sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod).astype(np.float32)
        self.log_sigmas = np.log(self.sigmas)
        self.prediction_type = prediction_type
        super().__init__(float(self.sigmas[0]), float(self.sigmas[-1]))

    def timestep(self, sigma):
        """σ → fractional t index by piecewise-linear interp in log-σ space
        (the k-diffusion sigma_to_t convention the reference samplers use).
        Host inputs (python/numpy) compute in numpy — schedule generation must
        not emit per-step device ops; traced inputs compute in jnp."""
        xp, table = self._xp(sigma)
        log_sigma = xp.log(xp.asarray(sigma))
        dists = log_sigma[..., None] - table
        low_idx = xp.clip((dists >= 0).sum(axis=-1) - 1, 0, table.shape[0] - 2)
        high_idx = low_idx + 1
        low = table[low_idx]
        high = table[high_idx]
        w = xp.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx

    def sigma(self, timestep):
        xp, table = self._xp(timestep)
        t = xp.clip(xp.asarray(timestep, dtype=xp.float32), 0, len(self.sigmas) - 1)
        low_idx = xp.floor(t).astype(xp.int32)
        high_idx = xp.ceil(t).astype(xp.int32)
        w = t - low_idx
        return xp.exp((1 - w) * table[low_idx] + w * table[high_idx])

    def _xp(self, value):
        if isinstance(value, (int, float, np.ndarray, np.generic)):
            return np, self.log_sigmas
        return jnp, jnp.asarray(self.log_sigmas)

    def calculate_denoised(self, sigma, model_output, noisy):
        sigma = _bc(sigma, noisy)
        if self.prediction_type == "v":
            return noisy * self.sigma_data**2 / (sigma**2 + self.sigma_data**2) - (
                model_output * sigma * self.sigma_data / (sigma**2 + self.sigma_data**2) ** 0.5
            )
        return noisy - model_output * sigma


class PredictionEDM(AbstractPrediction):
    """EDM (Karras) parametrization (Playground etc.)."""

    def __init__(self, sigma_data: float = 0.5, sigma_min: float = 0.002, sigma_max: float = 120.0):
        super().__init__(sigma_min, sigma_max)
        self.sigma_data = sigma_data

    def timestep(self, sigma):
        xp = np if isinstance(sigma, (int, float, np.ndarray, np.generic)) else jnp
        return 0.25 * xp.log(xp.asarray(sigma))

    def sigma(self, timestep):
        xp = np if isinstance(timestep, (int, float, np.ndarray, np.generic)) else jnp
        return xp.exp(xp.asarray(timestep) / 0.25)

    def calculate_denoised(self, sigma, model_output, noisy):
        sigma = _bc(sigma, noisy)
        sd = self.sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / (sigma**2 + sd**2) ** 0.5
        return noisy * c_skip + model_output * c_out


class PredictionFlow(AbstractPrediction):
    """Rectified flow (SD3.x): σ ∈ (0,1], model predicts velocity. The time
    shift is baked into the σ-table; the model's timestep input is the
    shifted σ·1000."""

    def __init__(self, shift: float = 3.0, timesteps: int = 1000):
        self.shift = shift
        t = np.arange(1, timesteps + 1, dtype=np.float64) / timesteps
        self.sigmas = self._shift_sigma(t).astype(np.float32)  # ascending
        super().__init__(float(self.sigmas[0]), float(self.sigmas[-1]))

    def _shift_sigma(self, x):
        return self.shift * x / (1 + (self.shift - 1) * x)

    def calculate_input(self, sigma, noisy):
        return noisy

    def timestep(self, sigma):
        return sigma * 1000.0

    def sigma(self, timestep):
        return self._shift_sigma(timestep / 1000.0)

    def calculate_denoised(self, sigma, model_output, noisy):
        sigma = _bc(sigma, noisy)
        return noisy - model_output * sigma

    def noise_scaling(self, sigma, noise, latent, max_denoise: bool = False):
        sigma = _bc(sigma, noise)
        return sigma * noise + (1.0 - sigma) * latent

    def inverse_noise_scaling(self, sigma, latent):
        sigma = _bc(sigma, latent)
        return latent / (1.0 - sigma)


class PredictionFlux(PredictionFlow):
    """Flux flow with resolution-dependent exponential (mu) time shift
    (reference k_prediction.py:285-322): shift factor exp(mu) where mu is
    linear in the image token count (4096 at 1024², 256 floor)."""

    def __init__(self, seq_len: int = 4096, base_shift: float = 0.5, max_shift: float = 1.15):
        m = (max_shift - base_shift) / (4096 - 256)
        b = base_shift - m * 256
        self.mu = seq_len * m + b
        super().__init__(shift=math.exp(self.mu))

    def _shift_sigma(self, x):
        emu = math.exp(self.mu)
        return emu / (emu + (1.0 / np.maximum(x, 1e-9) - 1.0))


def _bc(sigma, like):
    """Broadcast a per-batch σ against an activation tensor."""
    if np.ndim(sigma) == 0:
        return sigma
    extra = like.ndim - np.ndim(sigma)
    return sigma.reshape(sigma.shape + (1,) * extra)


def rescale_zero_terminal_snr(prediction: DiscretePrediction) -> DiscretePrediction:
    """ZTSNR σ-table rescale (reference k_prediction.py:47) for v-pred
    checkpoints trained with zero terminal SNR."""
    alphas_bar_sqrt = 1.0 / np.sqrt(prediction.sigmas.astype(np.float64) ** 2 + 1.0)
    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt -= aT
    alphas_bar_sqrt *= a0 / (a0 - aT)
    alphas_bar = alphas_bar_sqrt**2
    prediction.sigmas = np.sqrt((1 - alphas_bar) / np.maximum(alphas_bar, 1e-12)).astype(np.float32)
    prediction.log_sigmas = np.log(prediction.sigmas)
    prediction.sigma_max = float(prediction.sigmas[-1])
    return prediction
