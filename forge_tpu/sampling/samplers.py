"""Diffusion samplers as jax.lax.scan loops.

Re-derives the k-diffusion integrator family the reference vendors
(k_diffusion/sampling.py, 978 LoC of torch) as compiled scan bodies: the whole
denoise loop — every model call, CFG combine, and integrator update — is one
XLA program. Per-step gaussian noise for ancestral/SDE samplers is precomputed
host-side from the Philox stream (matching seeds) and fed as scan inputs.

`model_fn(x, sigma) -> denoised` is the σ-space denoised (x0) prediction,
already CFG-combined (built by sampling/cfg.py).

All samplers share the conventions:
    d = to_d(x, σ, denoised) = (x - denoised) / σ         (probe direction)
    ancestral split: σ_up = min(σ_next, η·sqrt(σ_next²·(σ²-σ_next²)/σ²)),
                     σ_down = sqrt(σ_next² - σ_up²)
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


def to_d(x, sigma, denoised):
    return (x - denoised) / sigma


def ancestral_step(sigma_from, sigma_to, eta=1.0):
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / jnp.maximum(sigma_from**2, 1e-20)),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def _scan(step_fn, x, carry_extra, sigmas: jax.Array, noise: Optional[jax.Array]):
    """Run step_fn over (σ_i, σ_{i+1}, noise_i). sigmas: [n+1]; noise: [n, k, ...]."""
    n = sigmas.shape[0] - 1
    xs = {
        "sigma": sigmas[:-1],
        "sigma_next": sigmas[1:],
        "i": jnp.arange(n),
    }
    if noise is not None:
        xs["noise"] = noise

    def body(carry, step_in):
        new_carry = step_fn(carry, step_in)
        return new_carry, None

    carry0 = {"x": x, **carry_extra}
    final, _ = jax.lax.scan(body, carry0, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# first-order


def sample_euler(model_fn: ModelFn, x, sigmas, noise=None, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    n = sigmas.shape[0] - 1

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        sigma_hat = sigma
        xx = c["x"]
        if s_churn > 0 and noise is not None:
            gamma = jnp.where(
                (sigma >= s_tmin) & (sigma <= s_tmax),
                jnp.minimum(s_churn / n, 2**0.5 - 1),
                0.0,
            )
            sigma_hat = sigma * (gamma + 1)
            eps = s["noise"][0] * s_noise
            xx = xx + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        denoised = model_fn(xx, sigma_hat)
        d = to_d(xx, sigma_hat, denoised)
        return {"x": xx + d * (sigma_next - sigma_hat)}

    nz = noise if s_churn > 0 else None
    return _scan(step, x, {}, sigmas, nz)


def sample_euler_ancestral(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        sigma_down, sigma_up = ancestral_step(sigma, sigma_next, eta)
        d = to_d(c["x"], sigma, denoised)
        xx = c["x"] + d * (sigma_down - sigma)
        xx = jnp.where(sigma_next > 0, xx + s["noise"][0] * s_noise * sigma_up, xx)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


# ---------------------------------------------------------------------------
# second-order single-step


def sample_heun(model_fn: ModelFn, x, sigmas, noise=None, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        d = to_d(c["x"], sigma, denoised)
        dt = sigma_next - sigma
        x_euler = c["x"] + d * dt

        def heun_correct(xe):
            denoised_2 = model_fn(xe, sigma_next)
            d_2 = to_d(xe, sigma_next, denoised_2)
            return c["x"] + (d + d_2) / 2 * dt

        xx = jnp.where(sigma_next == 0, x_euler, heun_correct(x_euler))
        return {"x": xx}

    return _scan(step, x, {}, sigmas, None)


def sample_dpm_2(model_fn: ModelFn, x, sigmas, noise=None, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        d = to_d(c["x"], sigma, denoised)
        x_euler = c["x"] + d * (sigma_next - sigma)

        sigma_mid = jnp.exp(0.5 * (jnp.log(sigma) + jnp.log(jnp.maximum(sigma_next, 1e-10))))
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_next - sigma
        x_2 = c["x"] + d * dt_1
        denoised_2 = model_fn(x_2, sigma_mid)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        x_mid = c["x"] + d_2 * dt_2

        xx = jnp.where(sigma_next == 0, x_euler, x_mid)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, None)


def sample_dpm_2_ancestral(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        sigma_down, sigma_up = ancestral_step(sigma, sigma_next, eta)
        d = to_d(c["x"], sigma, denoised)
        x_euler = c["x"] + d * (sigma_down - sigma)

        sigma_mid = jnp.exp(0.5 * (jnp.log(sigma) + jnp.log(jnp.maximum(sigma_down, 1e-10))))
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_down - sigma
        x_2 = c["x"] + d * dt_1
        denoised_2 = model_fn(x_2, sigma_mid)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        x_anc = c["x"] + d_2 * dt_2 + s["noise"][0] * s_noise * sigma_up

        xx = jnp.where(sigma_down == 0, x_euler, x_anc)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


def sample_dpmpp_2s_ancestral(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0):
    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def sig_of(t):
        return jnp.exp(-t)

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        sigma_down, sigma_up = ancestral_step(sigma, sigma_next, eta)

        # Euler fallback for the final (σ_down == 0) step
        d = to_d(c["x"], sigma, denoised)
        x_euler = c["x"] + d * (sigma_down - sigma)

        t, t_next = t_of(sigma), t_of(jnp.maximum(sigma_down, 1e-10))
        r = 1 / 2
        h = t_next - t
        s_mid = t + r * h
        x_2 = (sig_of(s_mid) / sig_of(t)) * c["x"] - jnp.expm1(-h * r) * denoised
        denoised_2 = model_fn(x_2, sig_of(s_mid))
        x_dpm = (sig_of(t_next) / sig_of(t)) * c["x"] - jnp.expm1(-h) * denoised_2

        xx = jnp.where(sigma_down == 0, x_euler, x_dpm)
        xx = jnp.where(sigma_next > 0, xx + s["noise"][0] * s_noise * sigma_up, xx)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


# ---------------------------------------------------------------------------
# DPM++ multistep


def sample_dpmpp_2m(model_fn: ModelFn, x, sigmas, noise=None):
    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        t, t_next = t_of(sigma), t_of(sigma_next)
        h = t_next - t
        ratio = sigma_next / sigma

        first_or_last = (c["h_last"] == 0.0) | (sigma_next == 0)
        r = c["h_last"] / jnp.where(c["h_last"] == 0, 1.0, h)
        denoised_d = jnp.where(
            first_or_last,
            denoised,
            (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * c["old_denoised"],
        )
        xx = ratio * c["x"] - jnp.expm1(-h) * denoised_d
        return {"x": xx, "old_denoised": denoised, "h_last": h}

    n = sigmas.shape[0] - 1

    def body(carry, step_in):
        return step(carry, step_in), None

    carry0 = {"x": x, "old_denoised": jnp.zeros_like(x), "h_last": jnp.asarray(0.0, jnp.float32)}
    xs = {"sigma": sigmas[:-1], "sigma_next": sigmas[1:]}
    final, _ = jax.lax.scan(body, carry0, xs)
    return final["x"]


def sample_dpmpp_sde(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0, r=1 / 2):
    """DPM++ SDE (2-stage). noise: [n, 2, ...] — two draws per step."""

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def sig_of(t):
        return jnp.exp(-t)

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        d = to_d(c["x"], sigma, denoised)
        x_euler = c["x"] + d * (sigma_next - sigma)

        t, t_next = t_of(sigma), t_of(jnp.maximum(sigma_next, 1e-10))
        h = t_next - t
        s_mid = t + h * r

        # Step 1
        sd, su = ancestral_step(sig_of(t), sig_of(s_mid), eta)
        s_ = t_of(sd)
        x_2 = (sig_of(s_) / sig_of(t)) * c["x"] - jnp.expm1(t - s_) * denoised
        x_2 = x_2 + s["noise"][0] * s_noise * su
        denoised_2 = model_fn(x_2, sig_of(s_mid))

        # Step 2
        sd2, su2 = ancestral_step(sig_of(t), sig_of(t_next), eta)
        t_next_ = t_of(sd2)
        denoised_d = (1 - 1 / (2 * r)) * denoised + (1 / (2 * r)) * denoised_2
        x_dpm = (sig_of(t_next_) / sig_of(t)) * c["x"] - jnp.expm1(t - t_next_) * denoised_d
        x_dpm = x_dpm + s["noise"][1] * s_noise * su2

        xx = jnp.where(sigma_next == 0, x_euler, x_dpm)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


def sample_dpmpp_2m_sde(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0, solver_type="midpoint"):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)

        t, t_next = -jnp.log(jnp.maximum(sigma, 1e-10)), -jnp.log(jnp.maximum(sigma_next, 1e-10))
        h = t_next - t
        eta_h = eta * h

        xx = (
            (sigma_next / sigma) * jnp.exp(-eta_h) * c["x"]
            + (-jnp.expm1(-h - eta_h)) * denoised
        )

        r = c["h_last"] / jnp.where(c["h_last"] == 0, 1.0, h)
        if solver_type == "heun":
            corr = (-jnp.expm1(-h - eta_h) / (-h - eta_h) + 1) * (denoised - c["old_denoised"]) / jnp.where(r == 0, 1.0, r)
        else:  # midpoint
            corr = 0.5 * (-jnp.expm1(-h - eta_h)) * (denoised - c["old_denoised"]) / jnp.where(r == 0, 1.0, r)
        xx = jnp.where(c["h_last"] == 0.0, xx, xx + corr)

        if eta:
            sigma_up = sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0))
            xx = xx + s["noise"][0] * s_noise * sigma_up

        xx = jnp.where(sigma_next == 0, denoised, xx)
        return {"x": xx, "old_denoised": denoised, "h_last": h}

    n = sigmas.shape[0] - 1

    def body(carry, step_in):
        return step(carry, step_in), None

    carry0 = {"x": x, "old_denoised": jnp.zeros_like(x), "h_last": jnp.asarray(0.0, jnp.float32)}
    xs = {"sigma": sigmas[:-1], "sigma_next": sigmas[1:], "noise": noise}
    final, _ = jax.lax.scan(body, carry0, xs)
    return final["x"]


def sample_dpmpp_3m_sde(model_fn: ModelFn, x, sigmas, noise, eta=1.0, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)

        t, t_next = -jnp.log(jnp.maximum(sigma, 1e-10)), -jnp.log(jnp.maximum(sigma_next, 1e-10))
        h = t_next - t
        h_eta = h * (eta + 1)

        xx = jnp.exp(-h_eta) * c["x"] + (-jnp.expm1(-h_eta)) * denoised

        def with_two(xx):
            h_1, h_2 = c["h_1"], c["h_2"]
            r0 = h_1 / h
            r1 = h_2 / h
            d1_0 = (denoised - c["denoised_1"]) / r0
            d1_1 = (c["denoised_1"] - c["denoised_2"]) / r1
            d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
            d2 = (d1_0 - d1_1) / (r0 + r1)
            phi_2 = jnp.expm1(-h_eta) / h_eta + 1
            phi_3 = phi_2 / h_eta - 0.5
            return xx + phi_2 * d1 - phi_3 * d2

        def with_one(xx):
            h_1 = c["h_1"]
            r = h_1 / h
            d = (denoised - c["denoised_1"]) / r
            phi_2 = jnp.expm1(-h_eta) / h_eta + 1
            return xx + phi_2 * d

        have1 = c["h_1"] != 0.0
        have2 = c["h_2"] != 0.0
        xx = jnp.where(have1 & have2, with_two(xx), jnp.where(have1, with_one(xx), xx))

        if eta:
            sigma_up = sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h * eta), 0.0))
            xx = xx + s["noise"][0] * s_noise * sigma_up

        xx = jnp.where(sigma_next == 0, denoised, xx)
        return {
            "x": xx,
            "denoised_1": denoised,
            "denoised_2": c["denoised_1"],
            "h_1": h,
            "h_2": c["h_1"],
        }

    def body(carry, step_in):
        return step(carry, step_in), None

    carry0 = {
        "x": x,
        "denoised_1": jnp.zeros_like(x),
        "denoised_2": jnp.zeros_like(x),
        "h_1": jnp.asarray(0.0, jnp.float32),
        "h_2": jnp.asarray(0.0, jnp.float32),
    }
    xs = {"sigma": sigmas[:-1], "sigma_next": sigmas[1:], "noise": noise}
    final, _ = jax.lax.scan(body, carry0, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# linear multistep (coefficients precomputed host-side)


def _lms_coeffs(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Integrated Lagrange-basis coefficients per step, [n, order]."""
    import scipy.integrate

    sig = np.asarray(sigmas, dtype=np.float64)
    n = len(sig) - 1
    coeffs = np.zeros((n, order))
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            def fn(tau, j=j, i=i):
                prod = 1.0
                for k in range(cur_order):
                    if k == j:
                        continue
                    prod *= (tau - sig[i - k]) / (sig[i - j] - sig[i - k])
                return prod

            coeffs[i, j] = scipy.integrate.quad(fn, sig[i], sig[i + 1], epsrel=1e-4)[0]
    return coeffs.astype(np.float32)


def sample_lms(model_fn: ModelFn, x, sigmas, noise=None, order: int = 4):
    coeffs = jnp.asarray(_lms_coeffs(np.asarray(sigmas), order))

    def body(carry, step_in):
        sigma = step_in["sigma"]
        cs = step_in["coeffs"]  # [order]
        denoised = model_fn(carry["x"], sigma)
        d = to_d(carry["x"], sigma, denoised)
        ds = jnp.concatenate([d[None], carry["ds"][:-1]], axis=0)  # newest first
        xx = carry["x"] + jnp.tensordot(cs, ds, axes=1)
        return {"x": xx, "ds": ds}, None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    xs = {"sigma": sigmas[:-1], "coeffs": coeffs}
    final, _ = jax.lax.scan(body, {"x": x, "ds": ds0}, xs)
    return final["x"]


def sample_heunpp2(model_fn: ModelFn, x, sigmas, noise=None, s_noise=1.0):
    """Heun++ (MIT-licensed sd-webui-samplers-scheduler variant the reference
    vendors): third probe direction on interior steps, σ-weighted blend."""
    sig = np.asarray(sigmas, np.float32)
    sigma0 = float(sig[0])
    n = len(sig) - 1
    sig_next2 = np.concatenate([sig[2:], [0.0]]).astype(np.float32)  # σ_{i+2}

    def step(c, s):
        sigma, sigma_next, sigma_next2 = s["sigma"], s["sigma_next"], s["sigma_next2"]
        xx = c["x"]
        denoised = model_fn(xx, sigma)
        d = to_d(xx, sigma, denoised)
        dt = sigma_next - sigma

        x_euler = xx + d * dt

        x_2 = xx + d * dt
        denoised_2 = model_fn(x_2, jnp.maximum(sigma_next, 1e-8))
        d_2 = to_d(x_2, jnp.maximum(sigma_next, 1e-8), denoised_2)

        w2h = sigma_next / (2 * sigma0)
        x_heun = xx + (d * (1 - w2h) + d_2 * w2h) * dt

        dt_2 = sigma_next2 - sigma_next
        x_3 = x_2 + d_2 * dt_2
        denoised_3 = model_fn(x_3, jnp.maximum(sigma_next2, 1e-8))
        d_3 = to_d(x_3, jnp.maximum(sigma_next2, 1e-8), denoised_3)
        w2 = sigma_next / (3 * sigma0)
        w3 = sigma_next2 / (3 * sigma0)
        x_hpp = xx + ((1 - w2 - w3) * d + w2 * d_2 + w3 * d_3) * dt

        xx = jnp.where(sigma_next == 0, x_euler,
                       jnp.where(sigma_next2 == 0, x_heun, x_hpp))
        return {"x": xx}

    def body(carry, step_in):
        return step(carry, step_in), None

    xs = {"sigma": jnp.asarray(sig[:-1]), "sigma_next": jnp.asarray(sig[1:]),
          "sigma_next2": jnp.asarray(sig_next2[: n])}
    final, _ = jax.lax.scan(body, {"x": x}, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# Adams-Bashforth multistep (ipndm family)

_AB_COEFFS = (
    (1.0,),
    (3 / 2, -1 / 2),
    (23 / 12, -16 / 12, 5 / 12),
    (55 / 24, -59 / 24, 37 / 24, -9 / 24),
)


def sample_ipndm(model_fn: ModelFn, x, sigmas, noise=None, order: int = 4):
    """Improved pseudo-numerical method: fixed-coefficient Adams-Bashforth
    over the probe-flow derivative, warming up through orders 1..4."""

    def body(carry, s):
        sigma, sigma_next, i = s["sigma"], s["sigma_next"], s["i"]
        denoised = model_fn(carry["x"], sigma)
        d = to_d(carry["x"], sigma, denoised)
        ds = jnp.concatenate([d[None], carry["ds"][:-1]], axis=0)  # newest first
        dt = sigma_next - sigma

        cur_order = jnp.minimum(i + 1, order)
        update = jnp.zeros_like(d)
        for o in range(1, order + 1):
            coeffs = _AB_COEFFS[o - 1] + (0.0,) * (order - o)
            contrib = sum(c * ds[j] for j, c in enumerate(coeffs))
            update = jnp.where(cur_order == o, contrib, update)
        return {"x": carry["x"] + dt * update, "ds": ds}, None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    xs = {"sigma": jnp.asarray(sigmas[:-1]), "sigma_next": jnp.asarray(sigmas[1:]),
          "i": jnp.arange(len(sigmas) - 1)}
    final, _ = jax.lax.scan(body, {"x": x, "ds": ds0}, xs)
    return final["x"]


def sample_ipndm_v(model_fn: ModelFn, x, sigmas, noise=None, order: int = 4):
    """Variable-step ipndm: Adams-Bashforth coefficients recomputed from the
    actual step-size ratios each step (k-diffusion sample_ipndm_v)."""
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    coeff_table = np.zeros((n, order))
    # closed-form variable-step coefficients exactly as published in the
    # zju-pi diff-sampler solvers (Apache-2; what k-diffusion vendors at
    # sampling.py:829-900) — NOT the textbook Adams-Bashforth quadrature,
    # which differs at 3rd/4th order.
    for i in range(n):
        cur = min(i + 1, order)
        if cur == 1:
            coeff_table[i, 0] = 1.0
            continue
        h_n = sig[i + 1] - sig[i]
        h_1 = sig[i] - sig[i - 1]
        if cur == 2:
            coeff_table[i, 0] = (2 + h_n / h_1) / 2
            coeff_table[i, 1] = -(h_n / h_1) / 2
            continue
        h_2 = sig[i - 1] - sig[i - 2]
        if cur == 3:
            temp = (1 - h_n / (3 * (h_n + h_1)) * (h_n * (h_n + h_1)) / (h_1 * (h_1 + h_2))) / 2
            coeff_table[i, 0] = (2 + h_n / h_1) / 2 + temp
            coeff_table[i, 1] = -(h_n / h_1) / 2 - (1 + h_1 / h_2) * temp
            coeff_table[i, 2] = temp * h_1 / h_2
            continue
        h_3 = sig[i - 2] - sig[i - 3]
        t1 = (1 - h_n / (3 * (h_n + h_1)) * (h_n * (h_n + h_1)) / (h_1 * (h_1 + h_2))) / 2
        t2 = ((1 - h_n / (3 * (h_n + h_1))) / 2
              + (1 - h_n / (2 * (h_n + h_1))) * h_n / (6 * (h_n + h_1 + h_2))) \
            * (h_n * (h_n + h_1) * (h_n + h_1 + h_2)) / (h_1 * (h_1 + h_2) * (h_1 + h_2 + h_3))
        coeff_table[i, 0] = (2 + h_n / h_1) / 2 + t1 + t2
        coeff_table[i, 1] = -(h_n / h_1) / 2 - (1 + h_1 / h_2) * t1 \
            - (1 + h_1 / h_2 + h_1 * (h_1 + h_2) / (h_2 * (h_2 + h_3))) * t2
        coeff_table[i, 2] = t1 * h_1 / h_2 \
            + (h_1 / h_2 + h_1 * (h_1 + h_2) / (h_2 * (h_2 + h_3)) * (1 + h_2 / h_3)) * t2
        coeff_table[i, 3] = -t2 * (h_1 * (h_1 + h_2) / (h_2 * (h_2 + h_3))) * h_1 / h_2
    coeffs = jnp.asarray(coeff_table, jnp.float32)

    def body(carry, s):
        sigma, sigma_next, cs = s["sigma"], s["sigma_next"], s["coeffs"]
        denoised = model_fn(carry["x"], sigma)
        d = to_d(carry["x"], sigma, denoised)
        ds = jnp.concatenate([d[None], carry["ds"][:-1]], axis=0)
        dt = sigma_next - sigma
        update = jnp.tensordot(cs, ds, axes=1)
        return {"x": carry["x"] + dt * update, "ds": ds}, None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    xs = {"sigma": jnp.asarray(sigmas[:-1]), "sigma_next": jnp.asarray(sigmas[1:]),
          "coeffs": coeffs}
    final, _ = jax.lax.scan(body, {"x": x, "ds": ds0}, xs)
    return final["x"]


def sample_ddpm(model_fn: ModelFn, x, sigmas, noise, s_noise=1.0):
    """Exact DDPM ancestral update expressed in σ-space (the Forge alter
    sampler, backend/modules/k_diffusion_extra.py): ᾱ = 1/(1+σ²)."""

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        abar_t = 1.0 / (1.0 + sigma**2)
        abar_prev = 1.0 / (1.0 + sigma_next**2)
        alpha_t = abar_t / abar_prev
        beta_t = 1.0 - alpha_t

        eps = (c["x"] - denoised) / sigma
        # DDPM-space mean, mapped back to σ-space coordinates
        x_ddpm = c["x"] * jnp.sqrt(abar_t)
        mean = (x_ddpm - beta_t / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(alpha_t)
        xx = mean / jnp.sqrt(abar_prev)
        sigma_up = jnp.sqrt(beta_t) / jnp.sqrt(abar_prev)
        xx = jnp.where(sigma_next > 0, xx + s["noise"][0] * s_noise * sigma_up, denoised)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


# ---------------------------------------------------------------------------
# LCM / DDIM


def sample_lcm(model_fn: ModelFn, x, sigmas, noise, s_noise=1.0):
    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        xx = jnp.where(sigma_next > 0, denoised + sigma_next * s["noise"][0], denoised)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise)


def sample_ddim(model_fn: ModelFn, x, sigmas, noise=None, eta=0.0):
    """DDIM in σ-space: with η=0 identical to Euler on the ddim schedule."""

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        denoised = model_fn(c["x"], sigma)
        sigma_down, sigma_up = ancestral_step(sigma, sigma_next, eta)
        d = to_d(c["x"], sigma, denoised)
        xx = c["x"] + d * (sigma_down - sigma)
        if eta > 0 and noise is not None:
            xx = jnp.where(sigma_next > 0, xx + s["noise"][0] * sigma_up, xx)
        return {"x": xx}

    return _scan(step, x, {}, sigmas, noise if eta > 0 else None)


# ---------------------------------------------------------------------------
# restart sampling (reference modules/sd_samplers_extra.py:7 — Heun steps over
# an expanded step list with noise re-injection at each restart jump)


def _karras_np(n, sigma_min, sigma_max, rho=7.0):
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    lo, hi = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    return np.append((hi + ramp * (lo - hi)) ** rho, 0.0).astype(np.float32)


def _restart_plan(sigmas: np.ndarray):
    """Expanded (σ_old, σ_new, noise_scale, jump_idx) step list, host-side."""
    sig = np.asarray(sigmas, np.float64)
    steps = len(sig) - 1
    restart_list = {}
    if steps >= 20:
        restart_steps, restart_times = 9, 1
        if steps >= 36:
            restart_steps, restart_times = steps // 4, 2
        sig = _karras_np(steps - restart_steps * restart_times,
                         float(sig[-2]), float(sig[0])).astype(np.float64)
        restart_list = {0.1: [restart_steps + 1, restart_times, 2]}
    restart_list = {int(np.argmin(np.abs(sig - key))): value
                    for key, value in restart_list.items()}
    pairs = []
    for i in range(len(sig) - 1):
        pairs.append((sig[i], sig[i + 1]))
        if i + 1 in restart_list:
            r_steps, r_times, r_max = restart_list[i + 1]
            min_idx, max_idx = i + 1, int(np.argmin(np.abs(sig - r_max)))
            if max_idx < min_idx:
                sr = _karras_np(r_steps, float(sig[min_idx]), float(sig[max_idx]))[:-1]
                for _ in range(r_times):
                    pairs.extend(zip(sr[:-1], sr[1:]))
    old = np.asarray([p[0] for p in pairs], np.float32)
    new = np.asarray([p[1] for p in pairs], np.float32)
    # noise is injected whenever σ jumps back up (last_new < old)
    scale = np.zeros(len(pairs), np.float32)
    jump = np.zeros(len(pairs), np.int32)
    nj = 0
    for k in range(1, len(pairs)):
        if new[k - 1] < old[k]:
            scale[k] = np.sqrt(max(old[k] ** 2 - new[k - 1] ** 2, 0.0))
            jump[k] = nj
            nj += 1
    return old, new, scale, jump


def sample_restart(model_fn: ModelFn, x, sigmas, noise=None, s_noise=1.0):
    old, new, scale, jump = _restart_plan(np.asarray(sigmas))

    def body(c, s):
        xx = c["x"]
        if noise is not None:
            xx = xx + s["nz"] * (s_noise * s["scale"])
        denoised = model_fn(xx, s["old"])
        d = to_d(xx, s["old"], denoised)
        dt = s["new"] - s["old"]
        x_euler = xx + d * dt
        sn = jnp.maximum(s["new"], 1e-8)
        denoised_2 = model_fn(x_euler, sn)
        d_2 = to_d(x_euler, sn, denoised_2)
        x_heun = xx + (d + d_2) / 2 * dt
        return {"x": jnp.where(s["new"] == 0, x_euler, x_heun)}, None

    xs = {"old": jnp.asarray(old), "new": jnp.asarray(new),
          "scale": jnp.asarray(scale)}
    if noise is not None:
        # per-jump noise pulled from the standard per-step stream
        idx = np.minimum(jump, noise.shape[0] - 1)
        xs["nz"] = noise[jnp.asarray(idx), 0]
    final, _ = jax.lax.scan(body, {"x": x}, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# DPM-Solver fast/adaptive (arXiv:2206.00927; reference k_diffusion
# sampling.py:391-498 DPMSolver class). eps-space, t = -ln σ.


def _dpm_eps(model_fn, x, sigma):
    den = model_fn(x, sigma)
    return (x - den) / sigma


def sample_dpm_fast(model_fn: ModelFn, x, sigmas, noise=None, s_noise=1.0):
    """Fixed-plan DPM-Solver-Fast: order-3 blocks over uniform t, unrolled
    host-side (the plan depends only on the σ schedule)."""
    sig = np.asarray(sigmas, np.float64)
    sigma_min, sigma_max = float(sig[sig > 0].min()), float(sig.max())
    nfe = len(sig) - 1
    t_start, t_end = -np.log(sigma_max), -np.log(sigma_min)
    m = nfe // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    orders = [3] * (m - 2) + [2, 1] if nfe % 3 == 0 else [3] * (m - 1) + [nfe % 3]

    def s_of(t):
        return jnp.float32(np.exp(-t))

    for i, order in enumerate(orders):
        t, t_next = ts[i], ts[i + 1]
        h = t_next - t
        eps = _dpm_eps(model_fn, x, s_of(t))
        if order == 1:
            x = x - s_of(t_next) * np.float32(np.expm1(h)) * eps
        elif order == 2:
            r1 = 0.5
            s1 = t + r1 * h
            u1 = x - s_of(s1) * np.float32(np.expm1(r1 * h)) * eps
            eps_r1 = _dpm_eps(model_fn, u1, s_of(s1))
            x = (x - s_of(t_next) * np.float32(np.expm1(h)) * eps
                 - s_of(t_next) / (2 * r1) * np.float32(np.expm1(h)) * (eps_r1 - eps))
        else:
            r1, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - s_of(s1) * np.float32(np.expm1(r1 * h)) * eps
            eps_r1 = _dpm_eps(model_fn, u1, s_of(s1))
            u2 = (x - s_of(s2) * np.float32(np.expm1(r2 * h)) * eps
                  - s_of(s2) * (r2 / r1) * np.float32(np.expm1(r2 * h) / (r2 * h) - 1)
                  * (eps_r1 - eps))
            eps_r2 = _dpm_eps(model_fn, u2, s_of(s2))
            x = (x - s_of(t_next) * np.float32(np.expm1(h)) * eps
                 - s_of(t_next) / r2 * np.float32(np.expm1(h) / h - 1) * (eps_r2 - eps))
    return x


def sample_dpm_adaptive(model_fn: ModelFn, x, sigmas, noise=None,
                        rtol=0.05, atol=0.0078, h_init=0.05,
                        accept_safety=0.81, max_steps=200):
    """Adaptive DPM-Solver-23 as a lax.while_loop (the one genuinely
    data-dependent integrator; reference dpm_solver_adaptive with the default
    I-controller pcoeff=0, icoeff=1, dcoeff=0 and eta=0)."""
    sig = np.asarray(sigmas, np.float64)
    sigma_min, sigma_max = float(sig[sig > 0].min()), float(sig.max())
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)

    def s_of(t):
        return jnp.exp(-t)

    def solver_2(x, t, t_next, eps):
        h = t_next - t
        r1 = 0.5
        s1 = t + r1 * h
        u1 = x - s_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(model_fn, u1, s_of(s1))
        x2 = (x - s_of(t_next) * jnp.expm1(h) * eps
              - s_of(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
        return x2, eps_r1

    def solver_3(x, t, t_next, eps, eps_r1, r1=1 / 3):
        h = t_next - t
        r2 = 2 / 3
        s2 = t + r2 * h
        u2 = (x - s_of(s2) * jnp.expm1(r2 * h) * eps
              - s_of(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps))
        eps_r2 = _dpm_eps(model_fn, u2, s_of(s2))
        return (x - s_of(t_next) * jnp.expm1(h) * eps
                - s_of(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))

    def cond(c):
        return (c["s"] < t_end - 1e-5) & (c["i"] < max_steps)

    def body(c):
        t = jnp.minimum(t_end, c["s"] + c["h"])
        eps = _dpm_eps(model_fn, c["x"], s_of(c["s"]))
        # order-3 pair: low = 2-step with r1=1/3, high = 3-step
        h = t - c["s"]
        r1 = 1 / 3
        s1 = c["s"] + r1 * h
        u1 = c["x"] - s_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(model_fn, u1, s_of(s1))
        x_low = (c["x"] - s_of(t) * jnp.expm1(h) * eps
                 - s_of(t) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
        x_high = solver_3(c["x"], c["s"], t, eps, eps_r1, r1=r1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(c["x_prev"])))
        error = jnp.sqrt(jnp.mean(((x_low - x_high) / delta) ** 2))
        inv_err = 1.0 / (error + 1e-8)
        factor = jnp.clip(inv_err ** (1.0 / 3.0), 0.333, 1 + jnp.arctan(inv_err ** (1 / 3) - 1))
        accept = factor >= accept_safety
        new_x = jnp.where(accept, x_high, c["x"])
        new_prev = jnp.where(accept, x_low, c["x_prev"])
        new_s = jnp.where(accept, t, c["s"])
        return {"x": new_x, "x_prev": new_prev, "s": new_s,
                "h": c["h"] * factor, "i": c["i"] + 1}

    init = {"x": x, "x_prev": x, "s": jnp.float32(t_start),
            "h": jnp.float32(h_init), "i": jnp.int32(0)}
    return jax.lax.while_loop(cond, body, init)["x"]


# ---------------------------------------------------------------------------
# DEIS (arXiv:2204.13902; reference k_diffusion/sampling.py:933 + deis.py
# 'tab' mode — the autograd integrand is replaced by its closed form:
# d log α/dτ = −τ(β1−β0) − β0 for log α = −½τ²(β1−β0) − τβ0).


def _deis_coeffs(sigmas: np.ndarray, max_order: int = 3, n_quad: int = 10000):
    sig = np.asarray(sigmas, np.float64)
    eps_s, s_min, s_max = 1e-3, 0.002, 80.0
    beta_d = 2 * (np.log(s_min**2 + 1) / eps_s - np.log(s_max**2 + 1)) / (eps_s - 1)
    beta_min = np.log(s_max**2 + 1) - 0.5 * beta_d

    def sigma_inv(s):
        return (np.sqrt(beta_min**2 + 2 * beta_d * np.log(s**2 + 1)) - beta_min) / beta_d

    t_steps = sigma_inv(np.maximum(sig, 1e-10))
    n = len(sig) - 1
    coeffs = np.zeros((n, max_order), np.float64)
    for i in range(n):
        order = min(i + 1, max_order)
        if sig[i + 1] <= 0:
            order = 1
        if order == 1:
            coeffs[i, 0] = sig[i + 1] - sig[i]  # plain Euler on d
            continue
        taus = np.linspace(t_steps[i], t_steps[i + 1], n_quad)
        dtau = (t_steps[i + 1] - t_steps[i]) / n_quad
        alpha = np.exp(-0.5 * taus**2 * (beta_d) - taus * beta_min)
        dlog_alpha = -taus * beta_d - beta_min
        integrand = -0.5 * dlog_alpha / np.sqrt(np.maximum(alpha * (1 - alpha), 1e-12))
        prev_t = t_steps[[i - k for k in range(order)]]
        for j in range(order):
            poly = np.ones_like(taus)
            for k in range(order):
                if k != j:
                    poly *= (taus - prev_t[k]) / (prev_t[j] - prev_t[k])
            coeffs[i, j] = np.sum(integrand * poly) * dtau
    return coeffs.astype(np.float32)


def sample_deis(model_fn: ModelFn, x, sigmas, noise=None, max_order: int = 3):
    coeffs = jnp.asarray(_deis_coeffs(np.asarray(sigmas), max_order))

    def body(carry, s):
        sigma, cs = s["sigma"], s["coeffs"]
        denoised = model_fn(carry["x"], sigma)
        d = to_d(carry["x"], sigma, denoised)
        ds = jnp.concatenate([d[None], carry["ds"][:-1]], axis=0)
        xx = carry["x"] + jnp.tensordot(cs, ds, axes=1)
        return {"x": xx, "ds": ds}, None

    ds0 = jnp.zeros((max_order,) + x.shape, x.dtype)
    xs = {"sigma": sigmas[:-1], "coeffs": coeffs}
    final, _ = jax.lax.scan(body, {"x": x, "ds": ds0}, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# PLMS (pseudo linear multistep, reference sd_samplers_timesteps_impl.py:85 —
# translated from ᾱ-space to σ-space where the DDIM update is the Euler step)

_PLMS_COEFFS = (
    (1.0, 0.0, 0.0, 0.0),                       # (first step peeled: RK2)
    (3 / 2, -1 / 2, 0.0, 0.0),
    (23 / 12, -16 / 12, 5 / 12, 0.0),
    (55 / 24, -59 / 24, 37 / 24, -9 / 24),
)


def sample_plms(model_fn: ModelFn, x, sigmas, noise=None):
    sig = np.asarray(sigmas, np.float32)
    n = len(sig) - 1
    # step 0: pseudo improved Euler (RK2 across the first interval)
    s0, s1 = jnp.float32(sig[0]), jnp.float32(max(sig[1], 1e-8))
    denoised = model_fn(x, s0)
    e_t = to_d(x, s0, denoised)
    x_prev = x + e_t * (s1 - s0)
    denoised_next = model_fn(x_prev, s1)
    e_t_next = to_d(x_prev, s1, denoised_next)
    x = x + (e_t + e_t_next) / 2 * (s1 - s0)
    if n == 1:
        return x

    coeffs = np.stack([np.asarray(_PLMS_COEFFS[min(i, 3)], np.float32)
                       for i in range(1, n)])

    def body(carry, s):
        sigma, sigma_next, cs = s["sigma"], s["sigma_next"], s["coeffs"]
        den = model_fn(carry["x"], sigma)
        e = to_d(carry["x"], sigma, den)
        es = jnp.concatenate([e[None], carry["es"][:-1]], axis=0)
        e_prime = jnp.tensordot(cs, es, axes=1)
        xx = carry["x"] + e_prime * (sigma_next - sigma)
        return {"x": xx, "es": es}, None

    es0 = jnp.concatenate([e_t[None], jnp.zeros((3,) + x.shape, x.dtype)], axis=0)
    xs = {"sigma": jnp.asarray(sig[1:-1]), "sigma_next": jnp.asarray(sig[2:]),
          "coeffs": jnp.asarray(coeffs)}
    final, _ = jax.lax.scan(body, {"x": x, "es": es0}, xs)
    return final["x"]


# ---------------------------------------------------------------------------
# UniPC (arXiv:2302.04867; reference modules/models/diffusion/uni_pc/uni_pc.py
# :625 multistep_uni_pc_bh_update, bh2 variant, x0-prediction) — translated to
# σ-space (λ = −ln σ; the ᾱ factors cancel under the k-diffusion change of
# variables). All R-matrix solves happen host-side: the σ schedule is static.

_UNIPC_ORDER = 3


def _unipc_coeffs(sigmas: np.ndarray, order: int = _UNIPC_ORDER):
    """Per-step host-side coefficients.

    Returns dict of arrays over steps i=1..n (updating x at σ_i from history
    at σ_{i-1}...): ratio σ_i/σ_{i-1}, φ₁=expm1(−h), B_h, predictor weights
    cp[k] and corrector weights cc[k] applied to (m_{prev k} − m₀), and the
    corrector weight for the fresh model eval."""
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    lam = -np.log(np.maximum(sig, 1e-10))
    K = order
    out = {
        "ratio": np.zeros(n), "phi1": np.zeros(n), "bh": np.zeros(n),
        "cp": np.zeros((n, K - 1)), "cc": np.zeros((n, K - 1)),
        "cc_new": np.zeros(n), "use_corr": np.zeros(n),
    }
    for i in range(n):  # update from point i to i+1, history at i, i-1, ...
        cur_order = min(i + 1, K, n - i)  # lower_order_final
        h = lam[i + 1] - lam[i]
        hh = -h
        rks, rk_vals = [], []
        for k in range(1, cur_order):
            rk = (lam[i - k] - lam[i]) / h
            rk_vals.append(rk)
        rks = rk_vals + [1.0]
        rks = np.asarray(rks)
        h_phi_1 = np.expm1(hh)
        b_h = np.expm1(hh)  # bh2
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        fac = 1
        for k in range(1, cur_order + 1):
            R.append(rks ** (k - 1))
            b.append(h_phi_k * fac / b_h)
            fac *= k + 1
            h_phi_k = h_phi_k / hh - 1 / fac
        R = np.stack(R)
        b = np.asarray(b)
        if cur_order > 1:
            rhos_p = (np.asarray([0.5]) if cur_order == 2
                      else np.linalg.solve(R[:-1, :-1], b[:-1]))
        else:
            rhos_p = np.zeros(0)
        rhos_c = np.asarray([0.5]) if cur_order == 1 else np.linalg.solve(R, b)
        out["ratio"][i] = sig[i + 1] / sig[i]
        out["phi1"][i] = h_phi_1
        out["bh"][i] = b_h
        for k in range(cur_order - 1):
            # D1s[k] = (m_prev_{k+1} − m0)/rk: fold 1/rk into the weight
            out["cp"][i, k] = (rhos_p[k] / rk_vals[k]) if k < len(rhos_p) else 0.0
            out["cc"][i, k] = rhos_c[k] / rk_vals[k]
        out["cc_new"][i] = rhos_c[-1]
        out["use_corr"][i] = 0.0 if i == n - 1 else 1.0
    return {k: v.astype(np.float32) for k, v in out.items()}


def sample_unipc(model_fn: ModelFn, x, sigmas, noise=None, order: int = _UNIPC_ORDER):
    sig = np.asarray(sigmas, np.float32)
    n = len(sig) - 1
    cf = _unipc_coeffs(sig, order)
    m0 = model_fn(x, jnp.float32(sig[0]))  # init model eval at σ_max

    K = order

    def body(carry, s):
        xx, ms = carry["x"], carry["ms"]  # ms: [K] newest-first x0 history
        m_0 = ms[0]
        x_t_ = s["ratio"] * xx - s["phi1"] * m_0
        pred = jnp.zeros_like(xx)
        corr = jnp.zeros_like(xx)
        for k in range(K - 1):
            diff = ms[k + 1] - m_0
            pred = pred + s["cp"][k] * diff
            corr = corr + s["cc"][k] * diff
        x_pred = x_t_ - s["bh"] * pred
        sigma_t = jnp.maximum(s["sigma_next"], 1e-8)
        m_t = model_fn(x_pred, sigma_t)
        x_corr = x_t_ - s["bh"] * (corr + s["cc_new"] * (m_t - m_0))
        ms = jnp.concatenate([m_t[None], ms[:-1]], axis=0)
        return {"x": x_corr, "ms": ms}, None

    ms0 = jnp.concatenate([m0[None], jnp.zeros((K - 1,) + x.shape, x.dtype)], axis=0)
    take = lambda v: jnp.asarray(v[: n - 1])  # noqa: E731 — final step peeled
    xs = {"ratio": take(cf["ratio"]), "phi1": take(cf["phi1"]),
          "bh": take(cf["bh"]), "cp": take(cf["cp"]),
          "cc": take(cf["cc"]), "cc_new": take(cf["cc_new"]),
          "sigma_next": jnp.asarray(sig[1:n])}
    carry = {"x": x, "ms": ms0}
    if n > 1:
        carry, _ = jax.lax.scan(body, carry, xs)
    # final step: predictor only, no corrector, no model eval (reference
    # "do not run corrector at the last step")
    xx, ms = carry["x"], carry["ms"]
    m_0 = ms[0]
    x_t_ = jnp.float32(cf["ratio"][n - 1]) * xx - jnp.float32(cf["phi1"][n - 1]) * m_0
    pred = jnp.zeros_like(xx)
    for k in range(K - 1):
        pred = pred + jnp.float32(cf["cp"][n - 1, k]) * (ms[k + 1] - m_0)
    return x_t_ - jnp.float32(cf["bh"][n - 1]) * pred


# ---------------------------------------------------------------------------
# DDIM CFG++ (arXiv:2406.08070; reference sd_samplers_timesteps_impl.py:43 —
# the direction term uses the UNCOND eps; cfg_scale is mapped to [0,1] by the
# pipeline via SamplerInfo.cfg_multiplier)


def sample_ddim_cfgpp(model_fn, x, sigmas, noise=None, eta=0.0):
    """model_fn here is the pair-returning variant: (x0_cfg, x0_uncond)."""

    def step(c, s):
        sigma, sigma_next = s["sigma"], s["sigma_next"]
        den, den_un = model_fn(c["x"], sigma)
        eps_un = (c["x"] - den_un) / sigma
        sigma_down, sigma_up = ancestral_step(sigma, sigma_next, eta)
        xx = den + sigma_down * eps_un
        if eta > 0 and noise is not None:
            xx = jnp.where(sigma_next > 0, xx + s["noise"][0] * sigma_up, xx)
        return {"x": jnp.where(sigma_next == 0, den, xx)}

    return _scan(step, x, {}, sigmas, noise if eta > 0 else None)


# ---------------------------------------------------------------------------
# registry


@dataclasses.dataclass(frozen=True)
class SamplerInfo:
    fn: Callable
    noise_draws: int = 0          # gaussian draws per step
    uses_ensd: bool = False
    discard_next_to_last_sigma: bool = False
    second_order: bool = False
    default_eta: float = 1.0
    brownian_noise: bool = False
    needs_uncond: bool = False    # CFG++ family: model_fn returns (x0, uncond)
    cfg_multiplier: float = 1.0   # CFG++ maps the scale to [0,1] (ref: /12.5)
    uses_eta_ddim: bool = False   # timestep samplers take eta from eta_ddim
    aliases: tuple = ()


SAMPLERS: Dict[str, SamplerInfo] = {
    "Euler a": SamplerInfo(sample_euler_ancestral, 1, uses_ensd=True, aliases=("k_euler_a", "euler_ancestral")),
    "Euler": SamplerInfo(sample_euler, 0, aliases=("k_euler", "euler")),
    "LMS": SamplerInfo(sample_lms, 0, aliases=("k_lms", "lms")),
    "Heun": SamplerInfo(sample_heun, 0, second_order=True, aliases=("k_heun", "heun")),
    "DPM2": SamplerInfo(sample_dpm_2, 0, discard_next_to_last_sigma=True, second_order=True, aliases=("k_dpm_2", "dpm_2")),
    "DPM2 a": SamplerInfo(sample_dpm_2_ancestral, 1, uses_ensd=True, discard_next_to_last_sigma=True, second_order=True, aliases=("k_dpm_2_a", "dpm_2_ancestral")),
    "DPM++ 2S a": SamplerInfo(sample_dpmpp_2s_ancestral, 1, uses_ensd=True, second_order=True, aliases=("k_dpmpp_2s_a", "dpmpp_2s_ancestral")),
    "DPM++ 2M": SamplerInfo(sample_dpmpp_2m, 0, aliases=("k_dpmpp_2m", "dpmpp_2m")),
    "DPM++ SDE": SamplerInfo(sample_dpmpp_sde, 2, second_order=True, brownian_noise=True, aliases=("k_dpmpp_sde", "dpmpp_sde")),
    "DPM++ 2M SDE": SamplerInfo(sample_dpmpp_2m_sde, 1, brownian_noise=True, aliases=("k_dpmpp_2m_sde", "dpmpp_2m_sde")),
    "DPM++ 2M SDE Heun": SamplerInfo(partial(sample_dpmpp_2m_sde, solver_type="heun"), 1, brownian_noise=True, aliases=("k_dpmpp_2m_sde_heun",)),
    "DPM++ 3M SDE": SamplerInfo(sample_dpmpp_3m_sde, 1, brownian_noise=True, aliases=("k_dpmpp_3m_sde", "dpmpp_3m_sde")),
    "LCM": SamplerInfo(sample_lcm, 1, uses_ensd=True, aliases=("lcm",)),
    "DDIM": SamplerInfo(sample_ddim, 0, uses_eta_ddim=True, aliases=("ddim",)),
    "DDIM CFG++": SamplerInfo(sample_ddim_cfgpp, 0, uses_eta_ddim=True,
                              needs_uncond=True, cfg_multiplier=1 / 12.5,
                              aliases=("ddim_cfgpp",)),
    "PLMS": SamplerInfo(sample_plms, 0, aliases=("plms",)),
    "UniPC": SamplerInfo(sample_unipc, 0, aliases=("unipc",)),
    "Heun++2": SamplerInfo(sample_heunpp2, 0, second_order=True, aliases=("heunpp2", "k_heunpp2")),
    "ipndm": SamplerInfo(sample_ipndm, 0, aliases=("k_ipndm",)),
    "ipndm_v": SamplerInfo(sample_ipndm_v, 0, aliases=("k_ipndm_v",)),
    "DEIS": SamplerInfo(sample_deis, 0, aliases=("k_deis", "deis")),
    "DPM fast": SamplerInfo(sample_dpm_fast, 0, uses_ensd=True, aliases=("k_dpm_fast", "dpm_fast")),
    "DPM adaptive": SamplerInfo(sample_dpm_adaptive, 0, uses_ensd=True, aliases=("k_dpm_ad", "dpm_adaptive")),
    "Restart": SamplerInfo(sample_restart, 1, second_order=True, aliases=("restart",)),
    "DDPM": SamplerInfo(sample_ddpm, 1, uses_ensd=True, aliases=("ddpm",)),
}


def get_sampler(name: str) -> SamplerInfo:
    if name in SAMPLERS:
        return SAMPLERS[name]
    for canonical, info in SAMPLERS.items():
        if name in info.aliases or name.lower() == canonical.lower():
            return info
    raise KeyError(f"unknown sampler {name!r}")


def visible_sampler_names():
    return list(SAMPLERS.keys())
