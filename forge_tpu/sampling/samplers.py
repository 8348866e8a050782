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
    dts = sig[1:] - sig[:-1]  # [n]
    coeff_table = np.zeros((n, order))
    for i in range(n):
        cur = min(i + 1, order)
        h = dts[i]
        if cur == 1:
            c = [1.0]
        else:
            hs = [dts[i - j] for j in range(cur)]  # h_0=current, h_1=prev...
            # integrate the Lagrange basis over [0, h] with nodes at
            # t_0=0, t_1=-h_1, t_2=-(h_1+h_2), ...
            nodes = [0.0]
            acc = 0.0
            for j in range(1, cur):
                acc -= hs[j]
                nodes.append(acc)
            import scipy.integrate

            c = []
            for j in range(cur):
                def basis(tau, j=j):
                    prod = 1.0
                    for m in range(cur):
                        if m == j:
                            continue
                        prod *= (tau - nodes[m]) / (nodes[j] - nodes[m])
                    return prod

                c.append(scipy.integrate.quad(basis, 0.0, h, epsrel=1e-6)[0] / h)
        coeff_table[i, : len(c)] = c
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
    "DDIM": SamplerInfo(sample_ddim, 0, aliases=("ddim",)),
    "Heun++2": SamplerInfo(sample_heunpp2, 0, second_order=True, aliases=("heunpp2", "k_heunpp2")),
    "ipndm": SamplerInfo(sample_ipndm, 0, aliases=("k_ipndm",)),
    "ipndm_v": SamplerInfo(sample_ipndm_v, 0, aliases=("k_ipndm_v",)),
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
