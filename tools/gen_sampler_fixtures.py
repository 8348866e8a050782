"""Generate sampler-trajectory oracle fixtures from the reference k-diffusion.

Run ONCE in the build environment (where /root/reference exists); the
resulting tests/fixtures_samplers.npz is committed so the test suite never
imports reference code (tests compare against stored arrays only).

The synthetic denoiser is an affine contraction x0 = 0.55·x + 0.8 — smooth,
non-constant, order-revealing: multistep/second-order integrators produce
measurably different trajectories from Euler, so matching the reference to
~1e-4 validates the integrator math, not just convergence.
"""

import sys
import types

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

# stub the deps the deterministic samplers never touch
for mod in ("torchdiffeq", "torchsde", "diffusers", "diffusers.pipelines",
            "diffusers.pipelines.flux", "diffusers.pipelines.flux.pipeline_flux",
            "torchvision", "torchvision.transforms",
            "torchvision.transforms.functional"):
    if mod not in sys.modules:
        stub = types.ModuleType(mod)
        stub.__path__ = []
        stub.odeint = None
        stub.BrownianInterval = None
        stub.BrownianTree = None
        stub.FlowMatchEulerDiscreteScheduler = type("FMEDS", (), {})
        stub.calculate_shift = None
        sys.modules[mod] = stub

from k_diffusion import sampling as ks  # noqa: E402

SHAPE = (1, 4, 8, 8)
A, B = 0.55, 0.8


def model(x, sigma, **kw):
    return A * x + B


def karras(n, smin=0.0292, smax=14.6146):
    return ks.get_sigmas_karras(n, smin, smax)


def main():
    out = {}
    torch.manual_seed(0)
    x0 = torch.linspace(-2, 2, int(np.prod(SHAPE))).reshape(SHAPE).float()
    sigmas = karras(8)
    x = x0 * sigmas[0]

    cases = {
        "euler": lambda: ks.sample_euler(model, x.clone(), sigmas),
        "heun": lambda: ks.sample_heun(model, x.clone(), sigmas),
        "dpmpp_2m": lambda: ks.sample_dpmpp_2m(model, x.clone(), sigmas),
        "lms": lambda: ks.sample_lms(model, x.clone(), sigmas),
        "ipndm": lambda: ks.sample_ipndm(model, x.clone(), sigmas),
        "ipndm_v": lambda: ks.sample_ipndm_v(model, x.clone(), sigmas),
        "deis": lambda: ks.sample_deis(model, x.clone(), sigmas),
        "dpm_fast": lambda: ks.sample_dpm_fast(
            model, x.clone(), float(sigmas[-2]), float(sigmas[0]), 8),
        "heunpp2": lambda: ks.sample_heunpp2(model, x.clone(), sigmas),
    }
    for name, fn in cases.items():
        out[name] = fn().numpy()
        print(name, float(np.abs(out[name]).mean()))

    out["sigmas"] = sigmas.numpy()
    out["x_init"] = x.numpy()
    np.savez("tests/fixtures_samplers.npz", **out)
    print("wrote tests/fixtures_samplers.npz")


if __name__ == "__main__":
    main()
