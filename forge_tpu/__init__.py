"""forge_tpu — a TPU-native diffusion inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lllyasviel/stable-diffusion-webui-forge (the reference; see SURVEY.md).
The compute path is pure-functional JAX over parameter pytrees; hot ops are
Pallas TPU kernels; scale-out is jax.sharding over a device Mesh.

Layering (bottom → top), mirroring SURVEY.md §1's layer map but TPU-native:

  ops/       attention (Pallas flash), fused norms, RNG (Philox parity), quant kernels
  core/      state-dict loading, architecture guessing, dtype policy, patches (LoRA)
  models/    denoisers (UNet/MMDiT/Flux), VAE, text encoders, ControlNet — pure fns
  sampling/  predictors (eps/v/EDM/flow), σ-schedules, samplers as lax.scan bodies
  text/      tokenizer, emphasis parser, prompt scheduling, textual inversion
  parallel/  Mesh construction, sharding policies (dp/tp/fsdp), collectives
  pipeline/  txt2img/img2img/inpaint orchestration, hires-fix, image IO, infotext
  runtime/   options registry, job state, queueing, memory/residency planning
  api/       /sdapi/v1/* REST contract (stdlib HTTP; reference uses FastAPI)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: SD-sized programs take minutes to compile
# (especially over remote-compile tunnels); cache them across processes.
# Override location with FORGE_TPU_COMPILE_CACHE; disable with value "0".
_cache_dir = _os.environ.get("FORGE_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/forge_tpu_xla"))
if _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
