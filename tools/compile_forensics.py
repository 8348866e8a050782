"""Where does warm-restart 'compile' time go? (VERDICT r2 weak #7)

Splits the first-generation latency of a fresh process with a WARM
persistent compile cache into:
  trace    — Python tracing to jaxpr (host CPU; 1 core here)
  lower    — jaxpr → StableHLO
  compile  — XLA compile OR persistent-cache artifact load + device upload
for each program the SD1.5 pipeline runs (text encode, sampler loop,
decode), plus the end-to-end process_images wall time.

Run on the default (TPU) backend:  python tools/compile_forensics.py
"""

import logging
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# surface persistent-cache hit/miss lines
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO, stream=sys.stderr)


def main():
    import jax

    from fixtures import make_tiny_engine  # noqa: F401 — forces test path setup
    from forge_tpu.core.synth import synth_sd15_checkpoint
    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    t0 = time.time()
    eng = load_engine(synth_sd15_checkpoint(fill="zeros"))
    t_load = time.time() - t0
    print(f"load_engine: {t_load:.1f}s", flush=True)

    # instrument jit stages via a monkeypatch on jax.jit'd call boundaries:
    # wrap jax.stages — simplest reliable split is trace/lower/compile on a
    # representative program (the UNet step at the bench shape).
    import jax.numpy as jnp

    apply_raw = eng.unet_apply_fn()
    x = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.float32)
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)

    f = jax.jit(apply_raw)
    t0 = time.time()
    traced = f.trace(eng.loaded.unet, x, t, context=ctx)
    t_trace = time.time() - t0
    t0 = time.time()
    lowered = traced.lower()
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(f"unet step: trace {t_trace:.1f}s  lower {t_lower:.1f}s  "
          f"compile/cache-load {t_compile:.1f}s", flush=True)

    # end-to-end first image (the number bench.py reports as compile_s)
    p = Processing(prompt="a cat", seed=1, steps=20, width=512, height=512,
                   cfg_scale=7.0, sampler_name="Euler a")
    t0 = time.time()
    process_images(eng, p)
    print(f"first process_images: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    p.seed = 2
    process_images(eng, p)
    print(f"second process_images: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
