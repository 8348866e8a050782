"""Benchmark: SD1.5 512×512 txt2img, Euler a 20 steps, batch 1, on the
available accelerator (TPU v5e in the driver run).

Prints ONE JSON line: p50 image latency vs the BASELINE.json target of
<1 s/image on v5e. vs_baseline > 1.0 means faster than target.

Weights are full-size zero-filled synthetic (matmul timing is
data-independent); the text encoder + full 20-step compiled denoise loop +
VAE decode are all measured (end-to-end image latency, excluding one-time
compilation, like the reference's it/s convention)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from forge_tpu.core.synth import synth_sd15_checkpoint
    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    steps = 20
    sd = synth_sd15_checkpoint(fill="zeros")
    engine = load_engine(sd)

    p = Processing(
        prompt="a photograph of an astronaut riding a horse, detailed, 4k",
        negative_prompt="blurry, low quality",
        seed=1234,
        steps=steps,
        width=512,
        height=512,
        cfg_scale=7.0,
        sampler_name="Euler a",
    )

    # warmup (compile)
    t0 = time.time()
    process_images(engine, p)
    compile_time = time.time() - t0

    latencies = []
    for i in range(3):
        p.seed = 1000 + i
        t0 = time.time()
        process_images(engine, p)
        latencies.append(time.time() - t0)

    p50 = float(np.median(latencies))
    target = 1.0  # BASELINE.json: SD1.5 512² < 1 s p50 on v5e
    result = {
        "metric": "sd15_512_eulera_20step_p50_latency",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(target / p50, 3),
        "detail": {
            "steps_per_s": round(steps / p50, 2),
            "compile_s": round(compile_time, 1),
            "backend": jax.default_backend(),
            "latencies": [round(x, 4) for x in latencies],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
