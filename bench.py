"""Benchmark: the BASELINE.json headline configs on the available accelerator.

Config 1: SD1.5 512×512 txt2img, Euler a, 20 steps, CFG 7  (target < 1 s p50)
Config 2: SDXL 1024×1024 txt2img, DPM++ 2M Karras, 30 steps (target ≥ 1 img/s)

Prints ONE JSON line; headline metric is SD1.5 p50 latency vs the 1 s target
(vs_baseline > 1 means faster than target); SDXL numbers ride in `detail`.

Weights are full-size zero-filled synthetic (matmul timing is data-
independent). Measured latency is end-to-end per image — text encode, the
whole compiled denoise loop, VAE decode, uint8 conversion — excluding one-time
compilation, matching the reference's it/s convention."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _measure(engine, p, runs=3):
    from forge_tpu.pipeline.processing import process_images

    t0 = time.time()
    process_images(engine, p)  # compile
    compile_s = time.time() - t0
    lat = []
    for i in range(runs):
        p.seed = 1000 + i
        t0 = time.time()
        process_images(engine, p)
        lat.append(time.time() - t0)
    return float(np.median(lat)), compile_s, lat


def main():
    import jax

    from forge_tpu.core.synth import synth_sd15_checkpoint, synth_sdxl_checkpoint
    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.processing import Processing

    # batched serving throughput (img/s/chip at batch 2), measured FIRST in a
    # fresh subprocess: once this parent process holds the SD1.5/SDXL engines
    # their executables' HBM cannot be reclaimed, and a 16 GB chip cannot fit
    # two resident SDXL programs.
    batch_detail = {}
    try:
        import subprocess

        code = (
            "import time, numpy as np\n"
            "from forge_tpu.core.synth import synth_sdxl_checkpoint\n"
            "from forge_tpu.pipeline.engine import load_engine\n"
            "from forge_tpu.pipeline.processing import Processing, process_images\n"
            "eng = load_engine(synth_sdxl_checkpoint(fill='zeros'))\n"
            "p = Processing(prompt='bench', seed=1, steps=30, width=1024,\n"
            "               height=1024, cfg_scale=7.0, sampler_name='DPM++ 2M',\n"
            "               scheduler='karras', batch_size=2)\n"
            "process_images(eng, p)\n"
            "lat = []\n"
            "for i in range(2):\n"
            "    p.seed = 1000 + i\n"
            "    t0 = time.time(); process_images(eng, p); lat.append(time.time() - t0)\n"
            "print('B2RESULT', float(np.median(lat)))\n"
        )
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=2400).stdout
        for line in out.splitlines():
            if line.startswith("B2RESULT"):
                b2 = float(line.split()[1])
                batch_detail["sdxl_batch2_images_per_s"] = round(2.0 / b2, 4)
                batch_detail["sdxl_batch2_p50_s"] = round(b2, 4)
    except Exception as e:  # noqa: BLE001
        batch_detail["sdxl_batch2_error"] = str(e)[:120]

    prompt = "a photograph of an astronaut riding a horse, detailed, 4k"
    neg = "blurry, low quality"

    # -- config 1: SD1.5 512 -------------------------------------------------
    eng15 = load_engine(synth_sd15_checkpoint(fill="zeros"))
    p15 = Processing(prompt=prompt, negative_prompt=neg, seed=1, steps=20,
                     width=512, height=512, cfg_scale=7.0, sampler_name="Euler a")
    sd15_p50, sd15_compile, sd15_lat = _measure(eng15, p15)
    del eng15

    # -- config 2: SDXL 1024 ---------------------------------------------------
    detail_xl = {}
    try:
        engxl = load_engine(synth_sdxl_checkpoint(fill="zeros"))
        pxl = Processing(prompt=prompt, negative_prompt=neg, seed=1, steps=30,
                         width=1024, height=1024, cfg_scale=7.0,
                         sampler_name="DPM++ 2M", scheduler="karras")
        xl_p50, xl_compile, xl_lat = _measure(engxl, pxl)
        detail_xl = {
            "sdxl_1024_dpmpp2m_30step_p50_s": round(xl_p50, 4),
            "sdxl_images_per_s": round(1.0 / xl_p50, 4),
            "sdxl_steps_per_s": round(30 / xl_p50, 2),
            "sdxl_compile_s": round(xl_compile, 1),
        }
        del engxl
    except Exception as e:  # noqa: BLE001 — SDXL bench is best-effort
        detail_xl = {"sdxl_error": str(e)[:200]}

    target = 1.0  # BASELINE.json: SD1.5 512² < 1 s p50 on v5e
    result = {
        "metric": "sd15_512_eulera_20step_p50_latency",
        "value": round(sd15_p50, 4),
        "unit": "s",
        "vs_baseline": round(target / sd15_p50, 3),
        "detail": {
            "sd15_steps_per_s": round(20 / sd15_p50, 2),
            "sd15_images_per_s": round(1.0 / sd15_p50, 4),
            "sd15_compile_s": round(sd15_compile, 1),
            "sd15_latencies": [round(x, 4) for x in sd15_lat],
            "backend": jax.default_backend(),
            **detail_xl,
            **batch_detail,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
