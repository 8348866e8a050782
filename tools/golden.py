"""Golden-image fidelity harness: PSNR vs reference outputs.

BASELINE.json's fidelity gate is PSNR ≥ 40 dB against reference fp32 CPU
outputs at identical (seed, prompt, sampler, steps, size). This environment
has no model weights (zero egress), so this tool is the harness: point it at
a real checkpoint and a directory of reference PNGs named
`<seed>_<sampler>_<steps>_<W>x<H>.png` whose infotext carries the prompt, and
it reproduces each image and reports per-image and aggregate PSNR.

    python tools/golden.py --ckpt path/to/sd15.safetensors --golden-dir refs/
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NAME_RE = re.compile(r"^(\d+)_(.+)_(\d+)_(\d+)x(\d+)\.png$")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--golden-dir", required=True)
    ap.add_argument("--threshold", type=float, default=40.0)
    args = ap.parse_args()

    from PIL import Image

    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.images import parse_generation_parameters
    from forge_tpu.pipeline.processing import Processing, process_images

    engine = load_engine(args.ckpt)
    results = []
    for fname in sorted(os.listdir(args.golden_dir)):
        m = _NAME_RE.match(fname)
        if not m:
            continue
        seed, sampler, steps, w, h = m.groups()
        ref_img = Image.open(os.path.join(args.golden_dir, fname))
        info = parse_generation_parameters(ref_img.info.get("parameters", ""))
        p = Processing(
            prompt=info.get("Prompt", ""),
            negative_prompt=info.get("Negative prompt", ""),
            seed=int(seed),
            sampler_name=sampler.replace("-", " "),
            steps=int(steps),
            width=int(w),
            height=int(h),
            cfg_scale=float(info.get("CFG scale", 7.0)),
        )
        out = process_images(engine, p).images[0]
        score = psnr(np.asarray(ref_img.convert("RGB")), out)
        results.append({"file": fname, "psnr_db": round(score, 2),
                        "pass": score >= args.threshold})
        print(f"{fname}: {score:.2f} dB {'PASS' if score >= args.threshold else 'FAIL'}")

    agg = {
        "n": len(results),
        "min_psnr": min((r["psnr_db"] for r in results), default=None),
        "all_pass": all(r["pass"] for r in results) if results else None,
    }
    print(json.dumps({"results": results, "aggregate": agg}))
    return 0 if agg["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
