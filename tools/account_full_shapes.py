"""Collective accounting at REAL model shapes (VERDICT r4 #6).

The toy dryrun validates that the SPMD partitioner inserts the expected
collectives; this tool compiles the REAL SDXL (2.6B) and Flux (12B) denoise
steps at 1024² dims for tp/dp×tp meshes and accounts the actual per-step
collective bytes. No parameter memory is touched: parameters are abstract
`jax.ShapeDtypeStruct`s carrying `NamedSharding`s, so `jit(...).lower(...)
.compile()` runs the full GSPMD partitioning pipeline allocation-free
(compile-only — execution would need N real chips; the bytes don't).

Predictions anchor on MEASURED single-chip per-step times from the driver
bench artifacts (BENCH_r04: SDXL 3.315 s sample / 30 steps; BENCH_r03 Flux
≈1.9 s/step NF4) and the v5e ring-collective model in
forge_tpu/parallel/accounting.py. tp divides the per-device matmul work by
tp (the optimistic perfect-split anchor); dp rows are weak scaling.

Run standalone (`python tools/account_full_shapes.py [n_devices]`) — it
self-provisions a virtual CPU mesh — or from __graft_entry__.dryrun_multichip
phase 5 where the mesh already exists.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

# measured single-chip anchors (seconds) — override via env for fresh numbers
SDXL_STEP_S = float(os.environ.get("FORGE_TPU_SDXL_STEP_S", "0.1105"))
SDXL_DECODE_S = float(os.environ.get("FORGE_TPU_SDXL_DECODE_S", "0.303"))
SDXL_STEPS = 30
FLUX_STEP_S = float(os.environ.get("FORGE_TPU_FLUX_STEP_S", "1.9"))
FLUX_STEPS = 20


def _abstract_tree(sd: Dict[str, Any], mesh, tp: int, dtype):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import map_leaves, nest
    from forge_tpu.parallel.mesh import _unet_param_spec

    params = nest(transform_for_jax(sd))

    def make(path, leaf):
        spec = _unet_param_spec(path, leaf) if tp > 1 else P()
        return jax.ShapeDtypeStruct(
            leaf.shape, dtype, sharding=NamedSharding(mesh, spec))

    return map_leaves(make, params)


def _account(jitted, abstract_args, n_devices: int, per_dev_compute_s: float):
    from forge_tpu.parallel.accounting import hlo_collectives, ici_time_s

    lowered = jitted.lower(*abstract_args)
    compiled = lowered.compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    coll = hlo_collectives(texts)
    t_ici = ici_time_s(coll, n_devices)
    eff = per_dev_compute_s / (per_dev_compute_s + t_ici)
    return coll, t_ici, eff


def _sdxl_row(mesh, dp: int, tp: int) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forge_tpu.core.synth import synth_unet_sd
    from forge_tpu.models.unet import UNetConfig, unet_apply

    n = dp * tp
    sd = synth_unet_sd(channel_mult=(1, 2, 4), transformer_depth=(0, 2, 10),
                       context_dim=2048, adm_in_channels=2816, middle_depth=10,
                       fill="zeros", prefix="")
    dtype = jnp.bfloat16
    params = _abstract_tree(sd, mesh, tp, dtype)
    cfg = UNetConfig.for_family("sdxl")
    bsh = NamedSharding(mesh, P("dp"))
    batch = 2 * dp  # cond+uncond per dp shard, 1024² latent
    x = jax.ShapeDtypeStruct((batch, 128, 128, 4), dtype, sharding=bsh)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32, sharding=bsh)
    ctx = jax.ShapeDtypeStruct((batch, 77, 2048), dtype, sharding=bsh)
    y = jax.ShapeDtypeStruct((batch, 2816), dtype, sharding=bsh)

    def step(params, x, t, ctx, y):
        return unet_apply(params, x, t, ctx, y=y, cfg=cfg)

    per_dev = SDXL_STEP_S / tp
    coll, t_ici, eff = _account(jax.jit(step), (params, x, t, ctx, y), n, per_dev)
    # per-image latency on this config: denoise (steps × sharded step + ici)
    # + unsharded VAE decode; throughput fans dp images at once
    lat = SDXL_STEPS * (per_dev + t_ici) + SDXL_DECODE_S
    return {
        "model": "sdxl_1024", "dp": dp, "tp": tp, "chips": n,
        "collectives_per_step": coll["counts"],
        "collective_bytes_per_step": coll["bytes_total"],
        "predicted_ici_ms": round(t_ici * 1e3, 3),
        "per_device_compute_ms": round(per_dev * 1e3, 2),
        "predicted_step_efficiency": round(eff, 4),
        "predicted_image_latency_s": round(lat, 3),
        "predicted_images_per_s": round(dp / lat, 3),
    }


def _flux_row(mesh, dp: int, tp: int) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forge_tpu.core.synth import synth_flux_sd
    from forge_tpu.models.flux import FluxConfig, flux_apply

    n = dp * tp
    sd = synth_flux_sd(fill="zeros", prefix="")
    dtype = jnp.bfloat16
    params = _abstract_tree(sd, mesh, tp, dtype)
    bsh = NamedSharding(mesh, P("dp"))
    batch = dp  # distilled CFG: one branch per image
    x = jax.ShapeDtypeStruct((batch, 128, 128, 16), dtype, sharding=bsh)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32, sharding=bsh)
    ctx = jax.ShapeDtypeStruct((batch, 512, 4096), dtype, sharding=bsh)
    y = jax.ShapeDtypeStruct((batch, 768), dtype, sharding=bsh)
    g = jax.ShapeDtypeStruct((batch,), jnp.float32, sharding=bsh)

    def step(params, x, t, ctx, y, g):
        return flux_apply(params, x, t, ctx, y, guidance=g, cfg=FluxConfig())

    per_dev = FLUX_STEP_S / tp
    coll, t_ici, eff = _account(jax.jit(step), (params, x, t, ctx, y, g), n, per_dev)
    lat = FLUX_STEPS * (per_dev + t_ici)
    return {
        "model": "flux_1024", "dp": dp, "tp": tp, "chips": n,
        "collectives_per_step": coll["counts"],
        "collective_bytes_per_step": coll["bytes_total"],
        "predicted_ici_ms": round(t_ici * 1e3, 3),
        "per_device_compute_ms": round(per_dev * 1e3, 2),
        "predicted_step_efficiency": round(eff, 4),
        "predicted_image_latency_s": round(lat, 3),
        "predicted_images_per_s": round(dp / lat, 3),
    }


def account_full_shapes(n_devices: int,
                        include_flux: bool = True,
                        emit=print) -> Dict[str, Any]:
    """Compile+account SDXL/Flux at real dims on an existing ≥n-device
    backend. Emits each row as it lands (the caller may be time-boxed)."""
    import jax

    from forge_tpu.parallel import mesh as mesh_mod

    rows: Dict[str, Any] = {}
    t_all = time.time()
    configs = [(1, 2), (1, 4)]
    if n_devices >= 8:
        configs.append((4, 2))
    for dp, tp in configs:
        nd = dp * tp
        if nd > n_devices:
            continue
        mesh = mesh_mod.make_mesh(dp=dp, tp=tp, devices=jax.devices()[:nd])
        t0 = time.time()
        row = _sdxl_row(mesh, dp, tp)
        row["compile_wall_s"] = round(time.time() - t0, 1)
        rows[f"sdxl_dp{dp}_tp{tp}"] = row
        emit("FULL_SHAPE_ROW " + json.dumps(row))
    # dp rows need no compile: dp inference is collective-free by the toy
    # dryrun's assertion; predictions follow from the anchors directly
    for dp in (2, 4, 8):
        lat = SDXL_STEPS * SDXL_STEP_S + SDXL_DECODE_S
        rows[f"sdxl_dp{dp}_tp1"] = {
            "model": "sdxl_1024", "dp": dp, "tp": 1, "chips": dp,
            "collectives_per_step": {}, "collective_bytes_per_step": 0,
            "predicted_ici_ms": 0.0,
            "per_device_compute_ms": round(SDXL_STEP_S * 1e3, 2),
            "predicted_step_efficiency": 1.0,
            "predicted_image_latency_s": round(lat, 3),
            "predicted_images_per_s": round(dp / lat, 3),
            "note": "dp is collective-free (asserted in the toy dryrun); "
                    "row derived from the measured single-chip anchor",
        }
    if include_flux:
        for dp, tp in [(1, 2), (1, 4)]:
            if dp * tp > n_devices:
                continue
            mesh = mesh_mod.make_mesh(dp=dp, tp=tp,
                                      devices=jax.devices()[: dp * tp])
            t0 = time.time()
            row = _flux_row(mesh, dp, tp)
            row["compile_wall_s"] = round(time.time() - t0, 1)
            rows[f"flux_dp{dp}_tp{tp}"] = row
            emit("FULL_SHAPE_ROW " + json.dumps(row))
    # the BASELINE north star: ≥1 image/s aggregate on SDXL
    best: Optional[str] = None
    for key, row in rows.items():
        if row["model"] != "sdxl_1024":
            continue
        if row["predicted_images_per_s"] >= 1.0:
            if best is None or row["chips"] < rows[best]["chips"]:
                best = key
    rows["_north_star"] = {
        "target": "sdxl 1024² 30-step ≥1 image/s aggregate",
        "anchors": {"sdxl_step_s": SDXL_STEP_S, "sdxl_decode_s": SDXL_DECODE_S,
                    "flux_step_s": FLUX_STEP_S},
        "min_chips_config": best,
        "min_chips": rows[best]["chips"] if best else None,
        "wall_s": round(time.time() - t_all, 1),
    }
    emit("FULL_SHAPE_NORTH_STAR " + json.dumps(rows["_north_star"]))
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax

    try:
        avail = len(jax.devices())
    except RuntimeError:
        avail = 0
    if avail < n:
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["FORGE_TPU_COMPILE_CACHE"] = "0"  # no cross-machine artifacts
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n}")
        env["XLA_FLAGS"] = " ".join(flags)
        code = (f"import sys; sys.path.insert(0, {repo!r}); "
                f"sys.path.insert(0, {os.path.join(repo, 'tools')!r}); "
                f"import account_full_shapes as a; "
                f"a.account_full_shapes({n})")
        r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo)
        return r.returncode
    account_full_shapes(n)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
