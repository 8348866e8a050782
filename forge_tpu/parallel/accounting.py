"""Collective accounting from partitioned HLO: the honest multi-chip story.

A 1-core host running 8 virtual devices cannot produce a meaningful measured
scaling curve (round-3's `overhead_adjusted_efficiency` could not fall below
~1 on such a host, so it indicted nothing). What CAN be stated precisely
without N real chips:

  * exactly which collectives the SPMD partitioner inserted into the compiled
    program (parsed from post-partitioning HLO), how many, and how many bytes
    each moves per step;
  * a first-order ICI time model for those bytes on the target topology
    (v5e: 2D torus, ~45 GB/s per link per direction — the "How to Scale Your
    Model" ring-collective cost model: all-reduce moves 2·(n−1)/n·bytes,
    all-gather/reduce-scatter (n−1)/n·bytes, permute bytes);
  * predicted efficiency = t_compute / (t_compute + t_ici), with t_compute
    taken from a real single-device measurement.

The real-hardware numbers remain the bench rounds' job; this module makes the
dry run's claim checkable: dp inference MUST show zero collectives in the
denoise loop (params replicated, batch sharded), and tp MUST show the
Megatron all-reduce pattern.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

# v5e ICI: one link direction ≈ 45 GB/s sustained (public v5e spec: 1600 Gbps
# aggregate ICI per chip across 4 links × 2 directions ≈ 50 GB/s each; a ring
# collective is bottlenecked by one direction of one link)
V5E_LINK_BYTES_PER_S = 45e9

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

# `%name = f32[2,16]{1,0} all-reduce(...)` and the tuple/async-start variants;
# shapes inside the result-type prefix are captured and sized individually.
_OP_RE = re.compile(
    r"=\s*(\(?[a-z0-9\[\],{}\s/()]*?\)?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start|-done)?\(", re.IGNORECASE)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def hlo_collectives(hlo_text: str) -> Dict[str, Any]:
    """→ {counts: {op: n}, bytes: {op: B}, bytes_total} from (partitioned)
    HLO text. `-done` ops are skipped so async pairs count once."""
    counts: Dict[str, int] = {}
    bytes_: Dict[str, int] = {}
    for m in _OP_RE.finditer(hlo_text):
        op = m.group(2).lower()
        if (m.group(3) or "").lower() == "-done":
            continue
        b = _shape_bytes(m.group(1))
        counts[op] = counts.get(op, 0) + 1
        bytes_[op] = bytes_.get(op, 0) + b
    return {"counts": counts, "bytes": bytes_,
            "bytes_total": sum(bytes_.values())}


def ici_time_s(collectives: Mapping[str, Any], n_devices: int,
               link_bw: float = V5E_LINK_BYTES_PER_S) -> float:
    """Ring-collective time for the parsed ops on an n-device ICI ring."""
    if n_devices <= 1:
        return 0.0
    t = 0.0
    frac = (n_devices - 1) / n_devices
    for op, b in collectives["bytes"].items():
        if op == "all-reduce":
            t += 2.0 * frac * b / link_bw
        elif op in ("all-gather", "reduce-scatter"):
            t += frac * b / link_bw
        else:  # permute / all-to-all: one traversal
            t += b / link_bw
    return t


def account_program(jitted, args, n_devices: int,
                    compute_time_s: float) -> Dict[str, Any]:
    """Compile `jitted(*args)`, parse its partitioned HLO, and predict the
    scaling efficiency given a measured single-device compute time."""
    compiled = jitted.lower(*args).compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    coll = hlo_collectives(texts)
    t_ici = ici_time_s(coll, n_devices)
    eff = compute_time_s / (compute_time_s + t_ici) if compute_time_s else None
    return {
        "collectives_per_step": coll["counts"],
        "collective_bytes_per_step": coll["bytes_total"],
        "predicted_ici_ms": round(t_ici * 1e3, 4),
        "predicted_efficiency": round(eff, 4) if eff is not None else None,
    }
