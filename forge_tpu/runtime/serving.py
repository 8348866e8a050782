"""Queue-driven serving: a staged txt2img pipeline that overlaps the
next request's host+text-encode work with the current request's compiled
denoise loop.

TPU-native framing of the reference's queueing (modules/call_queue.py wraps
every generation in one global lock — strictly serial): here the device is
the serial resource, and the three pipeline stages keep it fed:

  prep    (host): seeds → Philox noise → text encode → σ schedule
  denoise (device): the compiled lax.scan loop + the VAE-decode dispatch
          (both async; decode(i) is device-ordered ahead of denoise(i+1),
          and the device→host image copy is started here)
  finish  (host): image fetch (np.asarray on an in-flight copy) → infotext

JAX dispatch is asynchronous, so the denoise stage only *enqueues* device
work; the image fetch of request i proceeds while request i+1's prep runs on
the host and its denoise computes behind i's decode. On a dp-sharded mesh
the same pipeline fans each request's batch across chips (engine.attach_mesh).

Single-worker discipline per stage (one thread each) keeps compiled-cache
access race-free — the denoise stage is the only toucher of engine._jit_cache.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class ServingPipeline:
    """Pipelined txt2img serving for plain requests (no hires/refiner/img2img
    — those fall back to process_images)."""

    def __init__(self, engine, depth: int = 4):
        self.engine = engine
        self._prep_q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._denoise_q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._finish_q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._closed = False
        self._threads = [
            threading.Thread(target=self._prep_loop, daemon=True,
                             name="serve-prep"),
            threading.Thread(target=self._denoise_loop, daemon=True,
                             name="serve-denoise"),
            threading.Thread(target=self._finish_loop, daemon=True,
                             name="serve-finish"),
        ]
        for t in self._threads:
            t.start()

    # -- public api ----------------------------------------------------------

    def submit(self, p) -> Future:
        if self._closed:
            raise RuntimeError("ServingPipeline is closed")
        fut: Future = Future()
        self._prep_q.put((p, fut))
        return fut

    def close(self, wait: bool = True, timeout: float = 300.0):
        """Graceful shutdown: stop accepting work, let the poison pill drain
        every queued request through all three stages, join the workers.
        Requests submitted before close() still complete (or carry their
        exception); submit() afterwards raises."""
        if self._closed:
            return
        self._closed = True
        self._prep_q.put(None)
        if wait:
            deadline = time.time() + timeout
            for t in self._threads:
                t.join(max(deadline - time.time(), 0.1))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def map(self, ps: List) -> List:
        futs = [self.submit(p) for p in ps]
        return [f.result() for f in futs]

    # -- stages --------------------------------------------------------------

    def _prep_loop(self):
        from ..ops.image_rng import ImageRNG
        from ..pipeline.processing import (_apply_option_defaults,
                                           _build_scheduled_cond,
                                           _prepare_noise,
                                           _record_generation_params,
                                           _resolve_seeds)
        from ..sampling.samplers import get_sampler
        from ..sampling.schedules import get_sigmas

        engine = self.engine
        while True:
            item = self._prep_q.get()
            if item is None:
                self._denoise_q.put(None)
                return
            p, fut = item
            try:
                t0 = time.time()
                _resolve_seeds(p)
                _apply_option_defaults(p)
                # same HBM plan as process_images: chunking is a batch-shape
                # decision made up front, and tiled VAE must gate the decode
                # of large canvases here too (the finish stage honors p._plan)
                from ..pipeline.processing import _opt_bool, _tree_bytes
                from ..runtime.memory import plan_generation

                plan = plan_generation(p.batch_size, p.height, p.width,
                                       weight_bytes=_tree_bytes(
                                           engine.loaded.unet))
                if _opt_bool("vae_always_tiled"):
                    plan.tiled_vae = True
                p._plan = plan
                engine.set_clip_skip(p.clip_skip)
                _record_generation_params(engine, p)
                info = get_sampler(p.sampler_name)
                lc = engine.latent_format.latent_channels
                h8, w8 = p.height // 8, p.width // 8
                seeds = p.all_seeds[: p.batch_size]
                rng = ImageRNG((lc, h8, w8), seeds, subseeds=p.all_subseeds,
                               subseed_strength=p.subseed_strength,
                               eta_noise_seed_delta=p.eta_noise_seed_delta
                               if info.uses_ensd else 0)
                noise0 = np.transpose(rng.next(), (0, 2, 3, 1))
                from ..pipeline.processing import _auto_schedule

                schedule = _auto_schedule(p.sampler_name, p.scheduler)
                sigmas = get_sigmas(schedule, p.steps, engine.predictor,
                                    discard_next_to_last=info.discard_next_to_last_sigma)
                step_noise = _prepare_noise(p, rng, info, len(sigmas) - 1,
                                            sigmas=sigmas, seeds=seeds)
                cond, branches, weights = _build_scheduled_cond(
                    engine, p, [p.prompt] * p.batch_size)
                uncond, _, _ = _build_scheduled_cond(
                    engine, p, [p.negative_prompt] * p.batch_size,
                    is_negative=True, allow_and=False)
                p._cond_branches, p._branch_weights, p._branch_masks = branches, weights, None
                if engine.family in ("flux", "chroma"):
                    g = jnp.full((p.batch_size,), p.distilled_cfg_scale, jnp.float32)
                    cond = dict(cond, guidance=g)
                    uncond = dict(uncond, guidance=g)
                x = jnp.asarray(engine.predictor.noise_scaling(
                    np.float32(sigmas[0]), noise0.astype(np.float32),
                    np.zeros_like(noise0), max_denoise=False))
                self._denoise_q.put((p, fut, x, sigmas, step_noise, cond, uncond,
                                     {"prep": time.time() - t0}))
            except Exception as e:  # noqa: BLE001 — fail the request, keep serving
                fut.set_exception(e)

    def _denoise_loop(self):
        from ..pipeline.processing import _decode_dispatch, _run_sampler

        while True:
            item = self._denoise_q.get()
            if item is None:
                self._finish_q.put(None)
                return
            p, fut, x, sigmas, step_noise, cond, uncond, timings = item
            try:
                t0 = time.time()
                latent = _run_sampler(self.engine, p, x, sigmas, step_noise,
                                      cond, uncond,
                                      skip_uncond=(p.cfg_scale == 1.0))
                timings["dispatch"] = time.time() - t0
                # Dispatch the decode HERE (not in finish): device-orders
                # decode(i) ahead of denoise(i+1) and starts the device→host
                # image copy early, so the tunnel fetch of request i overlaps
                # request i+1's denoise compute. Nothing here blocks: the
                # finish stage's np.asarray is the only synchronization.
                t0 = time.time()
                handle = _decode_dispatch(self.engine, latent, p)
                timings["decode_dispatch"] = time.time() - t0
                self._finish_q.put((p, fut, handle, timings))
            except Exception as e:  # noqa: BLE001
                fut.set_exception(e)

    def _finish_loop(self):
        from ..pipeline.processing import _decode_finish, create_infotext

        while True:
            item = self._finish_q.get()
            if item is None:
                return
            p, fut, handle, timings = item
            try:
                t0 = time.time()
                images = _decode_finish(self.engine, handle, p)
                timings["finish"] = time.time() - t0
                infos = [create_infotext(p, p.all_seeds[b], p.all_subseeds[b])
                         for b in range(images.shape[0])]
                fut.set_result({"images": [images[b] for b in range(images.shape[0])],
                                "infotexts": infos, "timings": timings})
            except Exception as e:  # noqa: BLE001
                fut.set_exception(e)


def serve_throughput(engine, ps, depth: int = 4) -> dict:
    """Run a list of Processing requests through the pipeline; → metrics."""
    pipe = ServingPipeline(engine, depth=depth)
    t0 = time.time()
    outs = pipe.map(ps)
    wall = time.time() - t0
    pipe.close()
    n_images = sum(len(o["images"]) for o in outs)
    return {"wall_s": wall, "n_images": n_images,
            "images_per_s": n_images / wall, "outputs": outs}
