"""txt2img / img2img processing pipeline.

The compiled-JAX re-expression of the reference's orchestration layer
(modules/processing.py:815 process_images / :852 process_images_inner,
txt2img :1342, img2img :1844): resolve seeds → encode prompts (cond+uncond,
chunk-equalized) → build Philox noise → run the whole denoise loop as ONE
jitted lax.scan program → VAE decode → uint8 images + infotext.

Everything shape-dependent is compiled once per (model, sampler, steps,
resolution, batch) key and cached on the engine.
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image_rng import ImageRNG
from ..sampling import cfg as cfg_mod
from ..sampling.samplers import get_sampler
from ..sampling.schedules import get_sigmas
from .engine import DiffusionEngine


@dataclasses.dataclass
class Processing:
    prompt: str = ""
    negative_prompt: str = ""
    seed: int = -1
    subseed: int = -1
    subseed_strength: float = 0.0
    seed_resize_from_h: int = 0
    seed_resize_from_w: int = 0
    sampler_name: str = "Euler a"
    scheduler: str = "automatic"
    steps: int = 20
    cfg_scale: float = 7.0
    width: int = 512
    height: int = 512
    batch_size: int = 1
    n_iter: int = 1
    eta: float = 1.0
    s_churn: float = 0.0
    s_noise: float = 1.0
    clip_skip: int = 1
    eta_noise_seed_delta: int = 0
    cfg_rescale: float = 0.0
    # img2img
    init_images: Optional[List[np.ndarray]] = None  # [H,W,3] uint8/float
    denoising_strength: float = 0.75
    inpaint_mask: Optional[np.ndarray] = None  # [H,W] float 0..1, 1=repaint
    mask_blur: float = 4.0
    inpainting_fill: str = "original"  # fill | original | latent_noise | latent_nothing
    inpaint_full_res: bool = False
    inpaint_full_res_padding: int = 32
    inpainting_mask_invert: bool = False
    # hires fix
    enable_hr: bool = False
    hr_scale: float = 2.0
    hr_second_pass_steps: int = 0
    hr_upscaler: str = "Latent"
    hr_denoising_strength: float = 0.7

    all_seeds: Optional[List[int]] = None
    all_subseeds: Optional[List[int]] = None


@dataclasses.dataclass
class Processed:
    images: List[np.ndarray]  # uint8 HWC
    seeds: List[int]
    subseeds: List[int]
    infotexts: List[str]
    params: Dict[str, Any]
    timings: Dict[str, float]


def parse_prompt_networks_stripped(prompt: str) -> str:
    from .extra_networks import parse_prompt

    return parse_prompt(prompt)[0]


def _resolve_seeds(p: Processing) -> None:
    def fix(s):
        return random.randrange(4294967294) if s is None or int(s) == -1 else int(s)

    base = fix(p.seed)
    sub = fix(p.subseed)
    n = p.batch_size * p.n_iter
    p.all_seeds = [base + i for i in range(n)]
    p.all_subseeds = [sub + i for i in range(n)]
    p.seed = base
    p.subseed = sub


def _auto_schedule(sampler_name: str, scheduler: str) -> str:
    if scheduler and scheduler != "automatic":
        return scheduler
    # reference behavior: 'Karras'-suffixed classic defaults; modern default
    # is uniform-in-timestep ('normal') for everything else
    if "Karras" in sampler_name:
        return "karras"
    return "normal"


def _sample_jit_key(p: Processing, engine, shape, skip_uncond, sigmas, kind="txt2img"):
    import hashlib

    sig_hash = hashlib.md5(np.asarray(sigmas, np.float32).tobytes()).hexdigest()[:12]
    # params enter the jitted fn as traced arguments, so LoRA-patched trees
    # (same structure) reuse the same executable — key on family, not identity
    return (
        "sample", kind, engine.family, p.sampler_name, sig_hash, shape,
        skip_uncond, bool(p.s_churn), p.eta, p.cfg_rescale,
    )


def _build_sample_fn(engine: DiffusionEngine, p: Processing, skip_uncond: bool,
                     masked: bool, sigmas_np: np.ndarray):
    info = get_sampler(p.sampler_name)
    apply_raw = engine.unet_apply_fn()
    predictor = engine.predictor

    def fn(unet_params, x, noise, cond, uncond, cfg_scale, mask, init_latent):
        # σ values are compile-time constants (host numpy): samplers fold them
        # and LMS/ipndm/deis derive host-side integration coefficients.
        sigmas = sigmas_np
        apply_model = cfg_mod.make_apply_model(
            apply_raw, unet_params, predictor, engine.compute_dtype
        )
        model_fn = cfg_mod.make_cfg_model_fn(
            apply_model, cond, None if skip_uncond else uncond,
            cfg_scale, cfg_rescale=p.cfg_rescale,
        )
        if masked:
            model_fn = cfg_mod.make_masked_model_fn(model_fn, mask, init_latent, predictor)

        import inspect

        sig = inspect.signature(info.fn)
        kwargs = {}
        if info.noise_draws > 0:
            kwargs["noise"] = noise
        for name, value in (("eta", p.eta), ("s_noise", p.s_noise), ("s_churn", p.s_churn)):
            if name in sig.parameters:
                kwargs[name] = value
        return info.fn(model_fn, x, sigmas, **kwargs)

    return jax.jit(fn, donate_argnums=(1,))


def _prepare_noise(p: Processing, rng: ImageRNG, info, n_steps: int):
    """Per-step sampler noise [n_steps, draws, B, h, w, C] (NHWC)."""
    if info.noise_draws == 0:
        return None
    draws = []
    for _ in range(n_steps):
        step = [np.transpose(rng.next(), (0, 2, 3, 1)) for _ in range(info.noise_draws)]
        draws.append(np.stack(step))
    return jnp.asarray(np.stack(draws))


_PHASE = {}


def process_images(engine: DiffusionEngine, p: Processing) -> Processed:
    t0 = time.time()
    _PHASE.clear()
    _resolve_seeds(p)
    engine.set_clip_skip(p.clip_skip)

    is_img2img = p.init_images is not None
    timings: Dict[str, float] = {}
    images: List[np.ndarray] = []
    infotexts: List[str] = []

    for it in range(p.n_iter):
        seeds = p.all_seeds[it * p.batch_size : (it + 1) * p.batch_size]
        subseeds = p.all_subseeds[it * p.batch_size : (it + 1) * p.batch_size]
        from .extra_networks import activate as activate_networks

        prompts, unet_params, patched_tes = activate_networks(
            engine, [p.prompt] * p.batch_size,
            registry=getattr(engine, "lora_registry", None),
        )
        negs = [parse_prompt_networks_stripped(p.negative_prompt)] * p.batch_size

        orig_te = {}
        for te_name, pt in patched_tes.items():
            orig_te[te_name] = engine.text_engines[te_name].params
            engine.text_engines[te_name].params = pt

        # -- conditioning (chunk-equalized cond/uncond) ---------------------
        tc = time.time()
        eng0 = next(iter(engine.text_engines.values()))
        _, mc_pos = eng0.tokenize_batch(prompts)
        _, mc_neg = eng0.tokenize_batch(negs)
        max_chunks = max(mc_pos, mc_neg)
        cond = engine.get_learned_conditioning(
            prompts, p.width, p.height, max_chunks=max_chunks
        )
        uncond = engine.get_learned_conditioning(
            negs, p.width, p.height, is_negative=True, max_chunks=max_chunks
        )
        timings["cond"] = time.time() - tc
        for te_name, orig in orig_te.items():
            engine.text_engines[te_name].params = orig

        if is_img2img:
            batch_images = _sample_img2img(engine, p, seeds, subseeds, cond, uncond, unet_params)
        else:
            batch_images = _sample_txt2img(engine, p, seeds, subseeds, cond, uncond, unet_params)
        timings.update(_PHASE)

        ts = time.time()
        for b in range(p.batch_size):
            img = batch_images[b]
            if is_img2img and p.inpaint_mask is not None:
                img = _composite_inpaint(p, img, p.init_images[min(b, len(p.init_images) - 1)])
            images.append(img)
            infotexts.append(create_infotext(p, seeds[b], subseeds[b]))
        timings["post"] = time.time() - ts

    timings["total"] = time.time() - t0
    return Processed(
        images=images,
        seeds=p.all_seeds,
        subseeds=p.all_subseeds,
        infotexts=infotexts,
        params=dataclasses.asdict(p),
        timings=timings,
    )


def _decode_to_uint8(engine: DiffusionEngine, latent: jax.Array) -> np.ndarray:
    t0 = time.time()
    imgs = engine.decode_first_stage(latent)
    imgs = np.asarray(imgs.astype(jnp.float32))
    imgs = np.clip((imgs + 1.0) / 2.0, 0.0, 1.0)
    out = (imgs * 255.0 + 0.5).astype(np.uint8)
    _PHASE["decode"] = time.time() - t0
    return out


def _run_sampler(engine, p, x, sigmas, noise, cond, uncond, skip_uncond,
                 mask=None, init_latent=None, kind="txt2img", unet_params=None):
    shape = tuple(x.shape)
    key = _sample_jit_key(p, engine, shape, skip_uncond, sigmas, kind) + (mask is not None,)
    if key not in engine._jit_cache:
        engine._jit_cache[key] = _build_sample_fn(
            engine, p, skip_uncond, mask is not None, np.asarray(sigmas, np.float32)
        )
    fn = engine._jit_cache[key]
    zero = jnp.zeros((), jnp.float32)
    mask_in = zero if mask is None else mask
    init_in = zero if init_latent is None else init_latent
    return fn(
        engine.loaded.unet if unet_params is None else unet_params, x, noise,
        cond, uncond, jnp.asarray(p.cfg_scale, jnp.float32), mask_in, init_in,
    )


def _sample_txt2img(engine: DiffusionEngine, p: Processing, seeds, subseeds, cond, uncond, unet_params=None):
    t_noise = time.time()
    info = get_sampler(p.sampler_name)
    lc = engine.latent_format.latent_channels
    h8, w8 = p.height // 8, p.width // 8

    rng = ImageRNG(
        (lc, h8, w8), seeds, subseeds=subseeds,
        subseed_strength=p.subseed_strength,
        seed_resize_from_h=p.seed_resize_from_h, seed_resize_from_w=p.seed_resize_from_w,
        eta_noise_seed_delta=p.eta_noise_seed_delta if info.uses_ensd else 0,
    )
    noise0 = np.transpose(rng.next(), (0, 2, 3, 1))  # NCHW → NHWC

    schedule = _auto_schedule(p.sampler_name, p.scheduler)
    sigmas = get_sigmas(
        schedule, p.steps, engine.predictor,
        discard_next_to_last=info.discard_next_to_last_sigma,
    )
    n_steps = len(sigmas) - 1
    step_noise = _prepare_noise(p, rng, info, n_steps)

    x = jnp.asarray(
        engine.predictor.noise_scaling(
            np.float32(sigmas[0]), noise0.astype(np.float32), np.zeros_like(noise0), max_denoise=False
        )
    )
    _PHASE["noise"] = time.time() - t_noise

    t1 = time.time()
    latent = _run_sampler(engine, p, x, sigmas, step_noise, cond, uncond,
                          skip_uncond=(p.cfg_scale == 1.0), unet_params=unet_params)
    latent.block_until_ready()
    _PHASE["sample"] = time.time() - t1

    if p.enable_hr:
        latent = _hires_pass(engine, p, latent, seeds, subseeds, cond, uncond, unet_params)

    return _decode_to_uint8(engine, latent)


def _latent_upscale(latent: jax.Array, scale: float) -> jax.Array:
    b, h, w, c = latent.shape
    nh, nw = int(h * scale), int(w * scale)
    return jax.image.resize(latent, (b, nh, nw, c), method="bilinear")


def _hires_pass(engine, p, latent, seeds, subseeds, cond, uncond, unet_params=None):
    """Hires-fix second pass (reference processing.py:1430 sample_hr_pass),
    latent-space upscale variant."""
    info = get_sampler(p.sampler_name)
    latent = _latent_upscale(latent, p.hr_scale)
    b, h8, w8, lc = latent.shape

    steps = p.hr_second_pass_steps or p.steps
    schedule = _auto_schedule(p.sampler_name, p.scheduler)
    full_sigmas = get_sigmas(schedule, steps, engine.predictor,
                             discard_next_to_last=info.discard_next_to_last_sigma)
    t_enc = min(int(p.hr_denoising_strength * steps), steps - 1)
    sigmas = full_sigmas[steps - t_enc:]

    rng = ImageRNG((lc, h8, w8), seeds, subseeds=subseeds,
                   subseed_strength=p.subseed_strength)
    noise0 = np.transpose(rng.next(), (0, 2, 3, 1))
    n_steps = len(sigmas) - 1
    step_noise = _prepare_noise(p, rng, info, n_steps)

    x = jnp.asarray(engine.predictor.noise_scaling(
        np.float32(sigmas[0]), noise0.astype(np.float32),
        np.asarray(latent, np.float32), max_denoise=False,
    ))
    return _run_sampler(engine, p, x, sigmas, step_noise, cond, uncond,
                        skip_uncond=(p.cfg_scale == 1.0), kind="hires",
                        unet_params=unet_params)


# ---------------------------------------------------------------------------
# img2img / inpaint


def _gaussian_blur(img: np.ndarray, radius: float) -> np.ndarray:
    if radius <= 0:
        return img
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, sigma=radius)


def _sample_img2img(engine: DiffusionEngine, p: Processing, seeds, subseeds, cond, uncond, unet_params=None):
    info = get_sampler(p.sampler_name)
    lc = engine.latent_format.latent_channels
    h8, w8 = p.height // 8, p.width // 8

    # init latent from the VAE
    imgs = []
    for im in p.init_images:
        arr = np.asarray(im).astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        imgs.append(arr * 2.0 - 1.0)
    batch = np.stack([imgs[min(i, len(imgs) - 1)] for i in range(p.batch_size)])
    init_latent = engine.encode_first_stage(jnp.asarray(batch))
    init_latent = init_latent.astype(jnp.float32)

    # latent mask
    mask_latent = None
    if p.inpaint_mask is not None:
        m = np.asarray(p.inpaint_mask, dtype=np.float32)
        if m.max() > 1.5:
            m = m / 255.0
        if p.inpainting_mask_invert:
            m = 1.0 - m
        m = _gaussian_blur(m, p.mask_blur)
        m8 = np.asarray(jax.image.resize(jnp.asarray(m), (h8, w8), "bilinear"))
        mask_latent = jnp.asarray(np.clip(m8, 0, 1)[None, :, :, None])

        if p.inpainting_fill == "fill":
            blurred = _gaussian_blur(batch, 10.0)
            fill_latent = engine.encode_first_stage(jnp.asarray(blurred)).astype(jnp.float32)
            init_latent = init_latent * (1 - mask_latent) + fill_latent * mask_latent
        elif p.inpainting_fill == "latent_nothing":
            init_latent = init_latent * (1 - mask_latent)

    rng = ImageRNG((lc, h8, w8), seeds, subseeds=subseeds,
                   subseed_strength=p.subseed_strength,
                   seed_resize_from_h=p.seed_resize_from_h,
                   seed_resize_from_w=p.seed_resize_from_w,
                   eta_noise_seed_delta=p.eta_noise_seed_delta if info.uses_ensd else 0)
    noise0 = np.transpose(rng.next(), (0, 2, 3, 1)).astype(np.float32)

    # truncated schedule (reference setup_img2img_steps, sd_samplers_common.py:24)
    steps = p.steps
    t_enc = min(int(p.denoising_strength * steps), steps - 1)
    schedule = _auto_schedule(p.sampler_name, p.scheduler)
    full_sigmas = get_sigmas(schedule, steps, engine.predictor,
                             discard_next_to_last=info.discard_next_to_last_sigma)
    sigmas = full_sigmas[steps - t_enc - 1:]
    n_steps = len(sigmas) - 1
    step_noise = _prepare_noise(p, rng, info, n_steps)

    if p.inpainting_fill == "latent_noise" and mask_latent is not None:
        init_latent = init_latent + noise0 * mask_latent * float(sigmas[0])

    x = jnp.asarray(engine.predictor.noise_scaling(
        np.float32(sigmas[0]), noise0, np.asarray(init_latent, np.float32), max_denoise=False,
    ))

    latent = _run_sampler(engine, p, x, sigmas, step_noise, cond, uncond,
                          skip_uncond=(p.cfg_scale == 1.0),
                          mask=mask_latent, init_latent=init_latent, kind="img2img",
                          unet_params=unet_params)
    return _decode_to_uint8(engine, latent)


def _composite_inpaint(p: Processing, generated: np.ndarray, original) -> np.ndarray:
    """Paste generated pixels into the original under the (blurred) mask."""
    orig = np.asarray(original).astype(np.float32)
    if orig.max() <= 1.5:
        orig = orig * 255.0
    m = np.asarray(p.inpaint_mask, dtype=np.float32)
    if m.max() > 1.5:
        m = m / 255.0
    if p.inpainting_mask_invert:
        m = 1.0 - m
    m = np.clip(_gaussian_blur(m, p.mask_blur), 0, 1)[..., None]
    out = orig * (1 - m) + generated.astype(np.float32) * m
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# infotext (reference processing.py:668-798 create_infotext)


def create_infotext(p: Processing, seed: int, subseed: int) -> str:
    pairs = [
        ("Steps", p.steps),
        ("Sampler", p.sampler_name),
        ("Schedule type", p.scheduler if p.scheduler != "automatic" else None),
        ("CFG scale", p.cfg_scale),
        ("Seed", seed),
        ("Size", f"{p.width}x{p.height}"),
        ("Denoising strength", p.denoising_strength if p.init_images is not None or p.enable_hr else None),
        ("Clip skip", p.clip_skip if p.clip_skip > 1 else None),
        ("ENSD", p.eta_noise_seed_delta or None),
        ("Variation seed", subseed if p.subseed_strength else None),
        ("Variation seed strength", p.subseed_strength or None),
        ("Hires upscale", p.hr_scale if p.enable_hr else None),
    ]
    settings = ", ".join(f"{k}: {v}" for k, v in pairs if v is not None)
    neg = f"\nNegative prompt: {p.negative_prompt}" if p.negative_prompt else ""
    return f"{p.prompt}{neg}\n{settings}"
