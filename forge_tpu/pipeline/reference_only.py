"""Reference-only / reference-adain guidance (weightless style transfer).

Behavioral twin of the reference's forge_preprocessor_reference extension
(extensions-builtin/forge_preprocessor_reference/scripts/forge_reference.py):
each denoise step inside the guidance window runs the UNet TWICE —

  1. a *recording* pass on the reference image's latent noised to the current
     σ (xt = z_ref + n_t·σ, fresh per-step noise from seed+1), during which
     every self-attention's (k, v) and/or every block output's channel
     (std, mean) are captured per block location
     (forge_reference.py:79-88 conditioning_modifier + :135-183 attn1_proc);
  2. the real CFG pass, where self-attention for the cond rows attends over
     [self k,v ‖ recorded k,v] and the uncond rows blend plain vs concatenated
     attention by `style_fidelity` (:155-183); the adain variants renormalize
     block outputs to the recorded statistics (:95-133 block_proc).

TPU re-design: the reference mutates the live nn.Module with replace-all
hooks and an extra eager sampling_function call; here both passes are traced
into the SAME compiled scan body. The capture hooks append traced (k, v)
values to a Python dict during tracing of pass 1; the consume hooks close
over that dict while pass 2 is traced — the recorded tensors become ordinary
dataflow edges inside one XLA program, and everything downstream of the last
recorded tensor in the capture pass is dead code the compiler deletes. The
σ-window gate is a lax.cond, so out-of-window steps execute only the single
plain pass. Channel-count gates (minimal_channel, :109/:147) are static
Python conditions on trace-time shapes.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention


@dataclasses.dataclass
class ReferenceState:
    """Attached to Processing by the controlnet unit builder (module name
    'reference_only' / 'reference_adain' / 'reference_adain+attn')."""

    latent: Any               # [1,h,w,C] regulated reference latent
    style_fidelity: float     # 0..1 (already **3 for SDXL at build time)
    weight: float             # unit weight → minimal-channel thresholds
    use_attn: bool
    use_adain: bool
    start_percent: float = 0.0
    end_percent: float = 1.0
    seed: int = 1             # noise stream for the recording pass
    digest: str = ""          # jit-cache key component


def attach_reference(engine, p, img_u8: np.ndarray, module: str,
                     style_fidelity: float = 0.5, weight: float = 1.0,
                     start: float = 0.0, end: float = 1.0) -> ReferenceState:
    """Deferred-hook builder body: VAE-encode the reference image at the
    generation resolution and attach a ReferenceState to `p`."""
    from ..preprocessors.cv import bilinear_resize

    use_attn = "attn" in module or module == "reference_only"
    use_adain = "adain" in module
    if engine.family in ("sdxl", "playground", "kolors"):
        # SDXL is very sensitive to reference guidance (forge_reference.py:59)
        style_fidelity = float(style_fidelity) ** 3.0
    arr = np.asarray(img_u8, np.float32) / 255.0
    arr = bilinear_resize(arr, p.height, p.width)
    x = jnp.asarray(arr[None] * 2.0 - 1.0, jnp.float32)
    latent = engine.encode_first_stage(x)
    digest = hashlib.sha256(
        f"{module}|{style_fidelity}|{weight}|{start}|{end}|"
        f"{hashlib.sha256(np.ascontiguousarray(img_u8).tobytes()).hexdigest()}"
        .encode()).hexdigest()[:16]
    state = ReferenceState(
        latent=latent, style_fidelity=float(style_fidelity), weight=float(weight),
        use_attn=use_attn, use_adain=use_adain,
        start_percent=float(start), end_percent=float(end),
        seed=int(p.seed or 0) + 1, digest=digest,
    )
    p.reference_state = state
    p.extra_generation_params.setdefault("Reference", module)
    return state


def reference_step_noise(ref: ReferenceState, n_steps: int) -> np.ndarray:
    """Per-step recording noise [n_steps, 1, h, w, C] from the Philox stream
    seeded with seed+1 (forge_reference.py:67 gen_seed)."""
    from ..ops.rng_philox import Generator

    _, h, w, c = ref.latent.shape
    g = Generator(ref.seed)
    steps = [np.transpose(g.randn((c, h, w)), (1, 2, 0)) for _ in range(n_steps)]
    return np.stack(steps).astype(np.float32)[:, None]


def _adain(h: jax.Array, std: jax.Array, mean: jax.Array) -> jax.Array:
    m = jnp.mean(h, axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(h - m), axis=(1, 2), keepdims=True)
    s = jnp.sqrt(jnp.maximum(v, 1e-12))
    return ((h - m) / s) * std.astype(h.dtype) + mean.astype(h.dtype)


def _std_mean(h: jax.Array):
    m = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(h.astype(jnp.float32) - m), axis=(1, 2), keepdims=True)
    return jnp.sqrt(jnp.maximum(v, 1e-12)), m


def build_reference_hooks(ref: ReferenceState, base_hooks: Optional[Mapping[str, Any]],
                          n_cond_rows: int, skip_uncond: bool):
    """→ (capture_hooks, consume_hooks). Both extend base_hooks; the capture
    dict records into trace-time registries the consume dict reads."""
    rec_kv: Dict[Any, Any] = {}
    rec_h: Dict[Any, Any] = {}
    min_ch_attn = 1500.0 - 1280.0 * ref.weight
    min_ch_adain = 1500.0 - 1000.0 * ref.weight
    fid = float(ref.style_fidelity)

    capture = dict(base_hooks or {})
    consume = dict(base_hooks or {})

    if ref.use_attn:
        def cap_attn(q, k, v, extra):
            if q.shape[-1] >= min_ch_attn:
                rec_kv[(extra["block"], extra.get("block_index", 0))] = (k, v)
            return attention(q, k, v, heads=extra["n_heads"])

        def con_attn(q, k, v, extra):
            key = (extra["block"], extra.get("block_index", 0))
            heads = extra["n_heads"]
            if key not in rec_kv:
                return attention(q, k, v, heads=heads)
            k_r, v_r = rec_kv[key]

            def cat_r(a, r):
                r = jnp.broadcast_to(r, (a.shape[0],) + r.shape[1:]).astype(a.dtype)
                return jnp.concatenate([a, r], axis=1)

            if skip_uncond:
                return attention(q, cat_r(k, k_r), cat_r(v, v_r), heads=heads)
            b = n_cond_rows
            q_c, q_uc = q[:b], q[b:]
            k_c, k_uc = k[:b], k[b:]
            v_c, v_uc = v[:b], v[b:]
            o_c = attention(q_c, cat_r(k_c, k_r), cat_r(v_c, v_r), heads=heads)
            o_uc_strong = attention(q_uc, k_uc, v_uc, heads=heads)
            o_uc_weak = attention(q_uc, cat_r(k_uc, k_r), cat_r(v_uc, v_r), heads=heads)
            o_uc = o_uc_weak + (o_uc_strong - o_uc_weak) * fid
            return jnp.concatenate([o_c, o_uc], axis=0)

        capture["attn1_replace_all"] = cap_attn
        consume["attn1_replace_all"] = con_attn

    if ref.use_adain:
        def cap_block(h, block_id):
            if h.shape[-1] >= min_ch_adain:
                rec_h[block_id] = _std_mean(h)
            return h

        def con_block(h, block_id):
            if block_id not in rec_h:
                return h
            std, mean = rec_h[block_id]
            if skip_uncond:
                return _adain(h, std, mean)
            b = n_cond_rows
            h_c, h_uc = h[:b], h[b:]
            o_c = _adain(h_c, std, mean)
            o_uc_weak = _adain(h_uc, std, mean)
            o_uc = o_uc_weak + (h_uc - o_uc_weak) * fid
            return jnp.concatenate([o_c, o_uc], axis=0)

        for slot in ("input_block_patch", "middle_block_patch",
                     "output_block_patch_after"):
            capture[slot] = tuple(capture.get(slot, ())) + (cap_block,)
            consume[slot] = tuple(consume.get(slot, ())) + (con_block,)

    return capture, consume


def wrap_reference(apply_plain: Callable, build_apply: Callable,
                   make_apply_model: Callable, p, ref: ReferenceState,
                   sigmas_np: np.ndarray, skip_uncond: bool, ref_in):
    """Wrap the σ-space apply_model with the windowed two-pass logic.

    apply_plain: the already-built apply_model(x, σ, cond) for out-of-window
    steps. build_apply(hooks) → raw unet apply (offload-wrapped, controlnets
    attached). make_apply_model(raw) → σ-space wrapper around it.
    ref_in = (latent [1,h,w,C], noise [n_steps,1,h,w,C]) as jit arguments —
    passing them as args (not closure constants) keeps the executable
    reusable across seeds/images with the same manifest digest.
    """
    n_cond_rows = p.batch_size
    capture_hooks, consume_hooks = build_reference_hooks(
        ref, p.unet_hooks, n_cond_rows, skip_uncond)
    apply_capture = make_apply_model(build_apply(capture_hooks))
    apply_consume = make_apply_model(build_apply(consume_hooks))
    n_steps = max(len(sigmas_np) - 1, 1)
    table = jnp.asarray(-np.asarray(sigmas_np[:-1], np.float32))
    lo = float(ref.start_percent) - 1e-6
    hi = float(ref.end_percent) + 1e-6

    def apply_ref(x, sigma, cond):
        latent, noise = ref_in
        idx = jnp.clip(jnp.searchsorted(table, -sigma, side="right") - 1,
                       0, n_steps - 1)
        frac = idx.astype(jnp.float32) / jnp.float32(max(n_steps - 1, 1))
        in_window = (frac >= lo) & (frac <= hi)

        def two_pass(x):
            xt = latent + jax.lax.dynamic_index_in_dim(
                noise, idx, axis=0, keepdims=False) * sigma
            cond1 = {k: (v[:1] if hasattr(v, "shape") and v.ndim > 0 else v)
                     for k, v in cond.items()}
            # recording pass: output unused; everything not feeding a recorded
            # (k, v)/(std, mean) is DCE'd by XLA
            apply_capture(xt, sigma, cond1)
            return apply_consume(x, sigma, cond)

        def one_pass(x):
            return apply_plain(x, sigma, cond)

        return jax.lax.cond(in_window, two_pass, one_pass, x)

    return apply_ref
