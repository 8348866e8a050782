"""Regional prompts: extra cond branches blended by spatial multiplier maps
(the TPU-native form of the reference's per-cond area/mask machinery,
backend/sampling/sampling_function.py:17-63)."""

import numpy as np
import pytest

from fixtures import make_tiny_engine

from forge_tpu.pipeline.processing import Processing, _region_mult_map, process_images


@pytest.fixture(scope="module")
def engine():
    return make_tiny_engine()


def _p(**kw):
    base = dict(prompt="a landscape", seed=11, steps=3, width=32, height=32,
                cfg_scale=7.0, sampler_name="Euler")
    base.update(kw)
    return Processing(**base)


def test_region_mult_map_area_feather():
    m = _region_mult_map({"area": (0.0, 0.0, 0.5, 1.0), "feather": 2}, 8, 8)
    assert m.shape == (8, 8)
    assert m[:, 0].max() == 1.0          # canvas-touching edge: no ramp
    assert m[0, 3] == 0.5                # feathered inner edge (col 3 = ramp)
    assert (m[:, 4:] == 0).all()         # outside the region
    full = _region_mult_map({"area": (0, 0, 1, 1), "feather": 8}, 8, 8)
    assert (full == 1.0).all()           # full-canvas rect has no inner edges


def test_region_mult_map_mask_resize():
    mask = np.zeros((32, 32), np.float32)
    mask[:, 16:] = 1.0
    m = _region_mult_map({"mask": mask, "mask_strength": 0.5}, 4, 4)
    assert m.shape == (4, 4)
    assert m[0, 0] == 0.0 and abs(m[0, 3] - 0.5) < 1e-6


def test_zero_strength_region_is_identity(engine):
    base = process_images(engine, _p()).images[0]
    p = _p(regional_prompts=[{"prompt": "a dragon", "weight": 0.0,
                              "area": (0.5, 0.0, 0.5, 1.0), "feather": 0}])
    out = process_images(engine, p).images[0]
    # ±1 LSB: the two runs compile different executables (branch vs plain
    # path) and the persistent compile cache may hold code generated on a
    # different host machine with different fma ordering; the blend math
    # itself is exact (test_masked_blend_math)
    diff = np.abs(out.astype(np.int32) - base.astype(np.int32))
    assert diff.max() <= 1


def test_masked_blend_math():
    """cfg-level check of the normalized mult blend: outside a region the
    prediction is exactly the base branch; inside, the weighted mix."""
    import jax.numpy as jnp

    from forge_tpu.sampling.cfg import make_cfg_model_fn

    def fake_apply(x, sigma, cond):
        # per-row constant prediction derived from the cond value
        lvl = jnp.mean(cond["c"], axis=(1, 2))  # [B]
        return jnp.ones_like(x) * lvl[:, None, None, None]

    cond = {"c": jnp.ones((1, 2, 4)) * 1.0}
    region = {"c": jnp.ones((1, 2, 4)) * 3.0}
    mask = np.zeros((4, 4, 1), np.float32)
    mask[:, 2:] = 1.0  # right half
    fn = make_cfg_model_fn(fake_apply, cond, None, jnp.float32(1.0),
                           cond_branches=[region], branch_weights=[1.0, 1.0],
                           branch_masks=[None, jnp.asarray(mask)])
    x = jnp.zeros((1, 4, 4, 2))
    out = np.asarray(fn(x, jnp.float32(1.0)))
    assert np.allclose(out[0, :, :2], 1.0)            # base only
    assert np.allclose(out[0, :, 2:], (1.0 + 3.0) / 2)  # equal-weight mix


def test_regional_prompt_changes_output(engine):
    base = process_images(engine, _p()).images[0]
    p = _p(regional_prompts=[{"prompt": "a dragon", "weight": 1.0,
                              "area": (0.5, 0.0, 0.5, 1.0), "feather": 0}])
    out = process_images(engine, p).images[0]
    assert not np.array_equal(out, base)


def test_regional_mask_spec(engine):
    mask = np.zeros((32, 32), np.float32)
    mask[16:, :] = 1.0
    p = _p(regional_prompts=[{"prompt": "the ocean", "mask": mask}])
    out = process_images(engine, p).images[0]
    assert out.shape == (32, 32, 3)
    base = process_images(engine, _p()).images[0]
    assert not np.array_equal(out, base)


def test_interrupt_poll_chunks(engine):
    """interrupt_poll_steps splits the loop into compiled segments; an
    interrupt raised by a preview callback between segments stops sampling
    early (single-step sampler => chunking is seam-free for Euler)."""
    from forge_tpu.runtime.options import opts
    from forge_tpu.runtime.state import state

    base = process_images(engine, _p(steps=4, sampler_name="Euler")).images[0]
    with opts.override({"interrupt_poll_steps": 2}):
        out = process_images(engine, _p(steps=4, sampler_name="Euler")).images[0]
    assert np.array_equal(out, base)  # chunked == unchunked for 1-step samplers
    # interrupting before the run yields an immediate stop between chunks
    with opts.override({"interrupt_poll_steps": 2}):
        state.interrupted = True
        try:
            early = process_images(engine, _p(steps=4, sampler_name="Euler")).images[0]
        finally:
            state.interrupted = False
    assert early.shape == base.shape
