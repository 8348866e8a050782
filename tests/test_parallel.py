"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (conftest).

Covers VERDICT r1 item #1: dp-sharded pipeline output must equal the
single-device output per seed; tp-sharded UNet must match the replicated
UNet numerically; and the tp-compiled HLO must actually contain an ICI
collective (proof XLA partitioned the matmuls rather than replicating).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fixtures import CLIP_WIDTH, CTX, make_tiny_engine
from forge_tpu.parallel import mesh as mesh_mod


def _gen(eng, batch, seed=7):
    from forge_tpu.pipeline.processing import Processing, process_images

    p = Processing(prompt="a photo of a cat", seed=seed, steps=3,
                   width=32, height=32, batch_size=batch,
                   sampler_name="Euler", cfg_scale=7.0)
    return process_images(eng, p)


def test_make_mesh_shapes():
    mesh = mesh_mod.make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = mesh_mod.make_mesh(tp=2)  # dp inferred from device count
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(AssertionError):
        mesh_mod.make_mesh(dp=3, tp=2)


def test_dp_pipeline_matches_single_device():
    ref = _gen(make_tiny_engine(), batch=4)

    eng = make_tiny_engine()
    eng.attach_mesh(mesh_mod.make_mesh(dp=4, tp=2))
    got = _gen(eng, batch=4)

    assert len(got.images) == len(ref.images) == 4
    for a, b in zip(ref.images, got.images):
        # uint8 decode: identical math module reshard rounding; allow ±1 LSB
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, f"dp-sharded image diverged: max diff {diff.max()}"


def test_tp_unet_matches_replicated():
    eng_ref = make_tiny_engine()
    ref = _gen(eng_ref, batch=2)

    eng = make_tiny_engine()
    eng.attach_mesh(mesh_mod.make_mesh(dp=4, tp=2), tensor_parallel=True)
    got = _gen(eng, batch=2)

    for a, b in zip(ref.images, got.images):
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, f"tp-sharded image diverged: max diff {diff.max()}"


def test_tp_param_specs():
    """qkv/ff-in shard out-dim, attn-out/ff-out shard in-dim, rest replicated."""
    w = np.zeros((64, 32), np.float32)
    assert mesh_mod._unet_param_spec(".to_q.weight", w) == P("tp", None)
    assert mesh_mod._unet_param_spec(".ff.net.0.proj.weight", w) == P("tp", None)
    assert mesh_mod._unet_param_spec(".to_out.0.weight", w) == P(None, "tp")
    assert mesh_mod._unet_param_spec(".ff.net.2.weight", w) == P(None, "tp")
    assert mesh_mod._unet_param_spec(".norm1.weight", np.zeros(32)) == P()


def test_tp_hlo_contains_collective():
    """Compile the UNet with tp-sharded params and assert XLA inserted a
    cross-device collective (all-reduce / reduce-scatter / all-gather)."""
    from forge_tpu.core.state_dict import transform_for_jax
    from forge_tpu.core.tree import nest
    from forge_tpu.models.unet import UNetConfig, unet_apply
    from fixtures import make_unet_sd

    mesh = mesh_mod.make_mesh(dp=4, tp=2)
    params = nest(transform_for_jax(make_unet_sd(prefix="")))
    params = mesh_mod.shard_unet_params(params, mesh)
    cfg = UNetConfig(context_dim=CTX, num_heads=4)

    x = jax.device_put(jnp.ones((8, 8, 8, 4), jnp.float32),
                       NamedSharding(mesh, P("dp")))
    t = jnp.zeros((8,), jnp.float32)
    ctx = jax.device_put(jnp.ones((8, 77, CTX), jnp.float32),
                         NamedSharding(mesh, P("dp")))

    fn = jax.jit(lambda p, x, t, c: unet_apply(p, x, t, c, cfg=cfg))
    compiled = fn.lower(params, x, t, ctx).compile()
    hlo = compiled.as_text()
    assert re.search(r"all-reduce|reduce-scatter|all-gather", hlo), \
        "tp-sharded UNet compiled without any collective — not actually partitioned"

    out = fn(params, x, t, ctx)
    assert np.isfinite(np.asarray(out)).all()

    # and the tp math matches the unsharded UNet
    params_rep = nest(transform_for_jax(make_unet_sd(prefix="")))
    ref = jax.jit(lambda p, x, t, c: unet_apply(p, x, t, c, cfg=cfg))(
        params_rep, jnp.ones((8, 8, 8, 4), jnp.float32), t,
        jnp.ones((8, 77, CTX), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_dp_batch_sharding_layout():
    mesh = mesh_mod.make_mesh(dp=8, tp=1)
    x = jax.device_put(jnp.zeros((8, 4, 4, 4)), mesh_mod.batch_sharding(mesh))
    assert len(x.sharding.device_set) == 8
    # each device holds exactly one batch row
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 4)}


def test_tp_flux_matches_replicated():
    """tp-sharded Flux (the model family that actually needs tensor
    parallelism at 12B) ≡ replicated, through the full pipeline."""
    import sys

    sys.path.insert(0, "tests")
    from test_flux_pipeline import _tiny_flux_checkpoint

    import jax.numpy as jnp

    from forge_tpu.models.flux import FluxConfig
    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    def make():
        eng = load_engine(_tiny_flux_checkpoint(), dtype=jnp.float32)
        eng.flux_cfg = FluxConfig(num_heads=4, axes_dim=(4, 6, 6), guidance_embed=True)
        return eng

    def gen(eng):
        return process_images(eng, Processing(
            prompt="a red fox", seed=5, steps=2, width=32, height=32,
            cfg_scale=1.0, sampler_name="Euler", scheduler="simple"))

    ref = gen(make())
    eng = make()
    eng.attach_mesh(mesh_mod.make_mesh(dp=2, tp=4), tensor_parallel=True)
    got = gen(eng)
    for a, b in zip(ref.images, got.images):
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, f"tp-sharded flux diverged: max diff {diff.max()}"


def test_tp_flux_param_specs():
    w = np.zeros((64, 32), np.float32)
    assert mesh_mod._unet_param_spec("double_blocks.0.img_attn.qkv.weight", w) == P("tp", None)
    assert mesh_mod._unet_param_spec("single_blocks.3.linear2.weight", w) == P(None, "tp")
    assert mesh_mod._unet_param_spec("joint_blocks.1.x_block.attn.qkv.weight", w) == P("tp", None)
    assert mesh_mod._unet_param_spec("joint_blocks.1.x_block.mlp.fc2.weight", w) == P(None, "tp")
