"""LoRA patch engine tests: key matching, merge math vs direct computation,
strength scaling, COW semantics."""

import numpy as np

import jax.numpy as jnp

from forge_tpu.core.patches import apply_patches, match_lora
from forge_tpu.core.tree import flatten, get_path, nest


def _model():
    flat = {
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": jnp.zeros((8, 8)),
        "input_blocks.1.1.transformer_blocks.0.attn1.to_k.weight": jnp.zeros((8, 8)),
        "out.2.weight": jnp.zeros((3, 3, 8, 4)),  # HWIO conv
    }
    return nest(flat)


def _lora_sd(rank=2):
    r = np.random.default_rng(0)
    return {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight":
            r.standard_normal((8, rank)).astype(np.float32),
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight":
            r.standard_normal((rank, 8)).astype(np.float32),
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.alpha":
            np.asarray(rank, np.float32),
    }


def test_match_lora_keys():
    params = _model()
    sd = _lora_sd()
    matched, unmatched = match_lora(sd, flatten(params).keys())
    assert not unmatched
    assert list(matched["unet"].keys()) == [
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
    ]


def test_lora_merge_math():
    params = _model()
    sd = _lora_sd(rank=2)
    matched, _ = match_lora(sd, flatten(params).keys())
    out = apply_patches(params, [(matched["unet"], 0.5)])

    up = sd["lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight"]
    down = sd["lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight"]
    expected = 0.5 * (up @ down) * (2.0 / 2)  # alpha/rank = 1
    got = np.asarray(get_path(out, "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"))
    assert np.allclose(got, expected, atol=1e-6)

    # untouched leaves are the same objects (copy-on-write)
    assert get_path(out, "out.2.weight") is get_path(params, "out.2.weight")
    # original tree unmodified
    assert np.allclose(
        np.asarray(get_path(params, "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight")), 0
    )


def test_lora_strength_zero_noop():
    params = _model()
    matched, _ = match_lora(_lora_sd(), flatten(params).keys())
    out = apply_patches(params, [(matched["unet"], 0.0)])
    got = np.asarray(get_path(out, "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"))
    assert np.allclose(got, 0)


def test_lora_stacking():
    params = _model()
    matched, _ = match_lora(_lora_sd(), flatten(params).keys())
    one = apply_patches(params, [(matched["unet"], 1.0)])
    two = apply_patches(params, [(matched["unet"], 0.5), (matched["unet"], 0.5)])
    k = "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
    assert np.allclose(np.asarray(get_path(one, k)), np.asarray(get_path(two, k)), atol=1e-6)
