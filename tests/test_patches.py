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


def test_glora_merge():
    """glora: ΔW = (W·a1·a2 + b1·b2)·α/r (new format)."""
    r = np.random.default_rng(3)
    w = r.standard_normal((8, 8)).astype(np.float32)
    params = nest({"blk.to_q.weight": jnp.asarray(w)})
    rank = 2
    a1 = r.standard_normal((8, rank)).astype(np.float32)
    a2 = r.standard_normal((rank, 8)).astype(np.float32)
    b1 = r.standard_normal((8, rank)).astype(np.float32)
    b2 = r.standard_normal((rank, 8)).astype(np.float32)
    sd = {
        "lora_unet_blk_to_q.a1.weight": a1,
        "lora_unet_blk_to_q.a2.weight": a2,
        "lora_unet_blk_to_q.b1.weight": b1,
        "lora_unet_blk_to_q.b2.weight": b2,
        "lora_unet_blk_to_q.alpha": np.asarray(rank, np.float32),
    }
    matched, unmatched = match_lora(sd, flatten(params).keys())
    assert not unmatched
    out = apply_patches(params, [(matched["unet"], 0.7)])
    got = np.asarray(get_path(out, "blk.to_q.weight"))
    want = w + 0.7 * (w @ a1 @ a2 + b1 @ b2)  # alpha/rank == 1
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_online_lora_on_quantized_matches_offline():
    """Quantized leaf + LoRA: the online epilogue must equal dequantize →
    offline merge → matmul (within bf16 epilogue tolerance); and the packed
    codes must be untouched (VERDICT r1 item #3)."""
    from forge_tpu.ops import quant
    from forge_tpu.ops.dequant_matmul import linear_quantized, prepare_for_kernel

    r = np.random.default_rng(4)
    w = (r.standard_normal((128, 512)) * 0.2).astype(np.float32)
    q = quant.QuantTensor.from_dict(prepare_for_kernel(quant.quantize(w, "nf4")))
    params = nest({"blk.to_q.weight": q})

    rank = 4
    up = r.standard_normal((128, rank)).astype(np.float32) * 0.1
    down = r.standard_normal((rank, 512)).astype(np.float32) * 0.1
    sd = {
        "lora_unet_blk_to_q.lora_up.weight": up,
        "lora_unet_blk_to_q.lora_down.weight": down,
        "lora_unet_blk_to_q.alpha": np.asarray(rank, np.float32),
    }
    matched, unmatched = match_lora(sd, flatten(params).keys())
    assert not unmatched
    out = apply_patches(params, [(matched["unet"], 0.8)])
    leaf = get_path(out, "blk.to_q.weight")
    assert leaf.lora_down is not None and leaf.lora_up is not None
    # codes untouched, original leaf unmodified (COW)
    assert leaf.codes is q.codes
    assert q.lora_down is None

    x = r.standard_normal((3, 512)).astype(np.float32)
    got = np.asarray(linear_quantized(jnp.asarray(x), leaf, interpret=True))

    w_deq = np.asarray(quant.dequantize(q, jnp.float32))
    merged = w_deq + 0.8 * (up @ down)  # alpha/rank == 1
    want = x @ merged.T
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_online_lora_quantized_e2e_no_skip(capsys):
    """A quantized tree with a LoRA produces a changed matmul result and no
    'skipping quantized weight' notice."""
    from forge_tpu.ops import quant
    from forge_tpu.ops.dequant_matmul import linear_quantized

    r = np.random.default_rng(5)
    w = (r.standard_normal((64, 64)) * 0.2).astype(np.float32)
    q = quant.QuantTensor.from_dict(quant.quantize(w, "q8_0"))
    params = nest({"blk.ff.net.0.proj.weight": q})
    sd = {
        "lora_unet_blk_ff_net_0_proj.lora_up.weight": r.standard_normal((64, 2)).astype(np.float32),
        "lora_unet_blk_ff_net_0_proj.lora_down.weight": r.standard_normal((2, 64)).astype(np.float32),
    }
    matched, _ = match_lora(sd, flatten(params).keys())
    out = apply_patches(params, [(matched["unet"], 1.0)])
    assert "skipping quantized" not in capsys.readouterr().out
    x = jnp.asarray(r.standard_normal((2, 64)).astype(np.float32))
    base = np.asarray(linear_quantized(x, q))
    patched = np.asarray(linear_quantized(x, get_path(out, "blk.ff.net.0.proj.weight")))
    assert np.abs(base - patched).max() > 1e-3


def test_diffusers_unet_to_ldm_bijection():
    """diffusers UNet2DConditionModel keys → ldm keys on the tiny fixture
    geometry: every fixture key is produced, with the same value objects
    (the mapping IC-Light offsets and diffusers-format checkpoints need)."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from fixtures import make_unet_sd
    from forge_tpu.core.state_dict import diffusers_unet_to_ldm

    ldm = make_unet_sd(prefix="")
    res_inv = {"in_layers.0": "norm1", "in_layers.2": "conv1",
               "emb_layers.1": "time_emb_proj", "out_layers.0": "norm2",
               "out_layers.3": "conv2", "skip_connection": "conv_shortcut"}
    block_inv = {
        "input_blocks.0.0": "conv_in",
        "time_embed.0": "time_embedding.linear_1",
        "time_embed.2": "time_embedding.linear_2",
        "input_blocks.1.0": "down_blocks.0.resnets.0",
        "input_blocks.1.1": "down_blocks.0.attentions.0",
        "input_blocks.2.0.op": "down_blocks.0.downsamplers.0.conv",
        "input_blocks.3.0": "down_blocks.1.resnets.0",
        "middle_block.0": "mid_block.resnets.0",
        "middle_block.1": "mid_block.attentions.0",
        "middle_block.2": "mid_block.resnets.1",
        "output_blocks.0.0": "up_blocks.0.resnets.0",
        "output_blocks.1.0": "up_blocks.0.resnets.1",
        "output_blocks.1.1.conv": "up_blocks.0.upsamplers.0.conv",
        "output_blocks.2.0": "up_blocks.1.resnets.0",
        "output_blocks.2.1": "up_blocks.1.attentions.0",
        "output_blocks.3.0": "up_blocks.1.resnets.1",
        "output_blocks.3.1": "up_blocks.1.attentions.1",
        "out.0": "conv_norm_out",
        "out.2": "conv_out",
    }

    def to_diffusers_key(k):
        for pre, sub in sorted(block_inv.items(), key=lambda x: -len(x[0])):
            if k.startswith(pre + "."):
                tail = k[len(pre) + 1:]
                for lpre, lsub in res_inv.items():
                    if tail.startswith(lpre):
                        tail = lsub + tail[len(lpre):]
                        break
                return sub + "." + tail
        raise AssertionError(f"unmapped fixture key {k}")

    dsd = {to_diffusers_key(k): v for k, v in ldm.items()}
    back = diffusers_unet_to_ldm(dsd)
    assert set(back) == set(ldm)
    for k in ldm:
        assert back[k] is ldm[k], k
