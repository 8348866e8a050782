"""BLIP captioner port on a tiny synthetic checkpoint in the released key
space (visual_encoder.* ViT + text_decoder.bert.* cross-attn decoder)."""

import numpy as np

import jax.numpy as jnp

from forge_tpu.models.blip import (
    BlipCaptioner,
    WordPiece,
    blip_caption_ids,
    vit_encode,
)


def _lin(rng, o, i):
    return {"weight": (rng.standard_normal((o, i)) * (0.3 / np.sqrt(i))).astype(np.float32),
            "bias": np.zeros(o, np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of", "cat",
         "dog", "sky", "##s", "blue"]
SEP_ID = VOCAB.index("[SEP]")
VSIZE = len(VOCAB) + 1  # +1 for the [DEC] bos appended at id len(vocab)
BOS = len(VOCAB)


def make_tiny_blip(seed=0, dim=16, heads=2, depth=2, patch=8, img=32):
    rng = np.random.default_rng(seed)
    grid = img // patch
    vit = {
        "cls_token": (rng.standard_normal((1, 1, dim)) * 0.02).astype(np.float32),
        "pos_embed": (rng.standard_normal((1, grid * grid + 1, dim)) * 0.02).astype(np.float32),
        "patch_embed": {"proj": {
            "weight": (rng.standard_normal((patch, patch, 3, dim)) * 0.05).astype(np.float32),
            "bias": np.zeros(dim, np.float32)}},
        "norm": _ln(dim),
        "blocks": {},
    }
    for i in range(depth):
        vit["blocks"][str(i)] = {
            "norm1": _ln(dim), "norm2": _ln(dim),
            "attn": {"qkv": _lin(rng, 3 * dim, dim), "proj": _lin(rng, dim, dim)},
            "mlp": {"fc1": _lin(rng, 2 * dim, dim), "fc2": _lin(rng, dim, 2 * dim)},
        }

    def attn_block():
        return {"self": {"query": _lin(rng, dim, dim), "key": _lin(rng, dim, dim),
                         "value": _lin(rng, dim, dim)},
                "output": {"dense": _lin(rng, dim, dim), "LayerNorm": _ln(dim)}}

    layers = {}
    for i in range(depth):
        layers[str(i)] = {
            "attention": attn_block(),
            "crossattention": attn_block(),
            "intermediate": {"dense": _lin(rng, 2 * dim, dim)},
            "output": {"dense": _lin(rng, dim, 2 * dim), "LayerNorm": _ln(dim)},
        }
    dec = {
        "bert": {
            "embeddings": {
                "word_embeddings": {"weight": (rng.standard_normal((VSIZE, dim)) * 0.05).astype(np.float32)},
                "position_embeddings": {"weight": (rng.standard_normal((64, dim)) * 0.02).astype(np.float32)},
                "LayerNorm": _ln(dim),
            },
            "encoder": {"layer": layers},
        },
        "cls": {"predictions": {
            "transform": {"dense": _lin(rng, dim, dim), "LayerNorm": _ln(dim)},
            "decoder": _lin(rng, VSIZE, dim),
        }},
    }
    return {"visual_encoder": vit, "text_decoder": dec}


def test_vit_encode_shapes():
    p = make_tiny_blip()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32)
    out = vit_encode(p["visual_encoder"], x, heads=2)
    assert out.shape == (2, 17, 16)


def test_greedy_caption_deterministic():
    p = make_tiny_blip()
    img = jnp.asarray(np.random.default_rng(2).standard_normal((1, 32, 32, 3)), jnp.float32)
    prompt = np.asarray([BOS, 4, 5, 6], np.int32)  # [DEC] a picture of
    ids1 = blip_caption_ids(p, img, prompt, max_length=10, heads=2)
    ids2 = blip_caption_ids(p, img, prompt, max_length=10, heads=2)
    assert ids1.shape == (1, 10)
    assert np.array_equal(ids1, ids2)
    assert (ids1[0, :4] == prompt).all()


def test_wordpiece_roundtrip(tmp_path):
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(VOCAB) + "\n")
    wp = WordPiece(str(vp))
    ids = wp.encode("a picture of cats")
    assert ids == [4, 5, 6, 7, 10]  # cat + ##s
    assert wp.decode(ids + [SEP_ID, 0]) == "a picture of cats"


def test_captioner_end_to_end(tmp_path):
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(VOCAB) + "\n")
    cap = BlipCaptioner(model_dir=str(tmp_path))
    cap.params = make_tiny_blip()
    cap.wp = WordPiece(str(vp))
    # monkeypatch heads for the tiny dims
    import forge_tpu.models.blip as blip_mod

    img = (np.random.default_rng(3).uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8)
    prompt_ids = np.asarray([BOS] + cap.wp.encode("a picture of"), np.int32)
    from PIL import Image

    pil = Image.fromarray(img).resize((32, 32))
    x = (np.asarray(pil, np.float32) / 255.0 - cap.MEAN) / cap.STD
    ids = blip_caption_ids(cap.params, jnp.asarray(x[None]), prompt_ids,
                           max_length=12, heads=2)
    text = cap.wp.decode(ids[0][len(prompt_ids):])
    assert isinstance(text, str)
