"""BLIP image captioner (ViT-B/16 encoder + BERT decoder), pure JAX.

Re-implementation of the BLIP caption model the reference interrogator loads
(modules/interrogate.py:48-98 load_blip_model/generate_caption; upstream
salesforce BLIP blip_decoder = vit.py VisionTransformer + med.py BertLMHead
with cross-attention). Parameter tree = the released checkpoint keys nested
(visual_encoder.*, text_decoder.bert.*, text_decoder.cls.*).

Decoding is greedy (the reference calls generate(sample=False); beam search
reduces to greedy at num_beams=1) inside one compiled `lax.scan` over a
fixed-length token buffer — causal masking makes the grown-prefix recompute
exact, and static shapes keep XLA happy. WordPiece vocab loads from
`vocab.txt` beside the checkpoint (bert-base-uncased vocabulary; no network
in deployment).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn

_BOS = 30522       # BLIP [DEC] token appended to the BERT vocab
_SEP = 102         # BERT [SEP] ends the caption
_PAD = 0


# ---------------------------------------------------------------------------
# ViT encoder (BLIP vit.py — standard pre-norm ViT, joint qkv)


def _vit_block(p: Mapping[str, Any], x: jax.Array, heads: int) -> jax.Array:
    b, l, c = x.shape
    h = nn.layer_norm(x, p["norm1"])
    qkv = nn.linear(h, p["attn"]["qkv"]).reshape(b, l, 3, heads, c // heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jax.nn.softmax((q * (c // heads) ** -0.5) @ k.transpose(0, 1, 3, 2), axis=-1)
    h = (attn @ v).transpose(0, 2, 1, 3).reshape(b, l, c)
    x = x + nn.linear(h, p["attn"]["proj"])
    h = nn.layer_norm(x, p["norm2"])
    h = nn.linear(jax.nn.gelu(nn.linear(h, p["mlp"]["fc1"]), approximate=False),
                  p["mlp"]["fc2"])
    return x + h


def vit_encode(p: Mapping[str, Any], img: jax.Array, heads: int = 12) -> jax.Array:
    """img [B,H,W,3] (normalized) → visual tokens [B, 1+N, C]."""
    x = nn.conv2d(img, p["patch_embed"]["proj"], stride=int(p["patch_embed"]["proj"]["weight"].shape[0]))
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(p["cls_token"].reshape(1, 1, c), (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].reshape(1, -1, c)[:, : x.shape[1]]
    for i in range(len(p["blocks"])):
        x = _vit_block(p["blocks"][str(i)], x, heads)
    return nn.layer_norm(x, p["norm"])


# ---------------------------------------------------------------------------
# BERT decoder with cross-attention (BLIP med.py, is_decoder=True)


def _bert_attn(p: Mapping[str, Any], x, kv, heads, mask=None):
    b, lq, c = x.shape
    d = c // heads
    q = nn.linear(x, p["self"]["query"]).reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    k = nn.linear(kv, p["self"]["key"]).reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    v = nn.linear(kv, p["self"]["value"]).reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    s = (q * d ** -0.5) @ k.transpose(0, 1, 3, 2)
    if mask is not None:
        s = s + mask
    a = jax.nn.softmax(s, axis=-1)
    h = (a @ v).transpose(0, 2, 1, 3).reshape(b, lq, c)
    out = nn.linear(h, p["output"]["dense"])
    return nn.layer_norm(x + out, p["output"]["LayerNorm"])


def bert_decode_logits(p: Mapping[str, Any], tokens: jax.Array,
                       visual: jax.Array, heads: int = 12) -> jax.Array:
    """tokens [B,L] int32 (PAD-masked), visual [B,Lv,C] → logits [B,L,V]."""
    bert = p["bert"]
    emb = bert["embeddings"]
    b, l = tokens.shape
    x = jnp.take(emb["word_embeddings"]["weight"], tokens, axis=0)
    x = x + emb["position_embeddings"]["weight"][:l][None]
    x = nn.layer_norm(x, emb["LayerNorm"])
    causal = jnp.where(
        jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -1e9)[None, None]
    pad = jnp.where(tokens > 0, 0.0, -1e9)[:, None, None, :]
    mask = causal + pad
    for i in range(len(bert["encoder"]["layer"])):
        lp = bert["encoder"]["layer"][str(i)]
        x = _bert_attn(lp["attention"], x, x, heads, mask)
        if "crossattention" in lp:
            x = _bert_attn(lp["crossattention"], x, visual, heads)
        h = jax.nn.gelu(nn.linear(x, lp["intermediate"]["dense"]), approximate=False)
        h = nn.linear(h, lp["output"]["dense"])
        x = nn.layer_norm(x + h, lp["output"]["LayerNorm"])
    cls = p["cls"]["predictions"]
    h = nn.linear(x, cls["transform"]["dense"])
    h = jax.nn.gelu(h, approximate=False)
    h = nn.layer_norm(h, cls["transform"]["LayerNorm"])
    logits = nn.linear(h, cls["decoder"])
    # HF BERT ties cls.predictions.bias to decoder.bias — add only when the
    # decoder itself carried none (avoid double-adding the tied bias)
    if "bias" not in cls["decoder"] and "bias" in cls and not isinstance(cls["bias"], Mapping):
        logits = logits + cls["bias"]
    return logits


def blip_caption_ids(params: Mapping[str, Any], img: jax.Array,
                     prompt_ids: np.ndarray, max_length: int = 30,
                     heads: int = 12) -> np.ndarray:
    """Greedy caption token ids [B, max_length] (PAD after [SEP])."""
    visual = vit_encode(params["visual_encoder"], img, heads)
    b = img.shape[0]
    buf = np.full((b, max_length), _PAD, np.int32)
    buf[:, : len(prompt_ids)] = prompt_ids
    start = len(prompt_ids)

    def step(tokens, i):
        logits = bert_decode_logits(params["text_decoder"], tokens, visual, heads)
        nxt = jnp.argmax(logits[:, i - 1], axis=-1).astype(jnp.int32)
        # stop growing once [SEP] was emitted (stay PAD after)
        emitted = jnp.any(tokens == _SEP, axis=1)
        nxt = jnp.where(emitted, _PAD, nxt)
        return tokens.at[:, i].set(nxt), None

    tokens = jnp.asarray(buf)
    tokens, _ = jax.lax.scan(
        lambda t, i: step(t, i), tokens, jnp.arange(start, max_length))
    return np.asarray(tokens)


# ---------------------------------------------------------------------------
# WordPiece (bert-base-uncased vocab.txt beside the checkpoint)


class WordPiece:
    def __init__(self, vocab_path: str):
        with open(vocab_path, encoding="utf-8") as f:
            self.tokens = [ln.rstrip("\n") for ln in f]
        self.vocab = {t: i for i, t in enumerate(self.tokens)}

    def encode(self, text: str) -> List[int]:
        out = []
        for word in text.lower().split():
            chunk, start = [], 0
            while start < len(word):
                end = len(word)
                cur = None
                while start < end:
                    piece = word[start:end]
                    if start > 0:
                        piece = "##" + piece
                    if piece in self.vocab:
                        cur = self.vocab[piece]
                        break
                    end -= 1
                if cur is None:
                    chunk = [self.vocab.get("[UNK]", 100)]
                    break
                chunk.append(cur)
                start = end
            out.extend(chunk)
        return out

    def decode(self, ids) -> str:
        words: List[str] = []
        for i in ids:
            i = int(i)
            if i in (_PAD, _SEP) or i >= len(self.tokens):
                continue
            t = self.tokens[i]
            if t.startswith("##") and words:
                words[-1] += t[2:]
            elif not (t.startswith("[") and t.endswith("]")):
                words.append(t)
        return " ".join(words)


class BlipCaptioner:
    """Loader + caption API (reference InterrogateModels.generate_caption).
    Needs `model_base_caption*.pth|safetensors` + `vocab.txt` under
    models/BLIP."""

    MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, model_dir: str = "models/BLIP"):
        self.model_dir = model_dir
        self.params: Optional[Dict[str, Any]] = None
        self.wp: Optional[WordPiece] = None

    @property
    def available(self) -> bool:
        try:
            self.load()
            return self.params is not None and self.wp is not None
        except Exception:
            return False

    def load(self):
        if self.params is not None:
            return
        if not os.path.isdir(self.model_dir):
            return
        vocab = os.path.join(self.model_dir, "vocab.txt")
        ckpts = [f for f in sorted(os.listdir(self.model_dir))
                 if f.endswith((".pth", ".pt", ".safetensors"))]
        if not ckpts or not os.path.exists(vocab):
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, ckpts[0]))
        sd = sd.get("model", sd) if isinstance(sd.get("model"), dict) else sd
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self.wp = WordPiece(vocab)

    def caption(self, image: np.ndarray, prompt: str = "a picture of",
                max_length: int = 30) -> str:
        self.load()
        if self.params is None or self.wp is None:
            raise RuntimeError(f"no BLIP checkpoint+vocab under {self.model_dir}")
        from PIL import Image

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img * (255 if img.max() <= 1.5 else 1), 0, 255).astype(np.uint8)
        pil = Image.fromarray(img).convert("RGB").resize((384, 384), Image.BICUBIC)
        x = (np.asarray(pil, np.float32) / 255.0 - self.MEAN) / self.STD
        prompt_ids = np.asarray([_BOS] + self.wp.encode(prompt), np.int32)
        ids = blip_caption_ids(self.params, jnp.asarray(x[None]), prompt_ids,
                               max_length=max_length)
        return self.wp.decode(ids[0][len(prompt_ids):])


_CAPTIONER: Optional[BlipCaptioner] = None


def get_blip() -> BlipCaptioner:
    global _CAPTIONER
    if _CAPTIONER is None:
        _CAPTIONER = BlipCaptioner()
    return _CAPTIONER
