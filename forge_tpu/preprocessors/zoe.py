"""ZoeDepth metric-depth preprocessor (ZoeD_M12_N) in JAX.

Re-implementation of the published ZoeDepth-N architecture the reference's
zoe annotator loads (extensions-builtin/forge_legacy_preprocessors/annotator/
zoe/__init__.py, zoedepth/models/zoedepth/zoedepth_v1.py): a MiDaS 3.1
DPT-BEiT-L/384 relative-depth core whose decoder taps feed a metric-bins
head — seed bin regressor (softplus), per-level inverse-attractor refinement
(n_attractors 16/8/4/1, alpha 1000, gamma 2, kind mean — config_zoedepth.json),
and a conditional log-binomial output distribution over 64 bins.

Everything is shape-derived from the checkpoint (block count, width, heads,
tap features, bin counts), so the BEiT-Base variant loads too. The BEiT
relative-position bias (per-block table + cls entries, bilinear table resize
for non-trained window sizes — midas/backbones/beit.py:_get_rel_pos_bias) is
reproduced exactly; position indices are numpy constants per window.

Inference mirrors the reference stack: reflection pad augmentation
(zoedepth/models/depth_model.py:_infer_with_pad_aug, pad = sqrt(side/2)*3),
horizontal-flip averaging, keep-aspect multiple-of-32 resize to the 384x512
net size ("minimal" mode, midas.py Resize), and the annotator's 2%/85%
percentile normalization + inversion (annotator/zoe/__init__.py:51-57).
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from .depth_anything import _resize_align


# ---------------------------------------------------------------- backbone

def _gen_rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """timm gen_relative_position_index: [(N+1),(N+1)] table lookups where
    the last 3 table rows serve the cls-token interactions."""
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))          # [2, wh, ww]
    flat = coords.reshape(2, -1)                            # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]               # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)           # [N, N, 2]
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return idx


def _rel_pos_bias(p_attn: Mapping[str, Any], window: Tuple[int, int]) -> jax.Array:
    """Per-block relative position bias [heads, N+1, N+1] for an arbitrary
    window, resizing the trained table bilinearly when the window differs
    (midas beit.py:_get_rel_pos_bias — including its width-major reshape)."""
    table = p_attn["relative_position_bias_table"]  # [(2s-1)^2+3, heads]
    rows, heads = table.shape
    side = int((np.sqrt(rows - 3) + 1) / 2)
    wh, ww = window
    new_h, new_w = 2 * wh - 1, 2 * ww - 1
    sub, extra = table[: rows - 3], table[rows - 3:]
    if (new_h, new_w) != (2 * side - 1, 2 * side - 1):
        # the reference reshapes width-major then resizes to (height, width);
        # reproduced verbatim so non-square windows match bit-for-bit
        grid = sub.reshape(2 * side - 1, 2 * side - 1, heads)
        grid = jax.image.resize(grid, (new_h, new_w, heads), "bilinear")
        sub = grid.reshape(new_h * new_w, heads)
    full = jnp.concatenate([sub, extra], axis=0)
    idx = _gen_rel_pos_index(wh, ww)
    bias = full[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], heads)
    return bias.transpose(2, 0, 1)


def _beit_block(p: Mapping[str, Any], x: jax.Array, bias: jax.Array,
                heads: int) -> jax.Array:
    b, n, c = x.shape
    h = nn.layer_norm(x, p["norm1"], eps=1e-6)
    qb = p["attn"]["q_bias"]
    qkv_bias = jnp.concatenate([qb, jnp.zeros_like(qb), p["attn"]["v_bias"]])
    qkv = jnp.einsum("bnc,oc->bno", h, p["attn"]["qkv"]["weight"]) + qkv_bias
    qkv = qkv.reshape(b, n, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = (q * (c // heads) ** -0.5) @ k.transpose(0, 1, 3, 2) + bias[None]
    att = jax.nn.softmax(att, axis=-1)
    h = (att @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
    x = x + p["gamma_1"] * nn.linear(h, p["attn"]["proj"])
    h = nn.layer_norm(x, p["norm2"], eps=1e-6)
    h = nn.linear(jax.nn.gelu(nn.linear(h, p["mlp"]["fc1"]), approximate=False),
                  p["mlp"]["fc2"])
    return x + p["gamma_2"] * h


def _project_readout(pp: Mapping[str, Any], tokens: jax.Array,
                     gh: int, gw: int) -> jax.Array:
    """DPT ProjectReadout + unflatten: [B,1+N,C] → [B,gh,gw,C]."""
    cls, patches = tokens[:, :1], tokens[:, 1:]
    cat = jnp.concatenate(
        [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
    h = jax.nn.gelu(nn.linear(cat, pp["0"]["project"]["0"]),
                    approximate=False)
    b = h.shape[0]
    return h.reshape(b, gh, gw, h.shape[-1])


def _rcu(p: Mapping[str, Any], x: jax.Array) -> jax.Array:
    h = nn.conv2d(jax.nn.relu(x), p["conv1"], padding=1)
    h = nn.conv2d(jax.nn.relu(h), p["conv2"], padding=1)
    return x + h


def _fusion(p: Mapping[str, Any], x: jax.Array, skip: Optional[jax.Array],
            size: Tuple[int, int]) -> jax.Array:
    """FeatureFusionBlock_custom with explicit output size (midas 3.1
    blocks.py:410-436, align_corners=True)."""
    if skip is not None:
        x = x + _rcu(p["resConfUnit1"], skip)
    x = _rcu(p["resConfUnit2"], x)
    x = _resize_align(x, size)
    return nn.conv2d(x, p["out_conv"])


def _dpt_beit(p: Mapping[str, Any], x: jax.Array):
    """DPT-BEiT core → (rel_depth [B,H,W], taps) with the MidasCore tap set
    ('out_conv', 'l4_rn', 'r4', 'r3', 'r2', 'r1' — zoe midas.py:191)."""
    pm = p["pretrained"]["model"]
    patch = pm["patch_embed"]["proj"]["weight"].shape[0]
    emb = nn.conv2d(x, pm["patch_embed"]["proj"], stride=patch)
    b, gh, gw, c = emb.shape
    heads = pm["blocks"]["0"]["attn"]["relative_position_bias_table"].shape[1]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(pm["cls_token"][0], (b, 1, c)),
         emb.reshape(b, gh * gw, c)], axis=1)

    n_blocks = len(pm["blocks"])
    hooks = [n_blocks // 4 - 1, n_blocks // 2 - 1,
             3 * n_blocks // 4 - 1, n_blocks - 1]
    acts = []
    for i in range(n_blocks):
        blk = pm["blocks"][str(i)]
        bias = _rel_pos_bias(blk["attn"], (gh, gw))
        tokens = _beit_block(blk, tokens, bias, heads)
        if i in hooks:
            acts.append(tokens)

    post = p["pretrained"]
    l1 = _project_readout(post["act_postprocess1"], acts[0], gh, gw)
    l1 = nn.conv2d(l1, post["act_postprocess1"]["3"])
    l1 = nn.conv2d_transpose(l1, post["act_postprocess1"]["4"], stride=4)
    l2 = _project_readout(post["act_postprocess2"], acts[1], gh, gw)
    l2 = nn.conv2d(l2, post["act_postprocess2"]["3"])
    l2 = nn.conv2d_transpose(l2, post["act_postprocess2"]["4"], stride=2)
    l3 = _project_readout(post["act_postprocess3"], acts[2], gh, gw)
    l3 = nn.conv2d(l3, post["act_postprocess3"]["3"])
    l4 = _project_readout(post["act_postprocess4"], acts[3], gh, gw)
    l4 = nn.conv2d(l4, post["act_postprocess4"]["3"])
    l4 = nn.conv2d(l4, post["act_postprocess4"]["4"], stride=2, padding=1)

    sc = p["scratch"]
    rn1 = nn.conv2d(l1, sc["layer1_rn"], padding=1)
    rn2 = nn.conv2d(l2, sc["layer2_rn"], padding=1)
    rn3 = nn.conv2d(l3, sc["layer3_rn"], padding=1)
    rn4 = nn.conv2d(l4, sc["layer4_rn"], padding=1)

    r4 = _fusion(sc["refinenet4"], rn4, None, rn3.shape[1:3])
    r3 = _fusion(sc["refinenet3"], r4, rn3, rn2.shape[1:3])
    r2 = _fusion(sc["refinenet2"], r3, rn2, rn1.shape[1:3])
    r1 = _fusion(sc["refinenet1"], r2, rn1,
                 (rn1.shape[1] * 2, rn1.shape[2] * 2))

    out = sc["output_conv"]
    h = nn.conv2d(r1, out["0"], padding=1)
    h = _resize_align(h, (h.shape[1] * 2, h.shape[2] * 2))
    out_conv_act = jax.nn.relu(nn.conv2d(h, out["2"], padding=1))
    rel = jax.nn.relu(nn.conv2d(out_conv_act, out["4"]))[..., 0]
    return rel, {"out_conv": out_conv_act, "l4_rn": rn4,
                 "r4": r4, "r3": r3, "r2": r2, "r1": r1}


# ------------------------------------------------------------- metric head

def _mlp2(pp: Mapping[str, Any], x: jax.Array) -> jax.Array:
    """conv1x1 → relu → conv1x1 (the shared _net shape of the head layers)."""
    return nn.conv2d(jax.nn.relu(nn.conv2d(x, pp["0"])), pp["2"])


def _log_binomial(p: jax.Array, t: jax.Array, k: int) -> jax.Array:
    """LogBinomial (dist_layers.py:9-37): softmax over k classes of the
    binomial log-pmf with Stirling log-nCk, temperature t.

    The Stirling term is a length-k compile-time constant, so it is computed
    host-side in numpy float32 (bit-identical to the reference's eager torch
    math). Tracing it instead lets XLA reassociate (n - kk) + 1e-7 — both n
    and kk carry +1e-7, the epsilons cancel, and the last bin becomes
    0 * log(0) = NaN under jit while eager stays finite."""
    eps = 1e-4
    k_np = np.arange(k, dtype=np.float32)
    n = np.float32(k - 1) + np.float32(1e-7)
    kk = k_np + np.float32(1e-7)
    log_binom = jnp.asarray(
        n * np.log(n) - kk * np.log(kk)
        - (n - kk) * np.log(n - kk + np.float32(1e-7)))[None, None, None, :]
    k_idx = jnp.arange(k, dtype=jnp.float32)[None, None, None, :]
    one_minus = jnp.clip(1.0 - p, eps, 1.0)
    p = jnp.clip(p, eps, 1.0)
    y = log_binom + k_idx * jnp.log(p) + (k - 1 - k_idx) * jnp.log(one_minus)
    return jax.nn.softmax(y / t, axis=-1)


def zoe_apply(params: Mapping[str, Any], x: jax.Array,
              alpha: float = 300.0, gamma: int = 2,
              min_temp: float = 0.0212, max_temp: float = 50.0) -> jax.Array:
    """Normalized image [B,H,W,3] (mean/std 0.5, H,W % 32 == 0) → metric
    depth [B,H,W]. Constants = config_zoedepth.json (inv attractor, mean
    aggregation, softplus bin centers) — EXCEPT alpha: the config says 1000,
    but the reference's AttractorLayer*.forward never forwards self.alpha to
    the jit-scripted inv_attractor (attractor.py:196-199 calls dist(dx) with
    no args), so the torch.jit default alpha=300 is what the published
    checkpoint was trained with; reproduced bit-for-bit here."""
    core = params["core"]["core"]
    rel_depth, taps = _dpt_beit(core, x)
    return zoe_head(params, rel_depth, taps, alpha=alpha, gamma=gamma,
                    min_temp=min_temp, max_temp=max_temp)


def zoe_head(params: Mapping[str, Any], rel_depth: jax.Array,
             taps: Mapping[str, jax.Array], alpha: float = 300.0,
             gamma: int = 2, min_temp: float = 0.0212,
             max_temp: float = 50.0) -> jax.Array:
    """Metric-bins head over the MidasCore taps (zoedepth_v1.py:124-198)."""
    xd0 = nn.conv2d(taps["l4_rn"], params["conv2"])
    b_prev = jax.nn.softplus(_mlp2(params["seed_bin_regressor"]["_net"], xd0))
    prev_emb = _mlp2(params["seed_projector"]["_net"], xd0)

    emb = prev_emb
    for i, tap in enumerate([taps["r4"], taps["r3"], taps["r2"], taps["r1"]]):
        emb = _mlp2(params["projectors"][str(i)]["_net"], tap)
        h = emb + _resize_align(prev_emb, tap.shape[1:3])
        attr = jax.nn.softplus(
            _mlp2(params["attractors"][str(i)]["_net"], h))  # [B,h,w,nA]
        centers = _resize_align(b_prev, tap.shape[1:3])      # [B,h,w,nbins]
        dx = attr[..., :, None] - centers[..., None, :]      # [B,h,w,nA,nbins]
        delta = jnp.mean(dx / (1.0 + alpha * dx ** gamma), axis=-2)
        b_prev = centers + delta
        prev_emb = emb

    last = jnp.concatenate(
        [taps["out_conv"],
         _resize_align(rel_depth[..., None], taps["out_conv"].shape[1:3])],
        axis=-1)
    cond = _resize_align(emb, last.shape[1:3])
    mlp = params["conditional_log_binomial"]["mlp"]
    pt = nn.conv2d(jnp.concatenate([last, cond], axis=-1), mlp["0"])
    pt = jax.nn.softplus(nn.conv2d(jax.nn.gelu(pt, approximate=False),
                                   mlp["2"]))
    p_eps = 1e-4
    pp = pt[..., :2] + p_eps
    prob = pp[..., 0] / (pp[..., 0] + pp[..., 1])
    tt = pt[..., 2:] + p_eps
    temp = tt[..., 0] / (tt[..., 0] + tt[..., 1])
    temp = (max_temp - min_temp) * temp + min_temp

    n_bins = b_prev.shape[-1]
    probs = _log_binomial(prob[..., None], temp[..., None], n_bins)
    centers = _resize_align(b_prev, probs.shape[1:3])
    return jnp.sum(probs * centers, axis=-1)


# ---------------------------------------------------------------- detector

def _net_size(h: int, w: int, net_h: int = 384, net_w: int = 512) -> Tuple[int, int]:
    """Keep-aspect multiple-of-32 'minimal' resize target (midas.py Resize):
    scale so the output covers the net size, then round to /32."""
    scale = max(net_h / h, net_w / w)
    return (max(32, int(round(h * scale / 32)) * 32),
            max(32, int(round(w * scale / 32)) * 32))


class ZoeDetector:
    """Reference annotator/zoe/__init__.py behavior on the JAX model."""

    def __init__(self, model_dir: str = "models/zoedepth",
                 net_h: int = 384, net_w: int = 512):
        self.model_dir = model_dir
        self.net_h, self.net_w = net_h, net_w
        self.params = None
        self._jit = None

    def available(self) -> bool:
        return self.params is not None or bool(self._candidates())

    def _candidates(self):
        if not os.path.isdir(self.model_dir):
            return []
        return [f for f in sorted(os.listdir(self.model_dir))
                if f.endswith((".pt", ".safetensors"))]

    def load(self):
        if self.params is not None:
            return
        cands = self._candidates()
        if not cands:
            return
        from ..core.state_dict import load_state_dict, transform_for_jax
        from ..core.tree import nest

        sd = load_state_dict(os.path.join(self.model_dir, cands[0]))
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
        sd = {k: v for k, v in sd.items()
              if "relative_position_index" not in k and "attn.k_bias" not in k}
        self.params = nest({k: jnp.asarray(v)
                            for k, v in transform_for_jax(sd).items()})
        self._jit = jax.jit(lambda t: zoe_apply(self.params, t))

    def detect(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H,W,3] → inverted percentile-normalized depth uint8 [H,W,3]."""
        import cv2

        self.load()
        if self.params is None:
            raise RuntimeError(f"no ZoeDepth checkpoint under {self.model_dir}")
        h, w = img.shape[:2]
        # pad augmentation on the input image (depth_model.py:_infer_with_pad_aug)
        pad_h = int(np.sqrt(h / 2) * 3)
        pad_w = int(np.sqrt(w / 2) * 3)
        padded = np.pad(img.astype(np.float32) / 255.0,
                        ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                        mode="reflect")
        ph, pw = padded.shape[:2]
        nh, nw = _net_size(ph, pw, self.net_h, self.net_w)
        feed = cv2.resize(padded, (nw, nh), interpolation=cv2.INTER_CUBIC)
        feed = (feed - 0.5) / 0.5
        # flip augmentation as a batch of 2 in one program (depth_model.py:79-85)
        batch = jnp.asarray(np.stack([feed, feed[:, ::-1]]))
        depth = np.asarray(self._jit(batch), np.float32)
        depth = 0.5 * (depth[0] + depth[1][:, ::-1])
        depth = cv2.resize(depth, (pw, ph), interpolation=cv2.INTER_CUBIC)
        depth = depth[pad_h:ph - pad_h, pad_w:pw - pad_w]
        # annotator normalization (zoe/__init__.py:51-57)
        vmin, vmax = np.percentile(depth, 2), np.percentile(depth, 85)
        depth = (depth - vmin) / max(vmax - vmin, 1e-6)
        out = ((1.0 - depth) * 255.0).clip(0, 255).astype(np.uint8)
        return np.repeat(out[..., None], 3, axis=2)


_DETECTOR: Optional[ZoeDetector] = None


def get_zoe() -> ZoeDetector:
    global _DETECTOR
    if _DETECTOR is None:
        _DETECTOR = ZoeDetector()
    return _DETECTOR


def _depth_zoe(img, res, a, b):
    from .cv import resize_image

    out = get_zoe().detect(resize_image(img, res))
    return np.asarray(out, np.float32) / 255.0


def _register():
    from . import Preprocessor, register

    register(Preprocessor("depth_zoe", _depth_zoe, tags=("Depth",),
                          needs_weights=True),
             aliases=("depth_zoe (ZoeDepth)",))


_register()
