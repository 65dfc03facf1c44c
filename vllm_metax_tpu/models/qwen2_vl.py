"""Qwen2-VL: vision transformer + Qwen2 text model with multimodal rope.

Reference parity target: vllm_metax/models/qwen2_vl.py (the reference forks
the upstream vLLM model and forces the MACA flash_attn varlen kernel for the
ViT, qwen2_vl.py:360-365) and the HF implementation for the math.

TPU-native design decisions:
- The ViT runs as its OWN jitted program once per request at admission —
  dense block-diagonal attention over the patch sequence (one big MXU
  matmul per layer; segment-id masking replaces the varlen kernel the
  reference needs on GPU). Patch counts are bucketed so recompiles are
  bounded.
- Image embeddings enter the decoder through
  AttentionMetadata.mm_embeds/mm_mask: a jnp.where blend against the token
  embedding — no inputs_embeds forking of the jitted decode program.
- mrope (3-section t/h/w rotary) is reduced to per-token ROPE ROWS at the
  metadata layer: gather the 1-D cos/sin cache at the three position rows
  and combine channel sections with a static one-hot (ops/rope.py
  mrope_rows). The decoder layer stack (models/llama.py run_layers) is
  reused unchanged apart from a rope-rows override, so every quantized /
  TP / multi-step path works for VL models too.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.models import llama
from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.kv_cache import KVCache
from vllm_metax_tpu.ops.rope import apply_rope, mrope_rows

# HF defaults for the special tokens (overridden from config.json when set)
IMAGE_TOKEN_ID = 151655
VIDEO_TOKEN_ID = 151656
VISION_START_TOKEN_ID = 151652


# ---------------------------------------------------------------------------
# config helpers


def _is_v25(cfg: ModelConfig) -> bool:
    return cfg.architecture == "Qwen2_5_VLForConditionalGeneration"


def _is_v3(cfg: ModelConfig) -> bool:
    return cfg.architecture in (
        "Qwen3VLForConditionalGeneration",
        "Qwen3VLMoeForConditionalGeneration",
    )


def _is_moe(cfg: ModelConfig) -> bool:
    return cfg.architecture == "Qwen3VLMoeForConditionalGeneration"


def _text_mod(cfg: ModelConfig):
    if _is_moe(cfg):
        from vllm_metax_tpu.models import mixtral

        return mixtral
    return llama


def mrope_interleaved(cfg: ModelConfig) -> bool:
    """Qwen3-VL interleaves the t/h/w rope channels instead of chunking."""
    return bool(
        (cfg.rope_scaling or {}).get("mrope_interleaved", False) or _is_v3(cfg)
    )


def vision_cfg(cfg: ModelConfig) -> dict:
    vc = dict(cfg.hf_config.get("vision_config") or {})
    vc.setdefault("depth", 32)
    vc.setdefault("num_heads", 16)
    vc.setdefault("in_channels", 3)
    vc.setdefault("patch_size", 14)
    vc.setdefault("temporal_patch_size", 2)
    vc.setdefault("spatial_merge_size", 2)
    vc.setdefault("mlp_ratio", 4)
    if _is_v3(cfg):
        # Qwen3-VL: LayerNorm + plain-MLP blocks (linear_fc naming), learned
        # interpolated pos embed, deepstack taps; no window attention
        vc.setdefault("hidden_size", 1152)
        vc["embed_dim"] = vc["hidden_size"]
        vc.setdefault("out_hidden_size", cfg.hidden_size)
        vc["out_hidden"] = vc["out_hidden_size"]
        vc.setdefault(
            "intermediate_size", int(vc["embed_dim"] * float(vc["mlp_ratio"]))
        )
        vc.setdefault("hidden_act", "gelu_pytorch_tanh")
        vc.setdefault("num_position_embeddings", 2304)
        vc.setdefault("deepstack_visual_indexes", [8, 16, 24])
        vc["norm"] = "layer"
        vc["mlp"] = "fc"
    elif _is_v25(cfg):
        # Qwen2.5-VL renames embed_dim→hidden_size, adds SwiGLU + RMSNorm
        # and window attention (HF Qwen2_5_VLVisionConfig)
        vc.setdefault("hidden_size", 1280)
        vc["embed_dim"] = vc["hidden_size"]
        vc.setdefault("out_hidden_size", cfg.hidden_size)
        vc["out_hidden"] = vc["out_hidden_size"]
        vc.setdefault(
            "intermediate_size", int(vc["embed_dim"] * float(vc["mlp_ratio"]))
        )
        vc.setdefault("hidden_act", "silu")
        vc.setdefault("window_size", 112)
        vc.setdefault("fullatt_block_indexes", [7, 15, 23, 31])
        vc["norm"] = "rms"
        vc["mlp"] = "swiglu"
    else:
        vc.setdefault("embed_dim", 1280)
        vc.setdefault("hidden_size", cfg.hidden_size)
        vc["out_hidden"] = vc["hidden_size"]
        vc["intermediate_size"] = int(vc["embed_dim"] * float(vc["mlp_ratio"]))
        vc.setdefault("hidden_act", "quick_gelu")
        vc["norm"] = "layer"
        vc["mlp"] = "fc"
    return vc


def mrope_section(cfg: ModelConfig) -> tuple[int, ...]:
    sec = (cfg.rope_scaling or {}).get("mrope_section")
    if not sec:
        # degenerate: all channels temporal == plain 1-D rope
        sec = [cfg.head_dim // 2, 0, 0]
    return tuple(int(s) for s in sec)


def image_token_id(cfg: ModelConfig) -> int:
    return int(cfg.hf_config.get("image_token_id", IMAGE_TOKEN_ID))


def video_token_id(cfg: ModelConfig) -> int:
    return int(cfg.hf_config.get("video_token_id", VIDEO_TOKEN_ID))


def video_rope_grids(grid, cfg: ModelConfig, second_per_grid: float):
    """Rope-position grid entries + temporal scales for one VIDEO grid.
    Qwen3-VL splits videos into per-frame grids (timestamps carry the
    temporal signal as text tokens); Qwen2.5-VL scales the temporal index
    by second_per_grid × tokens_per_second; Qwen2-VL uses plain frame
    indices."""
    t, h, w = (int(x) for x in grid)
    if _is_v3(cfg):
        return [(1, h, w)] * t, [1.0] * t
    if _is_v25(cfg):
        tps = float(
            (cfg.hf_config.get("vision_config") or {}).get(
                "tokens_per_second", 4
            )
        )
        return [grid], [float(second_per_grid) * tps]
    return [grid], [1.0]


def num_image_tokens(grid_thw, merge: int) -> int:
    t, h, w = (int(x) for x in grid_thw)
    return t * h * w // (merge * merge)


# ---------------------------------------------------------------------------
# host-side position math (numpy; runs once per request at admission)


def vision_patch_metadata(grids: list, vcfg: dict, pad_to: int):
    """Per-patch 2-D rope rows + segment ids for a batch of images, in the
    merge-permuted patch order the HF image processor emits (HF
    Qwen2VisionTransformer.rot_pos_emb). Returns (rope_rows (P, hd),
    seg_ids (P,) with -1 padding) as numpy."""
    m = int(vcfg["spatial_merge_size"])
    hd = int(vcfg["embed_dim"]) // int(vcfg["num_heads"])
    # VisionRotaryEmbedding(dim=hd//2): inv_freq over hd//4 channels
    quarter = hd // 4
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, quarter, dtype=np.float64) / quarter)
    )
    rows, segs = [], []
    seg_id = 0
    for t, h, w in grids:
        t, h, w = int(t), int(h), int(w)
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = (
            hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        )
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = (
            wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        )
        hpos = np.tile(hpos, t)
        wpos = np.tile(wpos, t)
        freqs = np.concatenate(
            [hpos[:, None] * inv_freq[None, :], wpos[:, None] * inv_freq[None, :]],
            axis=-1,
        )  # (t*h*w, hd/2)
        rows.append(
            np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)
        )  # (t*h*w, hd)
        # attention is PER FRAME (HF cu_seqlens repeat_interleave over t):
        # one segment id per (grid, frame)
        segs.append(np.repeat(np.arange(seg_id, seg_id + t), h * w).astype(np.int32))
        seg_id += t
    rope = np.concatenate(rows, axis=0).astype(np.float32)
    seg = np.concatenate(segs, axis=0)
    p = rope.shape[0]
    if pad_to < p:
        raise ValueError(f"pad_to={pad_to} < patches={p}")
    rope = np.pad(rope, ((0, pad_to - p), (0, 0)))
    seg = np.pad(seg, (0, pad_to - p), constant_values=-1)
    return rope, seg


def vision_window_perm(grids: list, vcfg: dict):
    """Qwen2.5-VL window attention: per-image permutation gathering patches
    into (window_h × window_w) tiles at merge-unit granularity, plus the
    per-patch WINDOW segment ids in permuted order and the inverse
    permutation for the merged outputs (HF get_window_index)."""
    m = int(vcfg["spatial_merge_size"])
    ws = int(vcfg["window_size"]) // m // int(vcfg["patch_size"])
    perm_units = []  # merge-unit indices, globally offset
    win_sizes = []  # patches per window
    base = 0
    for t, h, w in grids:
        t, h, w = int(t), int(h), int(w)
        gh, gw = h // m, w // m
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        ph, pw = (-gh) % ws, (-gw) % ws
        idxp = np.pad(idx, ((0, 0), (0, ph), (0, pw)), constant_values=-1)
        nh, nw = (gh + ph) // ws, (gw + pw) // ws
        idxp = (
            idxp.reshape(t, nh, ws, nw, ws)
            .transpose(0, 1, 3, 2, 4)
            .reshape(t, nh * nw, ws * ws)
        )
        for tt in range(t):
            for wdw in range(nh * nw):
                units = idxp[tt, wdw]
                units = units[units >= 0]
                perm_units.append(units + base)
                win_sizes.append(len(units) * m * m)
        base += t * gh * gw
    perm_units = np.concatenate(perm_units)
    # expand merge units → patches (units move as blocks of m² patches)
    perm = (perm_units[:, None] * (m * m) + np.arange(m * m)[None, :]).reshape(-1)
    seg_win = np.repeat(np.arange(len(win_sizes), dtype=np.int32), win_sizes)
    inv_merged = np.argsort(perm_units, kind="stable").astype(np.int32)
    return perm.astype(np.int32), seg_win, inv_merged


def _pos_embed_rows_np(grids: list, vcfg: dict):
    """Bilinear interpolation indices/weights for Qwen3-VL's learned grid
    pos embed (HF fast_pos_embed_interpolate), already in merge-block patch
    order. Returns (idx (4, P), w (4, P))."""
    n_side = int(round(float(vcfg["num_position_embeddings"]) ** 0.5))
    m = int(vcfg["spatial_merge_size"])
    idx_all, w_all = [], []
    for t, h, w in grids:
        t, h, w = int(t), int(h), int(w)
        h_idx = np.linspace(0, n_side - 1, h)
        w_idx = np.linspace(0, n_side - 1, w)
        hf_, wf_ = h_idx.astype(np.int64), w_idx.astype(np.int64)
        hc = np.minimum(hf_ + 1, n_side - 1)
        wc = np.minimum(wf_ + 1, n_side - 1)
        dh, dw = h_idx - hf_, w_idx - wf_
        idx4 = np.stack([
            (hf_[:, None] * n_side + wf_[None, :]).reshape(-1),
            (hf_[:, None] * n_side + wc[None, :]).reshape(-1),
            (hc[:, None] * n_side + wf_[None, :]).reshape(-1),
            (hc[:, None] * n_side + wc[None, :]).reshape(-1),
        ])  # (4, h*w) row-major
        w4 = np.stack([
            ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
            ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
            (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
            (dh[:, None] * dw[None, :]).reshape(-1),
        ])
        # row-major → merge-block patch order, then repeat over t frames
        perm = (
            np.arange(h * w)
            .reshape(h // m, m, w // m, m)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        idx4 = np.tile(idx4[:, perm], (1, t))
        w4 = np.tile(w4[:, perm], (1, t))
        idx_all.append(idx4)
        w_all.append(w4)
    return (
        np.concatenate(idx_all, axis=1),
        np.concatenate(w_all, axis=1).astype(np.float32),
    )


def mrope_positions_np(
    ids: np.ndarray,
    grids: list,
    cfg: ModelConfig,
    time_scales: Optional[list] = None,  # per-grid temporal scale (videos)
) -> tuple[np.ndarray, int]:
    """3-row (t/h/w) rope positions for one prompt + the decode delta
    (HF Qwen2VLModel.get_rope_index). `grids` are the image/video grid_thw
    triples in order of appearance. Text segments advance all three rows
    together from prev_max+1; each vision run uses its 3-D grid indices.
    Qwen2.5-VL videos scale the temporal index by
    second_per_grid_ts × tokens_per_second (HF Qwen2_5_VLModel
    get_rope_index); pass those products via `time_scales` (1 for
    images)."""
    merge = int(vision_cfg(cfg)["spatial_merge_size"])
    img, vid = image_token_id(cfg), video_token_id(cfg)
    n = len(ids)
    is_vis = (ids == img) | (ids == vid)
    pos = np.zeros((3, n), np.int64)
    # segment boundaries: runs of vision tokens
    out_parts = []
    i = 0
    gi = 0
    nxt = 0  # next position start
    while i < n:
        if not is_vis[i]:
            j = i
            while j < n and not is_vis[j]:
                j += 1
            ln = j - i
            out_parts.append((slice(i, j), np.broadcast_to(
                nxt + np.arange(ln), (3, ln))))
            nxt += ln
            i = j
        else:
            j = i
            while j < n and is_vis[j]:
                j += 1
            # a contiguous vision run may span several grids (per-frame
            # split grids, adjacent images without separators)
            while i < j:
                t, h, w = (int(x) for x in grids[gi])
                gh, gw = h // merge, w // merge
                ln = t * gh * gw
                scale = 1.0 if time_scales is None else float(time_scales[gi])
                t_idx = np.repeat(
                    (np.arange(t) * scale).astype(np.int64), gh * gw
                )
                h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
                w_idx = np.tile(np.arange(gw), t * gh)
                block = np.stack([t_idx, h_idx, w_idx]) + nxt
                out_parts.append((slice(i, i + ln), block))
                nxt = int(block.max()) + 1
                gi += 1
                i += ln
    for sl, block in out_parts:
        pos[:, sl] = block
    delta = int(pos.max()) + 1 - n if n else 0
    return pos.astype(np.int32), delta


# ---------------------------------------------------------------------------
# vision tower


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_VIS_ACT = {
    "quick_gelu": _quick_gelu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "gelu_pytorch_tanh": partial(jax.nn.gelu, approximate=True),
    "silu": jax.nn.silu,
}


def _rms_norm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt((xf**2).mean(-1, keepdims=True) + eps) * w
    ).astype(x.dtype)


@partial(jax.jit, static_argnames=("num_heads", "act", "norm", "mlp"))
def _vision_forward(
    vp: dict,
    pixels: jnp.ndarray,  # (P, C*tps*ps*ps)
    rope: jnp.ndarray,  # (P, hd) cos|sin rows
    seg: jnp.ndarray,  # (P,) full-attention segment ids (image), -1 pad
    seg_win: jnp.ndarray,  # (P,) window segment ids (== seg when unwindowed)
    full_flags: jnp.ndarray,  # (depth,) bool: layer uses full attention
    num_heads: int,
    act: str,
    norm: str,  # "layer" (Qwen2-VL) | "rms" (Qwen2.5-VL)
    mlp: str,  # "fc" | "swiglu"
):
    """ViT over the padded patch batch → merged embeddings (P/merge², H).
    Attention is dense with a block-diagonal segment mask — at typical
    image sizes (≤4k patches) one dense (P,P) score matrix per layer is
    MXU-friendly and beats a varlen gather on TPU. Qwen2.5-VL window
    attention is the same kernel with per-window segment ids (the host
    pre-permutes patches into window tiles), selected per layer."""
    x = pixels @ vp["patch_w"]  # (P, E)
    p, e = x.shape
    hd = e // num_heads
    scale = hd**-0.5
    mask_full = (seg[:, None] == seg[None, :])[None]  # (1, P, P)
    mask_win = (seg_win[:, None] == seg_win[None, :])[None]
    pos = jnp.arange(p, dtype=jnp.int32)
    act_fn = _VIS_ACT[act]

    def norm_fn(x, w, b):
        if norm == "rms":
            return _rms_norm(x, w)
        return _layer_norm(x, w, b)

    def block(x, scan_in):
        bp, is_full = scan_in
        mask = jnp.where(is_full, mask_full, mask_win)
        h = norm_fn(x, bp["ln1_w"], bp["ln1_b"])
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]  # (P, 3E)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(p, num_heads, hd)
        k = k.reshape(p, num_heads, hd)
        v = v.reshape(p, num_heads, hd)
        q, k = apply_rope(q, k, pos, rope)
        scores = jnp.einsum(
            "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(p, e)
        x = x + (o @ bp["proj_w"] + bp["proj_b"])
        h = norm_fn(x, bp["ln2_w"], bp["ln2_b"])
        if mlp == "swiglu":
            gate = act_fn(h @ bp["gate_w"] + bp["gate_b"])
            up = h @ bp["up_w"] + bp["up_b"]
            h = (gate * up) @ bp["down_w"] + bp["down_b"]
        else:
            h = act_fn(h @ bp["fc1_w"] + bp["fc1_b"]) @ bp["fc2_w"] + bp["fc2_b"]
        return x + h, None

    x, _ = jax.lax.scan(block, x, (vp["blocks"], full_flags))
    # merger: norm then groups of merge² consecutive patches → MLP
    x = norm_fn(x, vp["ln_q_w"], vp["ln_q_b"])
    x = x.reshape(-1, vp["m0_w"].shape[0])  # (P/m², m²·E)
    x = jax.nn.gelu(x @ vp["m0_w"] + vp["m0_b"], approximate=False)
    return x @ vp["m2_w"] + vp["m2_b"]  # (P/m², H)


@partial(jax.jit, static_argnames=("num_heads", "act", "taps"))
def _vision_forward_q3(
    vp: dict,
    pixels: jnp.ndarray,  # (P, K)
    pos_add: jnp.ndarray,  # (P, E) interpolated learned pos embed
    rope: jnp.ndarray,  # (P, hd)
    seg: jnp.ndarray,  # (P,) image ids, -1 pad
    num_heads: int,
    act: str,
    taps: tuple,  # deepstack tap layer indexes
):
    """Qwen3-VL ViT: LayerNorm blocks + plain MLP; collects deepstack
    features after the tap layers, each through its own postshuffle-norm
    merger. Returns (merged (P/m², H), deepstack (K, P/m², H))."""
    x = pixels @ vp["patch_w"] + vp["patch_b"] + pos_add
    p, e = x.shape
    hd = e // num_heads
    scale = hd**-0.5
    mask = (seg[:, None] == seg[None, :])[None]
    pos = jnp.arange(p, dtype=jnp.int32)
    act_fn = _VIS_ACT[act]

    def block(x, bp):
        h = _layer_norm(x, bp["ln1_w"], bp["ln1_b"])
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(p, num_heads, hd)
        k = k.reshape(p, num_heads, hd)
        v = v.reshape(p, num_heads, hd)
        q, k = apply_rope(q, k, pos, rope)
        scores = jnp.einsum(
            "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(p, e)
        x = x + (o @ bp["proj_w"] + bp["proj_b"])
        h = _layer_norm(x, bp["ln2_w"], bp["ln2_b"])
        h = act_fn(h @ bp["fc1_w"] + bp["fc1_b"]) @ bp["fc2_w"] + bp["fc2_b"]
        return x + h, x + h

    _, xs = jax.lax.scan(block, x, vp["blocks"])  # xs: (depth, P, E)

    def merger(mp, h, postshuffle):
        if postshuffle:
            h = h.reshape(-1, mp["m0_w"].shape[0])
            h = _layer_norm(h, mp["norm_w"], mp["norm_b"])
        else:
            h = _layer_norm(h, mp["norm_w"], mp["norm_b"])
            h = h.reshape(-1, mp["m0_w"].shape[0])
        h = jax.nn.gelu(h @ mp["m0_w"] + mp["m0_b"], approximate=False)
        return h @ mp["m2_w"] + mp["m2_b"]

    out = merger(vp["merger"], xs[-1], False)
    ds = jnp.stack([
        merger(
            jax.tree_util.tree_map(lambda a: a[i], vp["ds_mergers"]),
            xs[tap],
            True,
        )
        for i, tap in enumerate(taps)
    ])
    return out, ds


def encode_images(
    params: dict,
    pixels: np.ndarray,  # (P, C*tps*ps*ps) from the HF image processor
    grids: list,  # list of (t, h, w)
    cfg: ModelConfig,
    pad_to: Optional[int] = None,
    want_deepstack: bool = False,
):
    """Run the vision tower; returns (sum(grid)/m², H) merged embeddings —
    with want_deepstack, a (embeds, deepstack (K, sum/m², H) | None)
    tuple."""
    vcfg = vision_cfg(cfg)
    m2 = int(vcfg["spatial_merge_size"]) ** 2
    p = pixels.shape[0]
    if pad_to is None:
        # bucket to limit recompiles; merge groups must stay aligned
        pad_to = max(m2 * 32, 2 ** math.ceil(math.log2(max(p, 1))))
    rope, seg = vision_patch_metadata(grids, vcfg, pad_to)
    dt = cfg.dtype
    if _is_v3(cfg):
        idx4, w4 = _pos_embed_rows_np(grids, vcfg)
        table = params["visual"]["pos_embed"]
        pos_add = jnp.einsum(
            "fp,fpe->pe", jnp.asarray(w4, jnp.float32),
            table[jnp.asarray(idx4)].astype(jnp.float32),
        ).astype(dt)
        pos_add = jnp.pad(pos_add, ((0, pad_to - p), (0, 0)))
        px = np.zeros((pad_to, pixels.shape[1]), pixels.dtype)
        px[:p] = pixels
        out, ds = _vision_forward_q3(
            params["visual"],
            jnp.asarray(px, dt),
            pos_add,
            jnp.asarray(rope),
            jnp.asarray(seg),
            num_heads=int(vcfg["num_heads"]),
            act=str(vcfg["hidden_act"]),
            taps=tuple(int(i) for i in vcfg["deepstack_visual_indexes"]),
        )
        out = out[: p // m2]
        ds = ds[:, : p // m2]
        return (out, ds) if want_deepstack else out
    windowed = vcfg.get("window_size") and vcfg["mlp"] == "swiglu"
    inv_merged = None
    if windowed:
        # pre-permute patches into window tiles host-side (the pointwise
        # patch embed commutes with the gather); merged outputs are
        # inverse-permuted below
        perm, seg_win_np, inv_merged = vision_window_perm(grids, vcfg)
        pixels = pixels[perm]
        rope[:p] = rope[perm]
        seg[:p] = seg[perm]  # identity in practice (windows stay in-image)
        seg_win = np.pad(
            seg_win_np, (0, pad_to - p), constant_values=-1
        ).astype(np.int32)
        depth = int(vcfg["depth"])
        full_flags = np.zeros(depth, bool)
        full_flags[list(vcfg["fullatt_block_indexes"])] = True
    else:
        seg_win = seg
        full_flags = np.ones(int(vcfg["depth"]), bool)
    px = np.zeros((pad_to, pixels.shape[1]), pixels.dtype)
    px[:p] = pixels
    out = _vision_forward(
        params["visual"],
        jnp.asarray(px, dt),
        jnp.asarray(rope),
        jnp.asarray(seg),
        jnp.asarray(seg_win),
        jnp.asarray(full_flags),
        num_heads=int(vcfg["num_heads"]),
        act=str(vcfg["hidden_act"]),
        norm=str(vcfg["norm"]),
        mlp=str(vcfg["mlp"]),
    )
    out = out[: p // m2]
    if inv_merged is not None:
        out = out[jnp.asarray(inv_merged)]
    return (out, None) if want_deepstack else out


# ---------------------------------------------------------------------------
# decoder (reuses models/llama.py with a rope-rows override)


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
):
    if _is_moe(cfg):
        # the MoE text stack handles the multimodal metadata hooks itself
        # (models/mixtral.py forward: blend, mrope rows, deepstack)
        from vllm_metax_tpu.models import mixtral

        return mixtral.forward(
            params, input_ids, kv_cache, md, cfg,
            num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
            axis_name=axis_name, ep_axis_name=ep_axis_name,
        )
    hidden = llama.embed(params, input_ids, cfg)
    if md.mm_embeds is not None:
        hidden = jnp.where(
            md.mm_mask[:, None], md.mm_embeds.astype(hidden.dtype), hidden
        )
    rope_rows = None
    if md.mrope_positions is not None:
        rope_rows = mrope_rows(
            params["rope_cache"], md.mrope_positions, mrope_section(cfg),
            interleaved=mrope_interleaved(cfg),
        )
    residual = jnp.zeros_like(hidden)
    hidden, residual, new_kv = llama.run_layers(
        params,
        hidden,
        residual,
        kv_cache,
        md,
        cfg,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        axis_name=axis_name,
        rope_rows=rope_rows,
        deepstack=md.mm_deepstack,
        ds_mask=md.mm_mask,
    )
    return llama.finalize(hidden, residual, cfg), new_kv


compute_logits = llama.compute_logits
kv_cache_spec = llama.kv_cache_spec


# ---------------------------------------------------------------------------
# params


def _init_vision_params(vcfg: dict, cfg: ModelConfig, key) -> dict:
    e = int(vcfg["embed_dim"])
    depth = int(vcfg["depth"])
    hid = int(vcfg["out_hidden"])
    mlp = int(vcfg["intermediate_size"])
    m2 = int(vcfg["spatial_merge_size"]) ** 2
    kdim = (
        int(vcfg["in_channels"])
        * int(vcfg["temporal_patch_size"])
        * int(vcfg["patch_size"]) ** 2
    )
    dt = cfg.dtype
    ks = jax.random.split(key, 8)

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dt)

    def blockp(k):
        kk = jax.random.split(k, 5)
        out = {
            "ln1_w": jnp.ones((depth, e), jnp.float32),
            "ln1_b": jnp.zeros((depth, e), jnp.float32),
            "ln2_w": jnp.ones((depth, e), jnp.float32),
            "ln2_b": jnp.zeros((depth, e), jnp.float32),
            "qkv_w": dense(kk[0], (depth, e, 3 * e)),
            "qkv_b": jnp.zeros((depth, 3 * e), dt),
            "proj_w": dense(kk[1], (depth, e, e)),
            "proj_b": jnp.zeros((depth, e), dt),
        }
        if vcfg["mlp"] == "swiglu":
            out.update(
                gate_w=dense(kk[2], (depth, e, mlp)),
                gate_b=jnp.zeros((depth, mlp), dt),
                up_w=dense(kk[3], (depth, e, mlp)),
                up_b=jnp.zeros((depth, mlp), dt),
                down_w=dense(kk[4], (depth, mlp, e)),
                down_b=jnp.zeros((depth, e), dt),
            )
        else:
            out.update(
                fc1_w=dense(kk[2], (depth, e, mlp)),
                fc1_b=jnp.zeros((depth, mlp), dt),
                fc2_w=dense(kk[3], (depth, mlp, e)),
                fc2_b=jnp.zeros((depth, e), dt),
            )
        return out

    if vcfg.get("deepstack_visual_indexes") is not None:
        # Qwen3-VL layout: learned pos embed + per-tap deepstack mergers
        def mergerp(k, postshuffle):
            kk = jax.random.split(k, 2)
            nd = m2 * e if postshuffle else e
            return {
                "norm_w": jnp.ones((nd,), jnp.float32),
                "norm_b": jnp.zeros((nd,), jnp.float32),
                "m0_w": dense(kk[0], (m2 * e, m2 * e)),
                "m0_b": jnp.zeros((m2 * e,), dt),
                "m2_w": dense(kk[1], (m2 * e, hid)),
                "m2_b": jnp.zeros((hid,), dt),
            }

        taps = list(vcfg["deepstack_visual_indexes"])
        dks = jax.random.split(ks[4], len(taps))
        return {
            "patch_w": dense(ks[0], (kdim, e)),
            "patch_b": jnp.zeros((e,), dt),
            "pos_embed": dense(
                ks[5], (int(vcfg["num_position_embeddings"]), e)
            ),
            "blocks": blockp(ks[1]),
            "merger": mergerp(ks[2], False),
            "ds_mergers": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[mergerp(dks[i], True) for i in range(len(taps))],
            ),
        }
    return {
        "patch_w": dense(ks[0], (kdim, e)),
        "blocks": blockp(ks[1]),
        "ln_q_w": jnp.ones((e,), jnp.float32),
        "ln_q_b": jnp.zeros((e,), jnp.float32),
        "m0_w": dense(ks[2], (m2 * e, m2 * e)),
        "m0_b": jnp.zeros((m2 * e,), dt),
        "m2_w": dense(ks[3], (m2 * e, hid)),
        "m2_b": jnp.zeros((hid,), dt),
    }


def init_params(cfg: ModelConfig, quant_cfg=None, seed: int = 0) -> dict:
    params = _text_mod(cfg).init_params(cfg, quant_cfg, seed)
    params["visual"] = _init_vision_params(
        vision_cfg(cfg), cfg, jax.random.PRNGKey(seed + 7)
    )
    return params


class _RemapReader:
    """CheckpointReader view translating the llama loader's `model.*` /
    `lm_head.*` keys onto Qwen2-VL checkpoints, which store the text model
    under `model.language_model.*` (transformers ≥4.52) or `model.*` with
    the ViT as a `visual.*` sibling (original releases)."""

    def __init__(self, reader):
        self._r = reader
        self._lm = reader.has("model.language_model.embed_tokens.weight")

    def _map(self, name: str) -> str:
        if self._lm and name.startswith("model."):
            return "model.language_model." + name[len("model."):]
        return name

    def has(self, name: str) -> bool:
        return self._r.has(self._map(name))

    def get(self, name: str):
        return self._r.get(self._map(name))


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    params = _text_mod(cfg).load_weights(
        cfg, quant_cfg, path, reader=_RemapReader(reader)
    )
    vis_pre = (
        "model.visual" if reader.has("model.visual.patch_embed.proj.weight")
        else "visual"
    )
    vcfg = vision_cfg(cfg)
    dt = cfg.dtype

    def get(name, dtype=dt):
        return jnp.asarray(reader.get(f"{vis_pre}.{name}"), dtype=dtype)

    depth = int(vcfg["depth"])
    e = int(vcfg["embed_dim"])

    def stack(fmt, dtype=dt, transpose=False):
        xs = []
        for i in range(depth):
            a = jnp.asarray(reader.get(f"{vis_pre}.{fmt.format(i)}"), dtype)
            xs.append(a.T if transpose else a)
        return jnp.stack(xs)

    if _is_v3(cfg):
        blocks = {
            "ln1_w": stack("blocks.{}.norm1.weight", jnp.float32),
            "ln1_b": stack("blocks.{}.norm1.bias", jnp.float32),
            "ln2_w": stack("blocks.{}.norm2.weight", jnp.float32),
            "ln2_b": stack("blocks.{}.norm2.bias", jnp.float32),
            "qkv_w": stack("blocks.{}.attn.qkv.weight", transpose=True),
            "qkv_b": stack("blocks.{}.attn.qkv.bias"),
            "proj_w": stack("blocks.{}.attn.proj.weight", transpose=True),
            "proj_b": stack("blocks.{}.attn.proj.bias"),
            "fc1_w": stack("blocks.{}.mlp.linear_fc1.weight", transpose=True),
            "fc1_b": stack("blocks.{}.mlp.linear_fc1.bias"),
            "fc2_w": stack("blocks.{}.mlp.linear_fc2.weight", transpose=True),
            "fc2_b": stack("blocks.{}.mlp.linear_fc2.bias"),
        }

        def mergerl(pre):
            return {
                "norm_w": get(f"{pre}.norm.weight", jnp.float32),
                "norm_b": get(f"{pre}.norm.bias", jnp.float32),
                "m0_w": get(f"{pre}.linear_fc1.weight").T,
                "m0_b": get(f"{pre}.linear_fc1.bias"),
                "m2_w": get(f"{pre}.linear_fc2.weight").T,
                "m2_b": get(f"{pre}.linear_fc2.bias"),
            }

        taps = vision_cfg(cfg)["deepstack_visual_indexes"]
        params["visual"] = {
            "patch_w": get("patch_embed.proj.weight").reshape(e, -1).T,
            "patch_b": get("patch_embed.proj.bias"),
            "pos_embed": get("pos_embed.weight"),
            "blocks": blocks,
            "merger": mergerl("merger"),
            "ds_mergers": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[mergerl(f"deepstack_merger_list.{i}")
                  for i in range(len(taps))],
            ),
        }
        return params
    rms = vcfg["norm"] == "rms"
    blocks = {
        "ln1_w": stack("blocks.{}.norm1.weight", jnp.float32),
        "ln2_w": stack("blocks.{}.norm2.weight", jnp.float32),
        "qkv_w": stack("blocks.{}.attn.qkv.weight", transpose=True),
        "qkv_b": stack("blocks.{}.attn.qkv.bias"),
        "proj_w": stack("blocks.{}.attn.proj.weight", transpose=True),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
    }
    if rms:
        # RMSNorm has no bias; zeros keep the block pytree uniform
        blocks["ln1_b"] = jnp.zeros_like(blocks["ln1_w"])
        blocks["ln2_b"] = jnp.zeros_like(blocks["ln2_w"])
    else:
        blocks["ln1_b"] = stack("blocks.{}.norm1.bias", jnp.float32)
        blocks["ln2_b"] = stack("blocks.{}.norm2.bias", jnp.float32)
    if vcfg["mlp"] == "swiglu":
        blocks.update(
            gate_w=stack("blocks.{}.mlp.gate_proj.weight", transpose=True),
            gate_b=stack("blocks.{}.mlp.gate_proj.bias"),
            up_w=stack("blocks.{}.mlp.up_proj.weight", transpose=True),
            up_b=stack("blocks.{}.mlp.up_proj.bias"),
            down_w=stack("blocks.{}.mlp.down_proj.weight", transpose=True),
            down_b=stack("blocks.{}.mlp.down_proj.bias"),
        )
    else:
        blocks.update(
            fc1_w=stack("blocks.{}.mlp.fc1.weight", transpose=True),
            fc1_b=stack("blocks.{}.mlp.fc1.bias"),
            fc2_w=stack("blocks.{}.mlp.fc2.weight", transpose=True),
            fc2_b=stack("blocks.{}.mlp.fc2.bias"),
        )
    ln_q_w = get("merger.ln_q.weight", jnp.float32)
    params["visual"] = {
        "patch_w": get("patch_embed.proj.weight").reshape(e, -1).T,
        "blocks": blocks,
        "ln_q_w": ln_q_w,
        "ln_q_b": (
            jnp.zeros_like(ln_q_w) if rms
            else get("merger.ln_q.bias", jnp.float32)
        ),
        "m0_w": get("merger.mlp.0.weight").T,
        "m0_b": get("merger.mlp.0.bias"),
        "m2_w": get("merger.mlp.2.weight").T,
        "m2_b": get("merger.mlp.2.bias"),
    }
    return params


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    from jax.sharding import PartitionSpec as P

    specs = _text_mod(cfg).param_specs(cfg, quant_cfg)
    # vision tower is replicated (runs once per request; tiny vs the LM)
    shape_tree = jax.eval_shape(
        lambda: _init_vision_params(vision_cfg(cfg), cfg, jax.random.PRNGKey(0))
    )
    specs["visual"] = jax.tree_util.tree_map(lambda _: P(), shape_tree)
    return specs


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    visual = params.pop("visual")
    out = _text_mod(cfg).prepare_for_tp(params, cfg, tp)
    out["visual"] = visual
    params["visual"] = visual
    return out
