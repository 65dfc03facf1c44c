"""Rotary position embedding.

Reference math: csrc/pos_encoding_kernels.cu:77 (rotary_embedding, neox style)
and :103 (batched_rotary_embedding). TPU-native design: the cos/sin cache is a
precomputed (max_pos, rot_dim) array; application is a gather + elementwise,
which XLA fuses into the surrounding QKV projection.

Supports Llama-3 rope scaling ("llama3"), linear scaling, and
YaRN ("yarn"/"dynamic") variants as parsed from HF rope_scaling configs.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _base_inv_freq(rot_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))


def _llama3_scale(inv_freq: np.ndarray, scaling: dict) -> np.ndarray:
    # HF Llama-3.x rope: per-frequency interpolation between scaled/unscaled.
    factor = scaling["factor"]
    low = scaling.get("low_freq_factor", 1.0)
    high = scaling.get("high_freq_factor", 4.0)
    orig_max = scaling.get("original_max_position_embeddings", 8192)
    wavelen = 2 * math.pi / inv_freq
    low_wl = orig_max / low
    high_wl = orig_max / high
    out = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
    smooth = (orig_max / wavelen - low) / (high - low)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
    return np.where(is_mid, smoothed, out)


def _yarn_inv_freq(rot_dim: int, theta: float, scaling: dict) -> tuple[np.ndarray, float]:
    factor = scaling["factor"]
    orig_max = scaling.get("original_max_position_embeddings", 4096)
    beta_fast = scaling.get("beta_fast", 32)
    beta_slow = scaling.get("beta_slow", 1)

    def find_dim(num_rot):
        return (rot_dim * math.log(orig_max / (num_rot * 2 * math.pi))) / (
            2 * math.log(theta)
        )

    lo = max(math.floor(find_dim(beta_fast)), 0)
    hi = min(math.ceil(find_dim(beta_slow)), rot_dim - 1)
    base = _base_inv_freq(rot_dim, theta)
    interp = base / factor
    rng = np.clip(
        (np.arange(rot_dim // 2, dtype=np.float64) - lo) / max(hi - lo, 1e-3), 0, 1
    )
    inv_freq = interp * rng + base * (1 - rng)
    mscale = scaling.get("mscale", 1.0)
    mscale_all_dim = scaling.get("mscale_all_dim", 0.0)

    def yarn_mscale(scale, m):
        if scale <= 1 or m == 0:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    attn_factor = scaling.get("attn_factor", 1.0)
    if mscale_all_dim:
        m = (
            yarn_mscale(factor, mscale)
            / yarn_mscale(factor, mscale_all_dim)
            * attn_factor
        )
    else:
        m = yarn_mscale(factor, 0.1) * attn_factor if factor > 1 else 1.0 * attn_factor
    return inv_freq, m


def compute_rope_cache(
    max_position: int,
    rot_dim: int,
    theta: float = 10000.0,
    rope_scaling: Optional[dict] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns (max_position, rot_dim) array = concat(cos, sin) halves."""
    inv_freq = _base_inv_freq(rot_dim, theta)
    mscale = 1.0
    positions = np.arange(max_position, dtype=np.float64)
    if rope_scaling:
        rtype = rope_scaling.get("rope_type") or rope_scaling.get("type")
        if rtype == "llama3":
            inv_freq = _llama3_scale(inv_freq, rope_scaling)
        elif rtype == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rtype in ("yarn", "deepseek_yarn"):
            inv_freq, mscale = _yarn_inv_freq(rot_dim, theta, rope_scaling)
        elif rtype == "longrope":
            # Phi-3 SU-scaled rope: per-frequency rescale factors, selected
            # per position — short factors for positions inside the original
            # training window, long factors beyond (the serving-style cache
            # the reference inherits; HF instead switches wholesale on the
            # batch max length, which ragged serving batches can't do).
            orig = int(rope_scaling["original_max_position_embeddings"])
            short = np.asarray(rope_scaling["short_factor"], np.float64)
            long = np.asarray(rope_scaling["long_factor"], np.float64)
            scale = max_position / orig
            mscale = (
                1.0
                if scale <= 1.0
                else math.sqrt(1 + math.log(scale) / math.log(orig))
            )
            f_short = np.outer(positions[:orig], inv_freq / short)
            f_long = np.outer(positions[orig:], inv_freq / long)
            freqs = np.concatenate([f_short, f_long], axis=0)
            cache = np.concatenate(
                [np.cos(freqs) * mscale, np.sin(freqs) * mscale], axis=-1
            )
            return jnp.asarray(cache, dtype=dtype)
        elif rtype in ("default", None, "mrope"):
            pass
        else:
            raise ValueError(f"unsupported rope_type {rtype!r}")
    freqs = np.outer(positions, inv_freq)
    cache = np.concatenate([np.cos(freqs) * mscale, np.sin(freqs) * mscale], axis=-1)
    return jnp.asarray(cache, dtype=dtype)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray,
    cache: jnp.ndarray,
    is_neox_style: bool = True,
):
    """Apply rotary embedding to q (T, Hq, D) and k (T, Hk, D) at `positions`
    (T,). Only the leading rot_dim of D is rotated (partial-rope models)."""
    rot_dim = cache.shape[-1]
    cs = cache[positions]  # (T, rot_dim)
    cos, sin = jnp.split(cs, 2, axis=-1)  # (T, rot_dim/2) each
    cos = cos[:, None, :]
    sin = sin[:, None, :]

    def rotate(x):
        x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        xf = x_rot.astype(jnp.float32)
        if is_neox_style:
            x1, x2 = jnp.split(xf, 2, axis=-1)
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        else:  # GPT-J interleaved
            x1 = xf[..., 0::2]
            x2 = xf[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
        out = out.astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rotate(q), (rotate(k) if k is not None else None)


def mrope_rows(
    cache: jnp.ndarray,  # (max_pos, rot_dim) 1-D rope cache
    mrope_positions: jnp.ndarray,  # (3, T) t/h/w position rows
    mrope_section: tuple[int, ...],  # static channel split over rot_dim/2
    interleaved: bool = False,  # Qwen3-VL: [THWTHW...TT] channel layout
) -> jnp.ndarray:
    """Per-token rope rows for multimodal 3-section rope (Qwen2-VL mrope,
    HF apply_multimodal_rotary_pos_emb): channel chunk i of the cos/sin
    halves takes its rotation angle from position row i. Reduced to a
    3-row gather + static one-hot combine so downstream apply_rope is the
    ordinary 1-D path (gather rows with arange). For decode (all three
    rows equal) this degenerates to the plain cache row."""
    half = cache.shape[-1] // 2
    sec = np.zeros(half, np.int32)
    if interleaved:
        # HF Qwen3VLTextRotaryEmbedding.apply_interleaved_mrope: H rides
        # channels 1,4,7,… (up to 3·sec[1]), W rides 2,5,8,… (up to
        # 3·sec[2]), T everywhere else
        sec[1 : 3 * mrope_section[1] : 3] = 1
        sec[2 : 3 * mrope_section[2] : 3] = 2
    else:
        off = 0
        for i, s in enumerate(mrope_section):
            sec[off:off + s] = i
            off += s
    sec = np.concatenate([sec, sec])  # same pattern for cos and sin halves
    onehot = (sec[None, :] == np.arange(3)[:, None])  # (3, rot_dim) bool
    rows = cache[mrope_positions]  # (3, T, rot_dim)
    return jnp.where(jnp.asarray(onehot)[:, None, :], rows, 0.0).sum(axis=0)
