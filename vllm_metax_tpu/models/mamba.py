"""Mamba-1 (selective-state-space) causal LM.

Reference parity: the CUDA `selective_scan_fwd` kernel the reference
compiles for Mamba-style models (csrc/mamba/mamba_ssm/selective_scan_fwd.cu)
and the HF `MambaForCausalLM` math (transformers/models/mamba).

TPU-native design: the recurrence runs as a log-depth
`jax.lax.associative_scan` (ops/ssm.py) over per-request padded grids —
the same ragged-batch grid shape as Qwen3-Next's DeltaNet (pads are
state-neutral via Δ=0) — with a fully vectorized single-step path for
decode. Per-request SSM/conv states live in the engine's hybrid state
pools (KVCache.lin_state/conv_state, one slot per live request), so
continuous batching, preemption-by-recompute (position-0 reset), and
multi-step decode windows all work unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.gdn import causal_conv1d
from vllm_metax_tpu.ops.kv_cache import KVCache
from vllm_metax_tpu.ops.layernorm import fused_add_rms_norm, rms_norm
from vllm_metax_tpu.ops.ssm import (
    selective_scan,
    selective_scan_step,
    ssd_scan_chunked,
    ssd_step,
)

_GRID_MAX_BYTES = 64 * 1024 * 1024


def _hp(cfg: ModelConfig) -> dict:
    hf = cfg.hf_config
    d_inner = int(hf.get("intermediate_size") or 2 * cfg.hidden_size)
    dt_rank = hf.get("time_step_rank", "auto")
    if dt_rank in (None, "auto"):
        dt_rank = -(-cfg.hidden_size // 16)
    return {
        "d_inner": d_inner,
        "n": int(hf.get("state_size", 16)),
        "k": int(hf.get("conv_kernel", 4)),
        "dt_rank": int(dt_rank),
        "use_bias": bool(hf.get("use_bias", False)),
        "use_conv_bias": bool(hf.get("use_conv_bias", True)),
        # FalconMamba: weightless RMS normalization of B/C/dt between
        # x_proj and dt_proj (HF falcon_mamba rms_forward)
        "bcdt_rms": (
            float(hf.get("mixer_rms_eps", 1e-6))
            if hf.get("model_type") == "falcon_mamba"
            else None
        ),
    }


def _is_m2(cfg: ModelConfig) -> bool:
    return cfg.hf_config.get("model_type") == "mamba2"


def _hp2(cfg: ModelConfig) -> dict:
    hf = cfg.hf_config
    heads = int(hf.get("num_heads", 128))
    hd = int(hf.get("head_dim", 64))
    d_inner = int(
        hf.get("intermediate_size")
        or int(hf.get("expand", 2)) * cfg.hidden_size
    )
    g = int(hf.get("n_groups", 1))
    n = int(hf.get("state_size", 128))
    lim = hf.get("time_step_limit") or (0.0, float("inf"))
    return {
        "heads": heads,
        "hd": hd,
        "d_inner": d_inner,
        "g": g,
        "n": n,
        "k": int(hf.get("conv_kernel", 4)),
        "conv_dim": d_inner + 2 * g * n,
        "limit": (float(lim[0]), float(lim[1])),
        "rms_norm": bool(hf.get("rms_norm", True)),
        "use_bias": bool(hf.get("use_bias", False)),
        "use_conv_bias": bool(hf.get("use_conv_bias", True)),
    }


def kv_cache_spec(cfg: ModelConfig) -> dict:
    if _is_m2(cfg):
        hp = _hp2(cfg)
        return {
            "num_layers": 1,
            "num_kv_heads": 1,
            "head_dim": 8,
            "linear_layers": cfg.num_hidden_layers,
            "linear_state_shape": (hp["heads"], hp["hd"], hp["n"]),
            "conv_state_shape": (hp["k"] - 1, hp["conv_dim"]),
        }
    hp = _hp(cfg)
    return {
        # no attention layers: a minimal dummy page pool keeps the paged
        # engine plumbing (slot sentinels, block accounting) uniform
        "num_layers": 1,
        "num_kv_heads": 1,
        "head_dim": 8,
        "linear_layers": cfg.num_hidden_layers,
        "linear_state_shape": (hp["d_inner"], hp["n"]),
        "conv_state_shape": (hp["k"] - 1, hp["d_inner"]),
    }


def _mixer(lp, normed, lin_state_l, conv_state_l, md, cfg, hp, num_slots):
    """One Mamba mixer over the step's token batch. lin_state_l (RSLOT,
    D, N) and conv_state_l (RSLOT, K-1, D) are this layer's state pools;
    returns (out (T, hidden), new lin_state_l, new conv_state_l)."""
    t = normed.shape[0]
    d_inner, n, dt_rank = hp["d_inner"], hp["n"], hp["dt_rank"]
    rslot = lin_state_l.shape[0]
    slots = md.state_idx  # (R,) padding rows carry RSLOT (OOB)
    # bucket-padding tokens carry req_idx 0; route them to the scratch slot
    tok_pad = md.slot_mapping >= num_slots
    tok_slot = jnp.where(tok_pad, rslot, slots[md.req_idx])

    xz = apply_linear(lp["in_proj"], normed)  # (T, 2*d_inner)
    x, z = jnp.split(xz, 2, axis=-1)
    conv_w = lp["conv_w"]  # (K, d_inner)
    conv_b = lp.get("conv_b")
    a = -jnp.exp(lp["a_log"].astype(jnp.float32))  # (D, N)
    dsk = lp["d_skip"].astype(jnp.float32)

    def ssm_inputs(u_flat):
        """post-conv u → (Δ (…D) f32 post-softplus, B, C). Jamba variants
        RMS-normalize dt/B/C between x_proj and dt_proj (JambaMambaMixer
        dt_layernorm/b_layernorm/c_layernorm)."""
        sp = apply_linear(lp["x_proj"], u_flat.astype(normed.dtype))
        dtr, b, c = jnp.split(sp, [dt_rank, dt_rank + n], axis=-1)
        if hp.get("bcdt_rms"):
            eps2 = hp["bcdt_rms"]

            def _wrms(x):
                xf = x.astype(jnp.float32)
                return (
                    xf * jax.lax.rsqrt((xf**2).mean(-1, keepdims=True) + eps2)
                ).astype(x.dtype)

            dtr, b, c = _wrms(dtr), _wrms(b), _wrms(c)
        if "dt_norm" in lp:
            eps = cfg.rms_norm_eps

            def _rms(x, w):
                xf = x.astype(jnp.float32)
                return (
                    xf
                    * jax.lax.rsqrt((xf**2).mean(-1, keepdims=True) + eps)
                    * w
                ).astype(x.dtype)

            dtr = _rms(dtr, lp["dt_norm"])
            b = _rms(b, lp["b_norm"])
            c = _rms(c, lp["c_norm"])
        dt = apply_linear(lp["dt_proj"], dtr).astype(jnp.float32)
        return jax.nn.softplus(dt), b.astype(jnp.float32), c.astype(jnp.float32)

    if md.decode_only:
        r = slots.shape[0]
        safe = jnp.minimum(slots, rslot - 1)
        hist = conv_state_l[safe]  # (R, K-1, D)
        u, hist_new = causal_conv1d(x[:r][:, None, :], hist, conv_w, conv_b)
        u = u[:, 0]  # (R, D) f32
        dt, b, c = ssm_inputs(u)
        h0 = lin_state_l[safe]
        y, h1 = selective_scan_step(u, dt, a, b, c, dsk, h0)
        ok = slots < rslot
        wslot = jnp.where(ok, slots, rslot)
        lin_state_l = _scatter_pad(lin_state_l, wslot, h1)
        conv_state_l = _scatter_pad(
            conv_state_l, wslot, hist_new.astype(conv_state_l.dtype)
        )
        core = y
        if t > r:
            core = jnp.concatenate(
                [core, jnp.zeros((t - r, d_inner), jnp.float32)], axis=0
            )
    else:
        r = slots.shape[0]
        grid_ok = (r + 1) * t * d_inner * 4 * 4 <= _GRID_MAX_BYTES
        qsl = md.query_start_loc
        col = jnp.arange(t, dtype=jnp.int32) - qsl[md.req_idx]
        row = jnp.where(tok_pad, r, md.req_idx)
        first_pos = md.positions[jnp.minimum(qsl[:-1], t - 1)]  # (R,)
        safe = jnp.minimum(slots, rslot - 1)
        fresh = (first_pos == 0)[:, None]
        if grid_ok:
            # ragged batch → (R+1, T) padded grids; pad cells get Δ=0 (a
            # state no-op) via the validity grid. Row R is scratch.
            grid_x = jnp.zeros((r + 1, t, d_inner), x.dtype).at[row, col].set(
                x, mode="drop"
            )
            valid = jnp.zeros((r + 1, t), bool).at[row, col].set(
                ~tok_pad, mode="drop"
            )
            h0c = jnp.where(
                fresh[..., None], 0.0, conv_state_l[safe]
            ).astype(conv_state_l.dtype)
            s0 = jnp.where(fresh[..., None], 0.0, lin_state_l[safe])
            h0c = jnp.concatenate(
                [h0c, jnp.zeros((1,) + h0c.shape[1:], h0c.dtype)], axis=0
            )
            s0 = jnp.concatenate(
                [s0, jnp.zeros((1,) + s0.shape[1:], s0.dtype)], axis=0
            )
            u, _ = causal_conv1d(grid_x, h0c, conv_w, conv_b)  # (R+1,T,D) f32
            dt, b, c = ssm_inputs(u.reshape((r + 1) * t, d_inner))
            dt = jnp.where(
                valid.reshape(-1)[:, None], dt, 0.0
            ).reshape(r + 1, t, d_inner)
            y, s1 = selective_scan(
                u, dt, a,
                b.reshape(r + 1, t, n), c.reshape(r + 1, t, n), dsk, s0,
            )
            core = y[row, col]  # (T, D) — pads read scratch garbage
            # conv history: last K-1 real inputs per request
            window = jnp.concatenate([h0c, grid_x.astype(h0c.dtype)], axis=1)
            n_r = (qsl[1:] - qsl[:-1])[:r]
            hist_idx = n_r[:, None] + jnp.arange(
                hp["k"] - 1, dtype=jnp.int32
            )[None]
            h1c = jnp.take_along_axis(window[:r], hist_idx[..., None], axis=1)
            ok = slots < rslot
            wslot = jnp.where(ok, slots, rslot)
            lin_state_l = _scatter_pad(lin_state_l, wslot, s1[:r])
            conv_state_l = _scatter_pad(
                conv_state_l, wslot, h1c.astype(conv_state_l.dtype)
            )
        else:
            # exact per-token scan fallback (very long mixed batches)
            st0 = jnp.concatenate(
                [lin_state_l,
                 jnp.zeros((1,) + lin_state_l.shape[1:], lin_state_l.dtype)],
                axis=0,
            )
            cv0 = jnp.concatenate(
                [conv_state_l,
                 jnp.zeros((1,) + conv_state_l.shape[1:], conv_state_l.dtype)],
                axis=0,
            )

            def tok_step(carry, xs):
                st, cv = carry
                x_t, slot, pos = xs
                is_fresh = pos == 0
                s0 = jnp.where(is_fresh, 0.0, st[slot])
                h0c = jnp.where(is_fresh, 0.0, cv[slot])
                u, h1c = causal_conv1d(
                    x_t[None, None, :], h0c[None], conv_w, conv_b
                )
                u = u[:, 0]
                dt, b, c = ssm_inputs(u)
                y, s1 = selective_scan_step(u, dt, a, b, c, dsk, s0[None])
                st = st.at[slot].set(s1[0])
                cv = cv.at[slot].set(h1c[0].astype(cv.dtype))
                return (st, cv), y[0]

            (st1, cv1), core = jax.lax.scan(
                tok_step,
                (st0, cv0),
                (x, jnp.minimum(tok_slot, rslot), md.positions),
            )
            lin_state_l = st1[:rslot]
            conv_state_l = cv1[:rslot]

    gated = core * jax.nn.silu(z.astype(jnp.float32))
    out = apply_linear(lp["out_proj"], gated.astype(normed.dtype))
    return out, lin_state_l, conv_state_l


def _scatter_pad(pool, idx, val):
    return pool.at[idx].set(val, mode="drop")


def _mixer2(lp, normed, lin_state_l, conv_state_l, md, cfg, hp, num_slots):
    """One Mamba-2 (SSD) mixer: per-head scalar decay, grouped B/C, conv
    over the fused [x|B|C] stream, gated RMSNorm (HF Mamba2Mixer
    torch_forward math)."""
    t = normed.shape[0]
    heads, hd, g, n = hp["heads"], hp["hd"], hp["g"], hp["n"]
    d_inner, conv_dim = hp["d_inner"], hp["conv_dim"]
    rslot = lin_state_l.shape[0]
    slots = md.state_idx
    tok_pad = md.slot_mapping >= num_slots
    tok_slot = jnp.where(tok_pad, rslot, slots[md.req_idx])

    proj = apply_linear(lp["in_proj"], normed)
    z, xbc, dtr = jnp.split(proj, [d_inner, d_inner + conv_dim], axis=-1)
    conv_w = lp["conv_w"]  # (K, conv_dim)
    conv_b = lp.get("conv_b")
    a = -jnp.exp(lp["a_log"].astype(jnp.float32))  # (H,)
    dsk = lp["d_skip"].astype(jnp.float32)  # (H,)
    lo, hi = hp["limit"]

    def make_dt(dtr_rows):  # (..., H) raw → post-softplus/clamp f32
        dt = jax.nn.softplus(
            dtr_rows.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32)
        )
        if lo != 0.0 or hi != float("inf"):
            dt = jnp.clip(dt, lo, hi)
        return dt

    def split_xbc(u):  # post-conv (..., conv_dim) f32 → x (…H,P), B/C (…H,N)
        x, b, c = jnp.split(u, [d_inner, d_inner + g * n], axis=-1)
        x = x.reshape(x.shape[:-1] + (heads, hd))
        rep = heads // g
        b = jnp.repeat(b.reshape(b.shape[:-1] + (g, n)), rep, axis=-2)
        c = jnp.repeat(c.reshape(c.shape[:-1] + (g, n)), rep, axis=-2)
        return x, b, c

    if md.decode_only:
        r = slots.shape[0]
        safe = jnp.minimum(slots, rslot - 1)
        hist = conv_state_l[safe]
        u, hist_new = causal_conv1d(xbc[:r][:, None, :], hist, conv_w, conv_b)
        x, b, c = split_xbc(u[:, 0])
        dt = make_dt(dtr[:r])
        h0 = lin_state_l[safe]
        y, h1 = ssd_step(x, dt, a, b, c, dsk, h0)
        ok = slots < rslot
        wslot = jnp.where(ok, slots, rslot)
        lin_state_l = _scatter_pad(lin_state_l, wslot, h1)
        conv_state_l = _scatter_pad(
            conv_state_l, wslot, hist_new.astype(conv_state_l.dtype)
        )
        core = y.reshape(r, d_inner)
        if t > r:
            core = jnp.concatenate(
                [core, jnp.zeros((t - r, d_inner), jnp.float32)], axis=0
            )
    else:
        r = slots.shape[0]
        # chunked SSD peak: per-chunk states (T/C · H·P·N) + (C,C) blocks
        ck = 64
        grid_bytes = (r + 1) * t * heads * 4 * (
            ck + hd * n // ck + 2 * (hd + n)
        )
        grid_ok = grid_bytes <= _GRID_MAX_BYTES
        qsl = md.query_start_loc
        col = jnp.arange(t, dtype=jnp.int32) - qsl[md.req_idx]
        row = jnp.where(tok_pad, r, md.req_idx)
        first_pos = md.positions[jnp.minimum(qsl[:-1], t - 1)]
        safe = jnp.minimum(slots, rslot - 1)
        fresh = (first_pos == 0)[:, None]
        if grid_ok:
            grid_xbc = jnp.zeros((r + 1, t, conv_dim), xbc.dtype).at[
                row, col
            ].set(xbc, mode="drop")
            grid_dtr = jnp.zeros((r + 1, t, heads), jnp.float32).at[
                row, col
            ].set(dtr.astype(jnp.float32), mode="drop")
            valid = jnp.zeros((r + 1, t), bool).at[row, col].set(
                ~tok_pad, mode="drop"
            )
            h0c = jnp.where(
                fresh[..., None], 0.0, conv_state_l[safe]
            ).astype(conv_state_l.dtype)
            s0 = jnp.where(fresh[..., None, None], 0.0, lin_state_l[safe])
            h0c = jnp.concatenate(
                [h0c, jnp.zeros((1,) + h0c.shape[1:], h0c.dtype)], axis=0
            )
            s0 = jnp.concatenate(
                [s0, jnp.zeros((1,) + s0.shape[1:], s0.dtype)], axis=0
            )
            u, _ = causal_conv1d(grid_xbc, h0c, conv_w, conv_b)
            x, b, c = split_xbc(u)
            dt = jnp.where(valid[..., None], make_dt(grid_dtr), 0.0)
            y, s1 = ssd_scan_chunked(x, dt, a, b, c, dsk, s0, chunk=ck)
            core = y.reshape(r + 1, t, d_inner)[row, col]
            window = jnp.concatenate([h0c, grid_xbc.astype(h0c.dtype)], axis=1)
            n_r = (qsl[1:] - qsl[:-1])[:r]
            hist_idx = n_r[:, None] + jnp.arange(
                hp["k"] - 1, dtype=jnp.int32
            )[None]
            h1c = jnp.take_along_axis(window[:r], hist_idx[..., None], axis=1)
            ok = slots < rslot
            wslot = jnp.where(ok, slots, rslot)
            lin_state_l = _scatter_pad(lin_state_l, wslot, s1[:r])
            conv_state_l = _scatter_pad(
                conv_state_l, wslot, h1c.astype(conv_state_l.dtype)
            )
        else:
            st0 = jnp.concatenate(
                [lin_state_l,
                 jnp.zeros((1,) + lin_state_l.shape[1:], lin_state_l.dtype)],
                axis=0,
            )
            cv0 = jnp.concatenate(
                [conv_state_l,
                 jnp.zeros((1,) + conv_state_l.shape[1:], conv_state_l.dtype)],
                axis=0,
            )

            def tok_step(carry, xs):
                st, cv = carry
                xbc_t, dtr_t, slot, pos = xs
                is_fresh = pos == 0
                s0 = jnp.where(is_fresh, 0.0, st[slot])
                h0c = jnp.where(is_fresh, 0.0, cv[slot])
                u, h1c = causal_conv1d(
                    xbc_t[None, None, :], h0c[None], conv_w, conv_b
                )
                x, b, c = split_xbc(u[:, 0])
                dt = make_dt(dtr_t[None])
                y, s1 = ssd_step(x, dt, a, b, c, dsk, s0[None])
                st = st.at[slot].set(s1[0])
                cv = cv.at[slot].set(h1c[0].astype(cv.dtype))
                return (st, cv), y[0].reshape(d_inner)

            (st1, cv1), core = jax.lax.scan(
                tok_step,
                (st0, cv0),
                (xbc, dtr, jnp.minimum(tok_slot, rslot), md.positions),
            )
            lin_state_l = st1[:rslot]
            conv_state_l = cv1[:rslot]

    gated = core * jax.nn.silu(z.astype(jnp.float32))
    if hp["rms_norm"]:
        eps = float(cfg.hf_config.get("layer_norm_epsilon", 1e-5))
        gated = gated * jax.lax.rsqrt(
            (gated**2).mean(-1, keepdims=True) + eps
        ) * lp["gated_norm"]
    out = apply_linear(lp["out_proj"], gated.astype(normed.dtype))
    return out, lin_state_l, conv_state_l


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
    if axis_name is not None or ep_axis_name is not None:
        raise NotImplementedError("Mamba runs replicated in v1")
    hp = _hp2(cfg) if _is_m2(cfg) else _hp(cfg)
    eps = float(cfg.hf_config.get("layer_norm_epsilon", cfg.rms_norm_eps))
    num_slots = kv_cache.k.shape[0] * kv_cache.block_size

    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    residual = jnp.zeros_like(hidden)
    lin_state = kv_cache.lin_state
    conv_state = kv_cache.conv_state
    mixer = _mixer2 if _is_m2(cfg) else _mixer
    for l, lp in enumerate(params["layer_list"]):
        normed, residual = fused_add_rms_norm(hidden, residual, lp["ln"], eps)
        out, ls, cs = mixer(
            lp, normed, lin_state[l], conv_state[l], md, cfg, hp, num_slots
        )
        lin_state = lin_state.at[l].set(ls)
        conv_state = conv_state.at[l].set(cs)
        hidden = out
    kv_cache = kv_cache._replace(lin_state=lin_state, conv_state=conv_state)
    hidden = (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)
    hidden = rms_norm(hidden, params["final_norm"], eps)
    return hidden, kv_cache


def compute_logits(params, hidden, cfg: ModelConfig, axis_name=None):
    # forward() already applied the final norm (heterogeneous eps source)
    head = params["lm_head"]
    if isinstance(head, dict):  # int8 weight-only (qc.lm_head_quantized)
        from vllm_metax_tpu.layers.linear import apply_linear

        return apply_linear(head, hidden).astype(jnp.float32)
    return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


def _init_params_m2(cfg: ModelConfig, seed: int) -> dict:
    hp = _hp2(cfg)
    key = jax.random.PRNGKey(seed)
    e = cfg.hidden_size
    d, heads, k = hp["d_inner"], hp["heads"], hp["k"]
    cdim = hp["conv_dim"]
    dt = cfg.dtype

    def dense(kk, shape):
        return (jax.random.normal(kk, shape, jnp.float32) * 0.02).astype(dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        lp = {
            "ln": jnp.ones((e,), jnp.float32),
            "in_proj": {"w": dense(ks[0], (e, d + cdim + heads))},
            "conv_w": dense(ks[1], (k, cdim)),
            "dt_bias": jnp.zeros((heads,), jnp.float32),
            "a_log": jnp.zeros((heads,), jnp.float32),
            "d_skip": jnp.ones((heads,), jnp.float32),
            "out_proj": {"w": dense(ks[2], (d, e))},
        }
        if hp["use_conv_bias"]:
            lp["conv_b"] = jnp.zeros((cdim,), dt)
        if hp["rms_norm"]:
            lp["gated_norm"] = jnp.ones((d,), jnp.float32)
        layers.append(lp)
    return {
        "embed": dense(jax.random.fold_in(key, 999), (cfg.vocab_size, e)),
        "layer_list": layers,
        "final_norm": jnp.ones((e,), jnp.float32),
        "lm_head": dense(jax.random.fold_in(key, 998), (e, cfg.vocab_size)),
    }


def init_params(cfg: ModelConfig, quant_cfg=None, seed: int = 0) -> dict:
    if _is_m2(cfg):
        return _init_params_m2(cfg, seed)
    hp = _hp(cfg)
    key = jax.random.PRNGKey(seed)
    e = cfg.hidden_size
    d, n, k, dtr = hp["d_inner"], hp["n"], hp["k"], hp["dt_rank"]
    dt = cfg.dtype

    def dense(kk, shape):
        return (jax.random.normal(kk, shape, jnp.float32) * 0.02).astype(dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        lp = {
            "ln": jnp.ones((e,), jnp.float32),
            "in_proj": {"w": dense(ks[0], (e, 2 * d))},
            "conv_w": dense(ks[1], (k, d)),
            "x_proj": {"w": dense(ks[2], (d, dtr + 2 * n))},
            "dt_proj": {
                "w": dense(ks[3], (dtr, d)),
                "b": jnp.zeros((d,), dt),
            },
            "a_log": jnp.log(
                jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.float32), (d, n))
            ),
            "d_skip": jnp.ones((d,), jnp.float32),
            "out_proj": {"w": dense(ks[4], (d, e))},
        }
        if hp["use_conv_bias"]:
            lp["conv_b"] = jnp.zeros((d,), dt)
        layers.append(lp)
    return {
        "embed": dense(jax.random.fold_in(key, 999), (cfg.vocab_size, e)),
        "layer_list": layers,
        "final_norm": jnp.ones((e,), jnp.float32),
        "lm_head": dense(jax.random.fold_in(key, 998), (e, cfg.vocab_size)),
    }


def _load_weights_m2(cfg: ModelConfig, reader) -> dict:
    hp = _hp2(cfg)
    dt = cfg.dtype

    def get(name, dtype=None):
        return jnp.asarray(reader.get(name), dtype=dtype or dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"backbone.layers.{i}"
        lp = {
            "ln": get(f"{pre}.norm.weight", jnp.float32),
            "in_proj": {"w": get(f"{pre}.mixer.in_proj.weight").T},
            "conv_w": get(f"{pre}.mixer.conv1d.weight")[:, 0, :].T,
            "dt_bias": get(f"{pre}.mixer.dt_bias", jnp.float32),
            "a_log": get(f"{pre}.mixer.A_log", jnp.float32),
            "d_skip": get(f"{pre}.mixer.D", jnp.float32),
            "out_proj": {"w": get(f"{pre}.mixer.out_proj.weight").T},
        }
        if reader.has(f"{pre}.mixer.conv1d.bias"):
            lp["conv_b"] = get(f"{pre}.mixer.conv1d.bias")
        if hp["rms_norm"]:
            lp["gated_norm"] = get(f"{pre}.mixer.norm.weight", jnp.float32)
        if reader.has(f"{pre}.mixer.in_proj.bias"):
            lp["in_proj"]["b"] = get(f"{pre}.mixer.in_proj.bias")
        if reader.has(f"{pre}.mixer.out_proj.bias"):
            lp["out_proj"]["b"] = get(f"{pre}.mixer.out_proj.bias")
        layers.append(lp)
    embed = get("backbone.embeddings.weight")
    lm_head = (
        get("lm_head.weight").T if reader.has("lm_head.weight") else embed.T
    )
    return {
        "embed": embed,
        "layer_list": layers,
        "final_norm": get("backbone.norm_f.weight", jnp.float32),
        "lm_head": lm_head,
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    if _is_m2(cfg):
        return _load_weights_m2(cfg, reader)
    hp = _hp(cfg)
    dt = cfg.dtype

    def get(name, dtype=None):
        return jnp.asarray(reader.get(name), dtype=dtype or dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"backbone.layers.{i}"
        lp = {
            "ln": get(f"{pre}.norm.weight", jnp.float32),
            "in_proj": {"w": get(f"{pre}.mixer.in_proj.weight").T},
            # conv1d weight (D, 1, K) → (K, D)
            "conv_w": get(f"{pre}.mixer.conv1d.weight")[:, 0, :].T,
            "x_proj": {"w": get(f"{pre}.mixer.x_proj.weight").T},
            "dt_proj": {
                "w": get(f"{pre}.mixer.dt_proj.weight").T,
                "b": get(f"{pre}.mixer.dt_proj.bias"),
            },
            "a_log": get(f"{pre}.mixer.A_log", jnp.float32),
            "d_skip": get(f"{pre}.mixer.D", jnp.float32),
            "out_proj": {"w": get(f"{pre}.mixer.out_proj.weight").T},
        }
        if reader.has(f"{pre}.mixer.conv1d.bias"):
            lp["conv_b"] = get(f"{pre}.mixer.conv1d.bias")
        if reader.has(f"{pre}.mixer.in_proj.bias"):
            lp["in_proj"]["b"] = get(f"{pre}.mixer.in_proj.bias")
        if reader.has(f"{pre}.mixer.out_proj.bias"):
            lp["out_proj"]["b"] = get(f"{pre}.mixer.out_proj.bias")
        layers.append(lp)
    embed = get("backbone.embeddings.weight")
    lm_head = (
        get("lm_head.weight").T if reader.has("lm_head.weight") else embed.T
    )
    return {
        "embed": embed,
        "layer_list": layers,
        "final_norm": get("backbone.norm_f.weight", jnp.float32),
        "lm_head": lm_head,
    }


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    from jax.sharding import PartitionSpec as P

    shape_tree = jax.eval_shape(lambda: init_params(cfg, None, 0))
    return jax.tree_util.tree_map(lambda _: P(), shape_tree)
