"""Gated DeltaNet (Qwen3-Next linear attention).

TPU-native implementation of the FLA gated-delta-rule ops the reference
patches in for Qwen3-Next (vllm_metax/patch/model_executor/kernel/fla.py;
math reference: transformers/models/qwen3_next/modeling_qwen3_next.py
torch_chunk_gated_delta_rule / torch_recurrent_gated_delta_rule).

State per (request, head): S (Dk, Dv) f32 — the delta-rule fast-weight
matrix. Per token t:
    S ← S·exp(g_t);  Δ = β_t·(v_t − k_tᵀS);  S ← S + k_t Δᵀ;  o_t = q_tᵀS

Two execution shapes:
- `gdn_step`: one token per request, fully vectorized over (R, H) — the
  decode hot path (no sequence loop at all).
- `gdn_chunked`: (R, S, ...) padded per-request grids for prefill. The
  in-chunk (I + L)⁻¹ forward substitution of the reference becomes a
  batched triangular solve; chunks advance under lax.scan. Padding rows
  MUST carry β=0 and g=0 — then Δ=0 and exp(0)=1, so pads are state
  no-ops (this is what lets the engine's ragged token batches ride a
  padded grid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


def gdn_step(
    q: jnp.ndarray,  # (R, H, Dk)
    k: jnp.ndarray,  # (R, H, Dk)
    v: jnp.ndarray,  # (R, H, Dv)
    g: jnp.ndarray,  # (R, H) f32 log-decay (≤ 0)
    beta: jnp.ndarray,  # (R, H) f32
    state: jnp.ndarray,  # (R, H, Dk, Dv) f32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One recurrent delta-rule step (ref: torch_recurrent_gated_delta_rule).
    Returns (out (R, H, Dv) f32, new state)."""
    scale = q.shape[-1] ** -0.5
    qf = l2norm(q) * scale
    kf = l2norm(k)
    vf = v.astype(jnp.float32)
    state = state * jnp.exp(g.astype(jnp.float32))[..., None, None]
    kv_mem = jnp.einsum("rhk,rhkv->rhv", kf, state)
    delta = (vf - kv_mem) * beta.astype(jnp.float32)[..., None]
    state = state + jnp.einsum("rhk,rhv->rhkv", kf, delta)
    out = jnp.einsum("rhk,rhkv->rhv", qf, state)
    return out, state


def gdn_chunked(
    q: jnp.ndarray,  # (R, S, H, Dk) — S padded to a chunk multiple
    k: jnp.ndarray,  # (R, S, H, Dk)
    v: jnp.ndarray,  # (R, S, H, Dv)
    g: jnp.ndarray,  # (R, S, H) f32 log-decay; 0 on pad rows
    beta: jnp.ndarray,  # (R, S, H) f32; 0 on pad rows
    state0: jnp.ndarray,  # (R, H, Dk, Dv) f32 initial state
    chunk: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked gated delta rule (ref: torch_chunk_gated_delta_rule with
    use_qk_l2norm_in_kernel=True). Returns (out (R, S, H, Dv) f32, state)."""
    r, s, h, dk = q.shape
    dv = v.shape[-1]
    pad = (-s) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        beta = jnp.pad(beta, ((0, 0), (0, pad), (0, 0)))
    nc = (s + pad) // chunk
    scale = dk**-0.5

    def to_chunks(x, d):  # (R, S, H, D) → (R, H, NC, C, D)
        return x.reshape(r, nc, chunk, h, d).transpose(0, 3, 1, 2, 4)

    qf = to_chunks(l2norm(q) * scale, dk)
    kf = to_chunks(l2norm(k), dk)
    vf = to_chunks(v.astype(jnp.float32), dv)
    gf = (
        g.astype(jnp.float32).reshape(r, nc, chunk, h).transpose(0, 3, 1, 2)
    )  # (R, H, NC, C)
    bf = beta.astype(jnp.float32).reshape(r, nc, chunk, h).transpose(0, 3, 1, 2)

    v_beta = vf * bf[..., None]
    k_beta = kf * bf[..., None]
    gcs = jnp.cumsum(gf, axis=-1)  # in-chunk cumulative decay
    tril = jnp.tril(jnp.ones((chunk, chunk), bool), -1)
    decay = jnp.where(
        tril, jnp.exp(gcs[..., :, None] - gcs[..., None, :]), 0.0
    )  # strictly-lower (C, C) decay between in-chunk positions
    eye = jnp.eye(chunk, dtype=jnp.float32)

    # T = (I + L)^-1 with L = (k_beta @ k^T · decay) strictly lower — the
    # reference's forward-substitution loop as one batched triangular solve
    lmat = jnp.einsum("rhncd,rhnmd->rhncm", k_beta, kf) * decay
    t_inv = jax.scipy.linalg.solve_triangular(
        eye + lmat, jnp.broadcast_to(eye, lmat.shape), lower=True
    )
    attn = t_inv - eye  # matches the reference's in-place result (pre +I)
    w = attn @ v_beta + v_beta  # == (attn + I) @ v_beta
    u = (attn + eye) @ (k_beta * jnp.exp(gcs)[..., None])

    # causal in-chunk q·k attention weights (diagonal included)
    qk = jnp.einsum("rhncd,rhnmd->rhncm", qf, kf)
    causal = jnp.tril(jnp.ones((chunk, chunk), bool))
    qk_decay = jnp.where(causal, jnp.exp(gcs[..., :, None] - gcs[..., None, :]), 0.0)
    qk = qk * qk_decay

    def chunk_step(state, xs):
        q_i, k_i, w_i, u_i, g_i, qk_i = xs
        # v' = u_i @ S ; v_new = w_i - v'
        v_new = w_i - u_i @ state
        inter = (q_i * jnp.exp(g_i)[..., None]) @ state
        out_i = inter + qk_i @ v_new
        g_last = g_i[..., -1]
        state = state * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "rhcd,rhcv->rhdv",
            k_i * jnp.exp(g_last[..., None] - g_i)[..., None],
            v_new,
        )
        return state, out_i

    xs = (
        qf.transpose(2, 0, 1, 3, 4),
        kf.transpose(2, 0, 1, 3, 4),
        w.transpose(2, 0, 1, 3, 4),
        u.transpose(2, 0, 1, 3, 4),
        gcs.transpose(2, 0, 1, 3),
        qk.transpose(2, 0, 1, 3, 4),
    )
    state, outs = jax.lax.scan(chunk_step, state0.astype(jnp.float32), xs)
    # outs: (NC, R, H, C, Dv) → (R, S+pad, H, Dv)
    out = outs.transpose(1, 0, 3, 2, 4).reshape(r, nc * chunk, h, dv)
    return out[:, :s], state


def causal_conv1d(
    x: jnp.ndarray,  # (R, S, C) inputs this step
    conv_state: jnp.ndarray,  # (R, K-1, C) trailing inputs from before
    weight: jnp.ndarray,  # (K, C) depthwise taps
    bias: jnp.ndarray = None,  # (C,) optional (Mamba uses conv bias)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depthwise causal conv + SiLU (ref: torch_causal_conv1d_update /
    causal_conv1d_fn with activation='silu'). Returns (y (R,S,C), new
    conv_state)."""
    r, s, c = x.shape
    kk = weight.shape[0]
    full = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    # y[t] = Σ_j w[j] · full[t + j]   (window ending at x[t])
    y = jnp.zeros((r, s, c), jnp.float32)
    for j in range(kk):  # static tiny kernel (4)
        y = y + full[:, j : j + s, :].astype(jnp.float32) * weight[j][None, None, :].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, None, :]
    new_state = full[:, s : s + kk - 1, :]
    return jax.nn.silu(y), new_state
