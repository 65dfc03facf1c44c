"""Selective-scan SSM (Mamba-1) — TPU-native equivalent of the reference's
`selective_scan_fwd` CUDA kernel (csrc/mamba/mamba_ssm/selective_scan_fwd.cu,
bound at csrc/torch_bindings.cpp:363-373).

The diagonal SSM recurrence
    h_t = exp(Δ_t A) ⊙ h_{t-1} + Δ_t B_t x_t,   y_t = C_t · h_t + D x_t
is a first-order linear recurrence, so instead of the reference's
block-parallel CUDA scan it maps onto `jax.lax.associative_scan` over the
sequence axis — log-depth on TPU, fully vectorized over (request, channel,
state). Pad positions are neutralized by forcing Δ=0 (exp(0)=1, b=0 — a
state no-op), which is what lets the engine's ragged padded grids ride
through unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_scan(
    u: jnp.ndarray,  # (R, T, D) post-conv inputs
    dt: jnp.ndarray,  # (R, T, D) f32 discretization step (post-softplus;
    #                    MUST be 0 on pad positions)
    a: jnp.ndarray,  # (D, N) f32 state matrix (negative)
    b: jnp.ndarray,  # (R, T, N) f32 input projection
    c: jnp.ndarray,  # (R, T, N) f32 output projection
    d: jnp.ndarray,  # (D,) f32 skip
    h0: jnp.ndarray,  # (R, D, N) f32 initial state
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (y (R, T, D) f32, h_T (R, D, N) f32)."""
    uf = u.astype(jnp.float32)
    da = jnp.exp(dt[..., None] * a[None, None])  # (R, T, D, N)
    db = dt[..., None] * b[:, :, None, :] * uf[..., None]

    def comb(lhs, rhs):
        al, bl = lhs
        ar, br = rhs
        return al * ar, ar * bl + br

    acc_a, acc_b = jax.lax.associative_scan(comb, (da, db), axis=1)
    h = acc_a * h0[:, None] + acc_b  # (R, T, D, N)
    y = jnp.einsum("rtdn,rtn->rtd", h, c) + d[None, None] * uf
    return y, h[:, -1]


def selective_scan_step(
    u: jnp.ndarray,  # (R, D)
    dt: jnp.ndarray,  # (R, D) f32 post-softplus
    a: jnp.ndarray,  # (D, N)
    b: jnp.ndarray,  # (R, N)
    c: jnp.ndarray,  # (R, N)
    d: jnp.ndarray,  # (D,)
    h: jnp.ndarray,  # (R, D, N) f32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single recurrent step (decode hot path; no sequence axis at all)."""
    uf = u.astype(jnp.float32)
    da = jnp.exp(dt[..., None] * a[None])  # (R, D, N)
    h = da * h + dt[..., None] * b[:, None, :] * uf[..., None]
    y = jnp.einsum("rdn,rn->rd", h, c) + d[None] * uf
    return y, h


def ssd_scan(
    x: jnp.ndarray,  # (R, T, H, P) post-conv inputs (head-split)
    dt: jnp.ndarray,  # (R, T, H) f32 post-softplus (0 on pads)
    a: jnp.ndarray,  # (H,) f32 negative per-head state scalar
    b: jnp.ndarray,  # (R, T, H, N) f32 (groups pre-expanded to heads)
    c: jnp.ndarray,  # (R, T, H, N) f32
    d: jnp.ndarray,  # (H,) f32 skip
    h0: jnp.ndarray,  # (R, H, P, N) f32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mamba-2 SSD recurrence (per-head scalar decay) as an associative
    scan. NOTE: materializes (R, T, H, P, N) f32 — callers cap T·H·P·N and
    fall back to the sequential step path beyond it (a chunked SSD kernel
    is the long-sequence optimization). Returns (y (R,T,H,P), h_T)."""
    xf = x.astype(jnp.float32)
    da = jnp.exp(dt * a[None, None])  # (R, T, H)
    db = dt[..., None, None] * b[:, :, :, None, :] * xf[..., None]

    def comb(lhs, rhs):
        al, bl = lhs
        ar, br = rhs
        return al * ar, ar[..., None, None] * bl + br

    acc_a, acc_b = jax.lax.associative_scan(comb, (da, db), axis=1)
    h = acc_a[..., None, None] * h0[:, None] + acc_b  # (R, T, H, P, N)
    y = jnp.einsum("rthpn,rthn->rthp", h, c) + d[None, None, :, None] * xf
    return y, h[:, -1]


def ssd_step(
    x: jnp.ndarray,  # (R, H, P)
    dt: jnp.ndarray,  # (R, H) f32 post-softplus
    a: jnp.ndarray,  # (H,)
    b: jnp.ndarray,  # (R, H, N)
    c: jnp.ndarray,  # (R, H, N)
    d: jnp.ndarray,  # (H,)
    h: jnp.ndarray,  # (R, H, P, N) f32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single Mamba-2 step (decode hot path)."""
    xf = x.astype(jnp.float32)
    da = jnp.exp(dt * a[None])  # (R, H)
    h = da[..., None, None] * h + (
        dt[..., None, None] * b[:, :, None, :] * xf[..., None]
    )
    y = jnp.einsum("rhpn,rhn->rhp", h, c) + d[None, :, None] * xf
    return y, h


def ssd_scan_chunked(
    x: jnp.ndarray,  # (R, T, H, P)
    dt: jnp.ndarray,  # (R, T, H) f32 post-softplus (0 on pads)
    a: jnp.ndarray,  # (H,) f32 negative
    b: jnp.ndarray,  # (R, T, H, N) f32
    c: jnp.ndarray,  # (R, T, H, N) f32
    d: jnp.ndarray,  # (H,) f32
    h0: jnp.ndarray,  # (R, H, P, N) f32
    chunk: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked SSD (the Mamba-2 paper's state-space-duality form): within a
    chunk the output is an attention-like (C_q·B_k)·decay matmul; across
    chunks only the (H, P, N) state flows. Peak memory is
    O(T·H·(chunk + P·N/chunk)) instead of ssd_scan's O(T·H·P·N). Exactly
    equal to ssd_scan (same recurrence, reassociated)."""
    r, t, h, p_dim = x.shape
    n = b.shape[-1]
    pad = (-t) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (t + pad) // chunk
    xf = x.astype(jnp.float32).reshape(r, nc, chunk, h, p_dim)
    dtc = dt.reshape(r, nc, chunk, h)
    bc = b.reshape(r, nc, chunk, h, n)
    cc = c.reshape(r, nc, chunk, h, n)

    adt = dtc * a[None, None, None]  # (R, NC, C, H) ≤ 0
    cum = jnp.cumsum(adt, axis=2)  # inclusive cumulative decay
    # in-chunk token->token decay: exp(cum_l - cum_m), m ≤ l (diag = own dt)
    diff = cum[:, :, :, None, :] - cum[:, :, None, :, :]  # (R,NC,C,C,H)
    causal = jnp.tril(jnp.ones((chunk, chunk), bool))
    decay = jnp.where(causal[None, None, :, :, None], jnp.exp(diff), 0.0)
    qk = jnp.einsum("rgchn,rgmhn->rgcmh", cc, bc) * decay  # (R,NC,C,C,H)
    dx = dtc[..., None] * xf  # (R, NC, C, H, P) = Δ·x
    y_diag = jnp.einsum("rgcmh,rgmhp->rgchp", qk, dx)

    # per-chunk state contribution: Σ_m exp(cum_end - cum_m) Δ_m b_m⊗x_m
    end_decay = jnp.exp(cum[:, :, -1:, :] - cum)  # (R, NC, C, H)
    cstate = jnp.einsum(
        "rgmhn,rgmhp->rghpn", bc * end_decay[..., None], dx
    )  # (R, NC, H, P, N)
    chunk_decay = jnp.exp(cum[:, :, -1, :])  # (R, NC, H)

    def step(h_in, xs):
        cs, cd = xs  # (R,H,P,N), (R,H)
        h_out = h_in  # state ENTERING the chunk
        h_next = cd[..., None, None] * h_in + cs
        return h_next, h_out

    h_t, h_ins = jax.lax.scan(
        step,
        h0.astype(jnp.float32),
        (cstate.transpose(1, 0, 2, 3, 4), chunk_decay.transpose(1, 0, 2)),
    )
    h_ins = h_ins.transpose(1, 0, 2, 3, 4)  # (R, NC, H, P, N)
    y_off = jnp.einsum(
        "rgchn,rghpn->rgchp", cc * jnp.exp(cum)[..., None], h_ins
    )
    y = (y_diag + y_off).reshape(r, t + pad, h, p_dim)[:, :t]
    y = y + d[None, None, :, None] * x.astype(jnp.float32)[:, :t]
    return y, h_t
