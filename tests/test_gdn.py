"""Gated DeltaNet ops vs the transformers torch reference implementations
(modeling_qwen3_next.torch_chunk_gated_delta_rule / _recurrent_ / conv)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _mk(rng, r=2, s=19, h=3, dk=16, dv=8):
    q = rng.standard_normal((r, s, h, dk)).astype(np.float32)
    k = rng.standard_normal((r, s, h, dk)).astype(np.float32)
    v = rng.standard_normal((r, s, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((r, s, h))).astype(np.float32) * 0.3
    beta = rng.random((r, s, h)).astype(np.float32)
    return q, k, v, g, beta


def test_gdn_chunked_matches_torch(rng):
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    from vllm_metax_tpu.ops.gdn import gdn_chunked

    q, k, v, g, beta = _mk(rng)
    r, s, h, dk = q.shape
    dv = v.shape[-1]
    ref_out, ref_state = torch_chunk_gated_delta_rule(
        *(torch.tensor(x) for x in (q, k, v, g, beta)),
        chunk_size=8,
        initial_state=None,
        output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )
    out, state = gdn_chunked(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)),
        state0=jnp.zeros((r, h, dk, dv), jnp.float32),
        chunk=8,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state), ref_state.numpy(), rtol=1e-4, atol=1e-4
    )


def test_gdn_step_matches_torch_recurrent(rng):
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    from vllm_metax_tpu.ops.gdn import gdn_step

    q, k, v, g, beta = _mk(rng, s=6)
    r, s, h, dk = q.shape
    dv = v.shape[-1]
    state0 = rng.standard_normal((r, h, dk, dv)).astype(np.float32) * 0.2
    ref_out, ref_state = torch_recurrent_gated_delta_rule(
        *(torch.tensor(x) for x in (q, k, v, g, beta)),
        initial_state=torch.tensor(state0),
        output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )
    state = jnp.asarray(state0)
    outs = []
    for t in range(s):
        o, state = gdn_step(
            *(jnp.asarray(x[:, t]) for x in (q, k, v)),
            jnp.asarray(g[:, t]),
            jnp.asarray(beta[:, t]),
            state,
        )
        outs.append(np.asarray(o))
    np.testing.assert_allclose(
        np.stack(outs, axis=1), ref_out.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state), ref_state.numpy(), rtol=1e-4, atol=1e-4
    )


def test_gdn_chunked_equals_stepwise(rng):
    """Chunked prefill then stepwise decode must agree with all-stepwise."""
    from vllm_metax_tpu.ops.gdn import gdn_chunked, gdn_step

    q, k, v, g, beta = _mk(rng, s=11)
    r, s, h, dk = q.shape
    dv = v.shape[-1]
    state = jnp.zeros((r, h, dk, dv), jnp.float32)
    ref = []
    for t in range(s):
        o, state = gdn_step(
            *(jnp.asarray(x[:, t]) for x in (q, k, v)),
            jnp.asarray(g[:, t]), jnp.asarray(beta[:, t]), state,
        )
        ref.append(np.asarray(o))
    out, state_c = gdn_chunked(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)),
        state0=jnp.zeros((r, h, dk, dv), jnp.float32), chunk=4,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.stack(ref, 1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state_c), np.asarray(state), rtol=1e-4, atol=1e-4
    )


def test_gdn_pad_rows_are_state_neutral(rng):
    from vllm_metax_tpu.ops.gdn import gdn_chunked

    q, k, v, g, beta = _mk(rng, r=1, s=8)
    r, s, h, dk = q.shape
    dv = v.shape[-1]
    state0 = jnp.zeros((r, h, dk, dv), jnp.float32)
    out_a, state_a = gdn_chunked(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), state0=state0, chunk=4
    )
    # append 5 junk rows with beta=0, g=0 — outputs/state must not change
    pad = 5
    qp = np.concatenate([q, rng.standard_normal((r, pad, h, dk)).astype(np.float32)], 1)
    kp = np.concatenate([k, rng.standard_normal((r, pad, h, dk)).astype(np.float32)], 1)
    vp = np.concatenate([v, rng.standard_normal((r, pad, h, dv)).astype(np.float32)], 1)
    gp = np.concatenate([g, np.zeros((r, pad, h), np.float32)], 1)
    bp = np.concatenate([beta, np.zeros((r, pad, h), np.float32)], 1)
    out_b, state_b = gdn_chunked(
        *(jnp.asarray(x) for x in (qp, kp, vp, gp, bp)), state0=state0, chunk=4
    )
    np.testing.assert_allclose(
        np.asarray(out_b)[:, :s], np.asarray(out_a), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_b), np.asarray(state_a), rtol=1e-5, atol=1e-5
    )


def test_causal_conv_matches_torch(rng):
    from vllm_metax_tpu.ops.gdn import causal_conv1d

    r, s, c, kk = 2, 9, 6, 4
    x = rng.standard_normal((r, s, c)).astype(np.float32)
    w = rng.standard_normal((kk, c)).astype(np.float32)
    hist = rng.standard_normal((r, kk - 1, c)).astype(np.float32)

    # torch depthwise conv over [hist | x], taking the last s outputs
    conv = torch.nn.Conv1d(c, c, kk, groups=c, bias=False,
                           padding=kk - 1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w.T[:, None, :]))
        full = torch.tensor(
            np.concatenate([hist, x], 1).transpose(0, 2, 1)
        )
        ref = torch.nn.functional.silu(conv(full)[..., kk - 1 :][..., :s])
    y, new_state = causal_conv1d(
        jnp.asarray(x), jnp.asarray(hist), jnp.asarray(w)
    )
    np.testing.assert_allclose(
        np.asarray(y), ref.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(new_state),
        np.concatenate([hist, x], 1)[:, -(kk - 1):],
    )
