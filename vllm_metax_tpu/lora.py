"""Multi-LoRA serving: batched low-rank adapters over the base linears.

Reference analog: vLLM's LoRA stack exercised by the reference's examples
(examples/offline_inference/multilora_inference.py — LoRARequest, max_loras,
max_lora_rank; lora_with_quantization_inference.py for LoRA over GPTQ/AWQ
bases). The CUDA implementation gathers per-token adapter weights with
punica BGMV kernels; the TPU-native form is MASK-AND-MATMUL:

    xa[t, n, r] = x[t] @ A[n]          (one (T,K)@(K, n*R) MXU pass)
    xa *= onehot(adapter_of_token)[..., None] * scale[n]
    y  += reshape(xa) @ flatten(B)     (one (T, n*R)@(n*R, N) MXU pass)

With n = max_loras (<= 8 typical) and R = max rank (<= 64), both passes are
tiny next to the base GEMM and there are NO per-token gathers — everything
rides the MXU with static shapes. Slot 0 is reserved for "no adapter"
(zero scale), so unadapted tokens pass through untouched.

Adapter banks live INSIDE the layer param dicts (stacked over layers like
the base weights): {"lora_A": (L, n, K, R), "lora_B": (L, n, R, N),
"lora_s": (n,)}. Fused base linears (qkv, gate_up) hold their targets
block-diagonally in the R axis so one einsum covers all of them.

Checkpoint format: HF peft (adapter_config.json + adapter_model.safetensors
with base_model.model.…lora_A/B.weight tensors).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

# fused base linear → (peft target names, column widths fn)
_FUSED_TARGETS = {
    "qkv": ("q_proj", "k_proj", "v_proj"),
    "gate_up": ("gate_proj", "up_proj"),
    "o": ("o_proj",),
    "down": ("down_proj",),
}


@dataclass
class LoRAConfig:
    max_loras: int = 4  # concurrently-loaded adapters (slot 0 = none)
    max_lora_rank: int = 16
    # adapt MoE expert weights too (per-expert A/B banks — memory scales
    # with n_slots x E, so opt-in)
    lora_experts: bool = False

    @property
    def num_slots(self) -> int:
        return self.max_loras + 1  # + the reserved empty slot


@dataclass
class LoRARequest:
    """Per-request adapter handle (mirrors vllm.lora.request.LoRARequest)."""

    lora_name: str
    lora_int_id: int = 0
    lora_path: str = ""


def bank_shapes(cfg, lora_cfg: LoRAConfig) -> dict:
    """Per-target (K, R_total, N) for the llama-family fused layout."""
    e, i = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    r = lora_cfg.max_lora_rank
    return {
        "qkv": (e, 3 * r, (hq + 2 * hkv) * d),
        "o": (hq * d, r, e),
        "gate_up": (e, 2 * r, 2 * i),
        "down": (i, r, e),
    }


def empty_banks(cfg, lora_cfg: LoRAConfig, dtype, targets=None) -> dict:
    """Zero adapter banks for the requested targets, stacked over layers."""
    import jax.numpy as jnp

    n = lora_cfg.num_slots
    nl = cfg.num_hidden_layers
    out = {}
    for name, (k, rt, nn) in bank_shapes(cfg, lora_cfg).items():
        if targets is not None and name not in targets:
            continue
        out[name] = {
            "lora_A": jnp.zeros((nl, n, k, rt), dtype),
            "lora_B": jnp.zeros((nl, n, rt, nn), dtype),
        }
    # scales are per-slot, shared across layers/targets
    out["lora_s"] = jnp.zeros((n,), jnp.float32)
    return out


def empty_expert_banks(cfg, lora_cfg: LoRAConfig, dtype) -> dict:
    """Zero per-expert adapter banks: gate|up block-diagonal in R (like the
    fused dense targets), down separate. (L, n, E, K, R) lora_A /
    (L, n, E, R, N) lora_B per target."""
    import jax.numpy as jnp

    n = lora_cfg.num_slots
    r = lora_cfg.max_lora_rank
    nl = cfg.num_hidden_layers
    e = cfg.num_experts
    h = cfg.hidden_size
    im = cfg.moe_intermediate_size or cfg.intermediate_size
    # NB: lora_s carries a leading L axis so the per-layer `a[l]` slice in
    # the model's layer_fn yields the (n,) slot scales (all layers equal)
    return {
        "experts_gate_up": {
            "lora_A": jnp.zeros((nl, n, e, h, 2 * r), dtype),
            "lora_B": jnp.zeros((nl, n, e, 2 * r, 2 * im), dtype),
            "lora_s": jnp.zeros((nl, n), jnp.float32),
        },
        "experts_down": {
            "lora_A": jnp.zeros((nl, n, e, im, r), dtype),
            "lora_B": jnp.zeros((nl, n, e, r, h), dtype),
            "lora_s": jnp.zeros((nl, n), jnp.float32),
        },
    }


def adapter_expert_banks(tensors: dict, cfg, lora_cfg: LoRAConfig) -> dict:
    """Pack per-expert peft tensors (w1=gate, w3=up block-diagonal in R;
    w2=down) into (L, E, K, R)/(L, E, R, N) arrays, or {} if the adapter
    has no expert targets."""
    r = lora_cfg.max_lora_rank
    nl = cfg.num_hidden_layers
    e = cfg.num_experts
    h = cfg.hidden_size
    im = cfg.moe_intermediate_size or cfg.intermediate_size
    any_expert = any("__experts__" in tensors.get(l, {}) for l in range(nl))
    if not any_expert:
        return {}
    gu_a = np.zeros((nl, e, h, 2 * r), np.float32)
    gu_b = np.zeros((nl, e, 2 * r, 2 * im), np.float32)
    dn_a = np.zeros((nl, e, im, r), np.float32)
    dn_b = np.zeros((nl, e, r, h), np.float32)
    for l in range(nl):
        ex = tensors.get(l, {}).get("__experts__", {})
        for ei, ws in ex.items():
            for j, wn in enumerate(("w1", "w3")):  # gate, up
                w = ws.get(wn)
                if w and "A" in w and "B" in w:
                    ra = w["A"].shape[0]
                    if ra > r:
                        raise ValueError(
                            f"adapter rank {ra} > max_lora_rank {r}"
                        )
                    gu_a[l, ei, :, j * r : j * r + ra] = w["A"].T
                    gu_b[l, ei, j * r : j * r + ra,
                         j * im : j * im + im] = w["B"].T
            w = ws.get("w2")
            if w and "A" in w and "B" in w:
                ra = w["A"].shape[0]
                dn_a[l, ei, :, :ra] = w["A"].T
                dn_b[l, ei, :ra, :] = w["B"].T
    return {
        "experts_gate_up": {"A": gu_a, "B": gu_b},
        "experts_down": {"A": dn_a, "B": dn_b},
    }


def empty_head_banks(cfg, lora_cfg: LoRAConfig, dtype) -> dict:
    """Zero adapter banks for lm_head and the embedding (UNSTACKED — one
    per model, not per layer). lm_head delta adds to the logits; the embed
    delta adds to the token embedding lookup (llama-family forward)."""
    import jax.numpy as jnp

    n = lora_cfg.num_slots
    r = lora_cfg.max_lora_rank
    e, v = cfg.hidden_size, cfg.vocab_size
    return {
        "lm_head_lora": {
            "lora_A": jnp.zeros((n, e, r), dtype),
            "lora_B": jnp.zeros((n, r, v), dtype),
            "lora_s": jnp.zeros((n,), jnp.float32),
        },
        "embed_lora": {
            "lora_A": jnp.zeros((n, v, r), dtype),
            "lora_B": jnp.zeros((n, r, e), dtype),
            "lora_s": jnp.zeros((n,), jnp.float32),
        },
    }


def load_peft_adapter(path: str) -> tuple[dict, float, int]:
    """Read an HF peft adapter directory.

    Returns (tensors {layer: {target: {"A": (r,K), "B": (N,r)}}},
    scaling alpha/r, rank)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    rank = acfg["r"]
    scaling = acfg.get("lora_alpha", rank) / rank
    from safetensors.numpy import load_file

    fname = os.path.join(path, "adapter_model.safetensors")
    raw = load_file(fname)
    out: dict = {}
    for key, val in raw.items():
        # base_model.model.model.layers.{l}.self_attn.q_proj.lora_A.weight
        parts = key.split(".")
        if "layers" not in parts:
            # head adapters: lm_head.lora_A/B, embed_tokens.lora_embedding_A/B
            # (ref surface: punica's lm_head/embedding LoRA in upstream vLLM)
            heads = out.setdefault("__heads__", {})
            if "lm_head" in parts:
                ab = "A" if "lora_A" in key else "B"
                heads.setdefault("lm_head", {})[ab] = np.asarray(
                    val, np.float32
                )
            elif "embed_tokens" in parts:
                ab = "A" if "lora_embedding_A" in key else "B"
                heads.setdefault("embed", {})[ab] = np.asarray(
                    val, np.float32
                )
            continue
        layer = int(parts[parts.index("layers") + 1])
        if "experts" in parts:
            # ...block_sparse_moe.experts.{e}.w{1,2,3}.lora_{A,B}.weight
            e = int(parts[parts.index("experts") + 1])
            wn = next((w for w in ("w1", "w2", "w3") if w in parts), None)
            if wn is None:
                continue
            ab = "A" if "lora_A" in key else "B"
            out.setdefault(layer, {}).setdefault("__experts__", {}).setdefault(
                e, {}
            ).setdefault(wn, {})[ab] = np.asarray(val, np.float32)
            continue
        target = next((t for grp in _FUSED_TARGETS.values() for t in grp
                       if t in parts), None)
        if target is None:
            continue
        ab = "A" if "lora_A" in key else "B"
        out.setdefault(layer, {}).setdefault(target, {})[ab] = np.asarray(
            val, np.float32
        )
    return out, scaling, rank


def adapter_to_banks(tensors: dict, cfg, lora_cfg: LoRAConfig) -> dict:
    """Pack a peft adapter into per-target fused (L, K, R_total, N) blocks:
    A columns and B rows of each fused sub-target occupy its own R slice
    (block-diagonal in R), zeros elsewhere."""
    shapes = bank_shapes(cfg, lora_cfg)
    r = lora_cfg.max_lora_rank
    nl = cfg.num_hidden_layers
    e, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_q_heads, cfg.num_kv_heads
    widths = {
        "qkv": [hq * d, hkv * d, hkv * d],
        "o": [e],
        "gate_up": [cfg.intermediate_size, cfg.intermediate_size],
        "down": [e],
    }
    out = {}
    for name, targets in _FUSED_TARGETS.items():
        k, rt, nn = shapes[name]
        a = np.zeros((nl, k, rt), np.float32)
        b = np.zeros((nl, rt, nn), np.float32)
        present = False
        for l in range(nl):
            lt = tensors.get(l, {})
            col0 = 0
            for j, tgt in enumerate(targets):
                w = lt.get(tgt)
                width = widths[name][j]
                if w is not None and "A" in w and "B" in w:
                    ra = w["A"].shape[0]
                    if ra > r:
                        raise ValueError(
                            f"adapter rank {ra} > max_lora_rank {r}"
                        )
                    a[l, :, j * r : j * r + ra] = w["A"].T  # (K, ra)
                    b[l, j * r : j * r + ra, col0 : col0 + width] = w["B"].T
                    present = True
                col0 += width
        if present:
            out[name] = {"A": a, "B": b}
    heads = tensors.get("__heads__", {})
    hl = heads.get("lm_head")
    if hl and "A" in hl and "B" in hl:
        # peft lm_head: A (r, E), B (V, r) → banks (E, R), (R, V)
        out["lm_head"] = {"A": hl["A"].T, "B": hl["B"].T}
    el = heads.get("embed")
    if el and "A" in el and "B" in el:
        # peft embedding: lora_embedding_A (r, V), lora_embedding_B (E, r);
        # delta_embed = A.T @ B.T → banks (V, R), (R, E)
        out["embed"] = {"A": el["A"].T, "B": el["B"].T}
    return out


class LoRAManager:
    """Slot registry: adapter name → bank slot (1..max_loras)."""

    def __init__(self, lora_cfg: LoRAConfig):
        self.cfg = lora_cfg
        self.slots: dict[str, int] = {}

    def slot_of(self, name) -> int:
        if name is None:
            return 0
        return self.slots[name]

    def assign(self, name: str) -> int:
        if name in self.slots:
            return self.slots[name]
        if len(self.slots) >= self.cfg.max_loras:
            raise RuntimeError(
                f"max_loras={self.cfg.max_loras} adapters already loaded"
            )
        slot = len(self.slots) + 1
        self.slots[name] = slot
        return slot
