"""Model runner: turns a SchedulerOutput into one jitted TPU step.

Analog of vLLM v1's GPUModelRunner (which the reference configures at
platform.py:124-125) redesigned for XLA's static-shape world:

- every step's (num_tokens, num_reqs) is padded up to a small set of compile
  buckets, so the engine runs a handful of pre-compiled XLA programs — this
  replaces both CUDA-graph capture and torch.compile plumbing
- metadata (block tables, slot mapping, positions) is assembled host-side in
  numpy (the reference does the same CPU-side build, flash_attn.py:286), then
  shipped as one small transfer
- the KV cache is donated through the jitted step, so XLA updates it in place
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.config import EngineConfig
from vllm_metax_tpu.core.scheduler import SchedulerOutput
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.models.registry import get_model
from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.kv_cache import new_kv_cache
from vllm_metax_tpu.sample.params import SamplingParams
from vllm_metax_tpu.sample.sampler import (
    TOP_K_CAP as _SAMPLER_TOP_K_CAP,
    SamplerOutput,
    SamplingTensors,
    apply_penalties,
    sample,
)
from vllm_metax_tpu.utils import cdiv, default_token_buckets, pick_bucket

logger = init_logger(__name__)

# top-k entries returned per prompt position for prompt_logprobs (the
# engine cap, like vLLM's max_logprobs default)
_PLP_TOPK = 16


@dataclass
class CachedReqState:
    token_ids: list[int]  # prompt + generated (runner-side mirror)
    block_ids: list[int]
    sampling_params: SamplingParams
    prompt_len: int = 0
    num_computed_tokens: int = 0
    generator_seed: Optional[int] = None
    constraint: Optional[object] = None  # structured-output FSM
    eos_token_id: Optional[int] = None
    lora_slot: int = 0  # adapter bank slot (0 = no adapter)
    # multimodal (mrope models): {"embeds": np (Nimg, H) fp32 vision
    # embeddings, "is_img": np bool (prompt_len,), "img_ord": np int32
    # image-token ordinal per prompt position, "pos3": np (3, prompt_len)
    # mrope rows, "delta": int decode rope offset}
    mm: Optional[dict] = None
    # prompt-logprob accumulator (SamplingParams.prompt_logprobs): one
    # {token_id: logprob} per prompt position ≥ 1, built up across chunked-
    # prefill steps (ref: tests/v1/engine/test_output_processor.py:119-133)
    prompt_lp_acc: Optional[list] = None


@dataclass
class ModelRunnerOutput:
    req_ids: list[str] = field(default_factory=list)
    sampled_token_ids: list[list[int]] = field(default_factory=list)
    # per request: list per new token of {token_id: logprob} (top-k + chosen)
    logprobs: list[Optional[list[dict[int, float]]]] = field(default_factory=list)
    # MTP/EAGLE draft proposals for the NEXT step (engine feeds them back to
    # the scheduler's requests); draft_parents present for TREE drafts
    # (parent index per draft, -1 = committed root)
    draft_tokens: dict[str, list[int]] = field(default_factory=dict)
    draft_parents: dict[str, list[int]] = field(default_factory=dict)
    # per request that just finished prefill with prompt_logprobs set:
    # [None, {tok: lp}, ...] — one entry per prompt position
    prompt_logprobs: dict[str, list] = field(default_factory=dict)


class ModelRunner:
    def __init__(self, config: EngineConfig, params=None, mesh=None):
        self.config = config
        self._warned_top_k_cap = False
        self.model_cfg = config.model_config
        self.cache_cfg = config.cache_config
        self.model = get_model(self.model_cfg.architecture)
        self.mesh = mesh
        self.tp_size = config.parallel_config.tensor_parallel_size if mesh else 1
        self.ep_size = config.parallel_config.expert_parallel_size if mesh else 1
        self.pp_size = (
            config.parallel_config.pipeline_parallel_size if mesh else 1
        )
        self.dcp_size = (
            config.parallel_config.decode_context_parallel_size if mesh else 1
        )
        if self.dcp_size > 1:
            if config.cache_config.num_blocks % self.dcp_size:
                raise ValueError(
                    f"num_blocks={config.cache_config.num_blocks} must divide "
                    f"decode_context_parallel_size={self.dcp_size}"
                )
            # MLA latent caches shard over dcp like GQA pools (rank-local
            # pages + distributed-softmax combine, models/deepseek.py
            # mla_attention; ref: mla/common.py:796-883 + cp_gather_cache).
            # The V3.2 sparse indexer is dcp-aware too: rank-local indexer
            # logits pmax-merge into the exact global top-k, and the sparse
            # MLA consumer LSE-combines over owned rows (indexer_topk /
            # mla_sparse_attention_xla in models/deepseek.py; ref:
            # cp_gather_indexer_k_quant_cache, csrc/cache_kernels.cu:1274).
        spec = config.speculative_config
        self.mtp = bool(
            spec is not None
            and spec.method in ("mtp", "eagle")
            and spec.enabled
        )
        if self.mtp:
            if not hasattr(self.model, "mtp_forward"):
                raise ValueError(
                    f"{self.model_cfg.architecture} has no "
                    f"{spec.method} draft head"
                )
            if self.pp_size > 1:
                # pp: the draft layer would need a stage assignment + an
                # extra hidden-state hop; dcp is supported (the draft
                # layer's pages shard with the pool, localized at the call)
                raise NotImplementedError("mtp spec decode with pp")
            if config.scheduler_config.num_decode_steps > 1:
                raise ValueError(
                    "mtp spec decode and multi-step decode are mutually "
                    "exclusive (drafts make every decode step a verify step)"
                )
        if self.pp_size > 1:
            if self.model_cfg.num_hidden_layers % self.pp_size:
                raise ValueError(
                    f"num_hidden_layers={self.model_cfg.num_hidden_layers} "
                    f"must divide pipeline_parallel_size={self.pp_size}"
                )
            if not hasattr(self.model, "run_layers"):
                raise ValueError(
                    f"{self.model_cfg.architecture} does not support pipeline "
                    "parallelism (model module lacks embed/run_layers/finalize)"
                )
        if self.ep_size > 1:
            if self.model_cfg.num_experts % self.ep_size:
                raise ValueError(
                    f"num_experts={self.model_cfg.num_experts} must divide "
                    f"expert_parallel_size={self.ep_size}"
                )
        if self.tp_size > 1:
            mc = self.model_cfg
            kv_ok = mc.use_mla or mc.num_kv_heads % self.tp_size == 0
            if mc.num_q_heads % self.tp_size or not kv_ok:
                raise ValueError(
                    f"head counts ({mc.num_q_heads}q/{mc.num_kv_heads}kv) must "
                    f"divide tensor_parallel_size={self.tp_size}"
                )
        self.rng = np.random.default_rng(config.load_config.seed)
        self.lora_cfg = config.lora_config
        self.lora_mgr = None
        if self.lora_cfg is not None:
            from vllm_metax_tpu.lora import LoRAManager

            self.lora_mgr = LoRAManager(self.lora_cfg)

        if params is None:
            params = self._load_params()
        params = self._finalize_quant_layout(params)
        params = self._init_lora_banks(params)
        if self._is_sharded:
            params = self._shard_params(params)
        self.params = params

        cc = self.cache_cfg
        nl = self.model.kv_cache_spec(self.model_cfg)["num_layers"]
        self._alloc_kv_cache()
        # per-layer slot space; pads use an >=all-layers sentinel so adding a
        # layer offset keeps them out of bounds
        self.num_slots = nl * cc.num_blocks * cc.block_size
        self.max_blocks_per_req = cdiv(self.model_cfg.max_model_len, cc.block_size)

        sched = config.scheduler_config
        self.token_buckets = default_token_buckets(sched.max_num_batched_tokens)
        self.req_buckets = default_token_buckets(sched.max_num_seqs, min_bucket=8)
        self.hist_buckets = default_token_buckets(
            self.model_cfg.max_model_len, min_bucket=128
        )

        self.requests: dict[str, CachedReqState] = {}
        self._host_params = None  # sleep-mode weight backup
        # jitted step variants keyed by the static sampler mode
        # (all_greedy, need_logprobs) — a pure-greedy no-logprob step is a
        # single argmax, the common serving case
        self._step_fns: dict[tuple[bool, bool], object] = {}
        self._multi_step_fns: dict[tuple, object] = {}
        self._msd_cache = None  # warm multi-step-window device inputs
        # (src_slot, dst_slot) KV row moves from tree-spec path compaction,
        # applied across all layers after each verify step
        self._kv_moves: list[tuple[int, int]] = []
        self._kv_move_fn = None
        self._spec_branching = (
            getattr(spec, "speculative_branching", 1) if self.mtp else 1
        )
        # mrope models (Qwen-VL family): the rotary angle position differs
        # from the sequence position — all steps carry md.mrope_positions
        self._is_mrope = bool(
            (self.model_cfg.rope_scaling or {}).get("mrope_section")
        )
        # hybrid linear-attention state slots: _alloc_kv_cache (which runs
        # earlier in __init__) populates these for hybrid models
        if not hasattr(self, "_state_free"):
            self._state_free: Optional[list] = None
            self._state_slots: dict[str, int] = {}

    def rebalance_experts(self, loads) -> None:
        """EPLB: re-permute the physical expert placement so per-rank load
        evens out (ref: fused_moe.py:1273 expert rearrangement). `loads` is
        (E,) or (L_moe, E) per-expert load statistics; routing stays logical
        via the per-layer expert_map applied before dispatch."""
        from vllm_metax_tpu.parallel.eplb import balanced_placement

        group_key = None
        for gk in ("layers", "moe_layers"):
            if gk in self.params and "experts_gate_up" in self.params[gk]:
                group_key = gk
                break
        if group_key is None:
            raise ValueError("model has no expert banks to rebalance")
        group = dict(self.params[group_key])
        any_leaf = next(iter(group["experts_gate_up"].values()))
        n_layers, n_exp = any_leaf.shape[0], any_leaf.shape[1]
        ep = max(self.ep_size, 1)
        loads = np.atleast_2d(np.asarray(loads, np.float64))
        if loads.shape[0] == 1:
            loads = np.repeat(loads, n_layers, axis=0)
        placement = np.stack(
            [balanced_placement(loads[i], ep) for i in range(n_layers)]
        ).astype(np.int32)  # (L, E) logical → NEW physical
        inv = np.argsort(placement, axis=1).astype(np.int32)  # new phys → logical
        old_map = group.get("expert_map")
        if old_map is None:
            src = inv  # banks currently in logical order
        else:
            # banks currently at OLD physical slots: new slot p pulls from
            # old_map[logical at p] = old_map[inv[p]]
            src = np.take_along_axis(np.asarray(old_map), inv, axis=1)
        src_dev = jnp.asarray(src)

        def perm(a):
            out = jax.vmap(lambda x, i: jnp.take(x, i, axis=0))(a, src_dev)
            return jax.device_put(out, a.sharding)

        for key in ("experts_gate_up", "experts_down"):
            group[key] = {k: perm(a) for k, a in group[key].items()}
        group["expert_map"] = jnp.asarray(placement)
        params = dict(self.params)
        params[group_key] = group
        self.params = params
        # the params pytree gained/changed leaves — drop cached executables
        self._step_fns.clear()
        self._multi_step_fns.clear()
        self._msd_cache = None

    def _build_state_idx(self, req_ids, rb):
        """Per-row linear-attention state slot; RSLOT sentinel on pad rows."""
        if self._state_free is None:
            return None
        rslot = self.kv_cache.lin_state.shape[1]
        si = np.full(rb, rslot, np.int32)
        for i, rid in enumerate(req_ids):
            si[i] = self._state_slots[rid]
        return jnp.asarray(si)

    def _apply_kv_moves(self) -> None:
        """Tree-spec KV compaction: copy accepted nodes' rows to their
        path-order slots across all layers (ops/kv_cache.py move_kv_slots).
        Padded to a small bucket so the jitted move is shape-stable."""
        from vllm_metax_tpu.ops.kv_cache import move_kv_slots

        moves, self._kv_moves = self._kv_moves, []
        cap = 8
        while cap < len(moves):
            cap *= 2
        src = np.full(cap, self.num_slots, np.int32)
        dst = np.full(cap, self.num_slots, np.int32)
        for j, (s_, d_) in enumerate(moves):
            src[j], dst[j] = s_, d_
        nb_layer = self.cache_cfg.num_blocks

        if self._kv_move_fn is None:
            if self._is_sharded:
                from jax.sharding import PartitionSpec as P

                kv_specs = self._kv_specs()
                fn = jax.shard_map(
                    lambda kv, s, d: move_kv_slots(kv, s, d, nb_layer),
                    mesh=self.mesh,
                    in_specs=(kv_specs, P(), P()),
                    out_specs=kv_specs,
                    check_vma=False,
                )
            else:
                fn = lambda kv, s, d: move_kv_slots(kv, s, d, nb_layer)  # noqa
            self._kv_move_fn = jax.jit(fn, donate_argnums=(0,))
        self.kv_cache = self._kv_move_fn(
            self.kv_cache, jnp.asarray(src), jnp.asarray(dst)
        )

    def _build_prefill_requant(self, params):
        """Prefill int8-requant bank (envs.METAX_TPU_PREFILL_REQUANT): for
        every stacked packed-int4 linear, dequantize each layer and
        requantize per-output-channel int8 (w8p (L,K,N) int8 + s8p (L,1,N)).
        Prefill-sized GEMMs (T >= METAX_TPU_PREFILL_MIN_T) then run W8A8 on
        the int8 MXU with a single per-channel epilogue instead of the W4A8
        per-group VPU epilogue (layers/linear.py). Decode keeps the int4
        bank — half the weight bytes on the memory-bound path. Runs BEFORE
        tiling/TP repack, so w_p4 is still globally split-halves packed.
        Per-layer jit keeps the f32 dequant workspace to one layer (~0.5GB
        at 8B shapes). Ref analog: shape-keyed GEMM dispatch,
        csrc/quantization/gptq/q_gemm.cu:2373 region."""
        import os

        import jax as _jax
        import jax.numpy as _jnp

        from vllm_metax_tpu.ops.quant import (
            dequant_int4,
            quantize_int8_channel,
        )

        @_jax.jit
        def _requant_layer(wl, sl, zl):
            return quantize_int8_channel(dequant_int4(wl, sl, zl, _jnp.float32))

        # scope "mlp" (default): only gate_up/down get the int8 copy — 80%
        # of prefill FLOPs for ~5.6GB at 8B shapes; "all" adds qkv/o
        # (~7GB total — did not fit next to the KV pool on 16GB v5e)
        scope = os.environ.get("METAX_TPU_PREFILL_REQUANT_SCOPE", "mlp")
        scope_keys = {
            "mlp": ("gate_up", "down", "gate_up_shared", "down_shared",
                    "fc_in", "fc_out", "mlp_up", "mlp_down"),
            # tightest-memory option: only the largest GEMM (2/3 of MLP
            # FLOPs) gets the int8 copy
            "gate_up": ("gate_up", "gate_up_shared", "mlp_up", "fc_in"),
        }.get(scope)

        def walk(node, name=""):
            if not isinstance(node, dict):
                return node
            out = {k: walk(v, k) for k, v in node.items()}
            if scope_keys is not None and name not in scope_keys:
                return out
            if (
                "w_p4" in out
                and not isinstance(out["w_p4"], dict)
                and out["w_p4"].ndim == 3
                and "s" in out
                and "zs" in out
            ):
                import functools as _ft

                nl, k2, n = out["w_p4"].shape

                # incremental donated inserts keep the transient peak to
                # bank + ONE layer's f32 dequant workspace (a jnp.stack of
                # per-layer arrays would briefly hold the bank twice)
                @_ft.partial(_jax.jit, donate_argnums=(0, 1))
                def _insert(bank, scales, w8, s8, i):
                    return (
                        _jax.lax.dynamic_update_index_in_dim(bank, w8, i, 0),
                        _jax.lax.dynamic_update_index_in_dim(
                            scales, s8, i, 0
                        ),
                    )

                bank = _jnp.zeros((nl, 2 * k2, n), _jnp.int8)
                scales = _jnp.zeros((nl, 1, n), _jnp.float32)
                for li in range(nl):
                    w8, s8 = _requant_layer(
                        out["w_p4"][li], out["s"][li], out["zs"][li]
                    )
                    bank, scales = _insert(
                        bank, scales, w8, s8, _jnp.int32(li)
                    )
                out["w8p"] = bank
                out["s8p"] = scales
            return out

        return walk(params)

    def _finalize_quant_layout(self, params):
        """Convert stacked packed-int4 linears to the pre-tiled contiguous
        layout the Pallas kernel streams at full HBM bandwidth (see
        quant_matmul.tile_packed_weight). Runs pre-shard: the tile dim is
        rank-major so the TP split stays contiguous. Skipped off-TPU (the XLA
        fallback handles both layouts; tests exercise tiled via interpret)."""
        import jax as _jax

        from vllm_metax_tpu import envs

        impl = envs.METAX_TPU_QUANT_IMPL
        on_tpu = _jax.devices()[0].platform not in ("cpu", "gpu")
        if envs.METAX_TPU_PREFILL_REQUANT:
            params = self._build_prefill_requant(params)
        if impl == "xla" or (impl == "auto" and not on_tpu):
            return params
        from vllm_metax_tpu.ops.pallas.moe_gmm import tile_expert_bank
        from vllm_metax_tpu.ops.pallas.quant_matmul import (
            TILE_N,
            tile_packed_weight,
            w4a8_repack,
        )

        tp = self.tp_size
        w4a8 = envs.METAX_TPU_W4A8

        def fix(node, name=""):
            if not isinstance(node, dict):
                return node
            out = {}
            for key, val in node.items():
                if isinstance(val, dict):
                    out[key] = fix(val, key)
                else:
                    out[key] = val
            if "w_p4" in out and out["w_p4"].ndim == 3:
                w = out.pop("w_p4")  # (L, K/2, N)
                n = w.shape[-1]
                if n % (tp * TILE_N) == 0:
                    w_p4t = _jax.jit(
                        _jax.vmap(lambda a: tile_packed_weight(a, tp))
                    )(w)
                    if w4a8:
                        # int8-MXU fast path: offset-binary byte transform
                        # (see quant_matmul.w4a8_repack); the tiled bank is
                        # then int8 by contract and int4_matmul_tiled
                        # dispatches to the w4a8 kernel
                        w_p4t = _jax.jit(w4a8_repack)(w_p4t)
                    out["w_p4t"] = w_p4t
                else:
                    out["w_p4"] = w  # odd shape: keep flat layout
            # expert banks (L, E, K, N) → tiled for the grouped dequant-GEMM
            # (ops/pallas/moe_gmm.py); col-parallel gate_up shards N tiles,
            # row-parallel down shards K, hence the different divisibility
            is_gate_up = name == "experts_gate_up"
            n_ok = lambda n: (  # noqa: E731
                n % (tp * TILE_N) == 0 if is_gate_up else n % TILE_N == 0
            )
            if "w_p4" in out and out["w_p4"].ndim == 4:
                w = out["w_p4"]  # (L, E, K/2, N)
                if n_ok(w.shape[-1]) and (is_gate_up or w.shape[-2] % tp == 0):
                    out.pop("w_p4")
                    out["w_p4t"] = _jax.jit(tile_expert_bank)(w)
            elif "w_i8" in out and out["w_i8"].ndim == 4:
                w = out["w_i8"]  # (L, E, K, N)
                if n_ok(w.shape[-1]) and (is_gate_up or w.shape[-2] % tp == 0):
                    out.pop("w_i8")
                    out["w_i8t"] = _jax.jit(tile_expert_bank)(w)
            return out

        return fix(params)

    def _init_lora_banks(self, params):
        """Zero multi-LoRA banks inside the layer param dicts (llama-family
        fused targets); see vllm_metax_tpu/lora.py for the layout."""
        if self.lora_cfg is None:
            return params
        from vllm_metax_tpu.lora import empty_banks

        layers = params.get("layers")
        if layers is None or "qkv" not in layers or "o" not in layers:
            raise NotImplementedError(
                f"LoRA needs the fused qkv/o attention layout; "
                f"{self.model_cfg.architecture} does not expose it"
            )
        # dense families (llama/qwen/gemma) adapt all four fused targets;
        # MoE families (mixtral et al.) adapt attention only — the expert
        # banks are not LoRA targets (matches vLLM's MoE LoRA surface)
        self._lora_targets = tuple(
            n for n in ("qkv", "o", "gate_up", "down") if n in layers
        )
        banks = empty_banks(
            self.model_cfg, self.lora_cfg, self.model_cfg.dtype,
            targets=self._lora_targets,
        )
        layers = dict(layers)
        for name in self._lora_targets:
            tgt = dict(layers[name])
            tgt["lora_A"] = banks[name]["lora_A"]
            tgt["lora_B"] = banks[name]["lora_B"]
            tgt["lora_s"] = banks["lora_s"]
            layers[name] = tgt
        # expert-weight LoRA (opt-in: LoRAConfig.lora_experts) — dense
        # ("w") expert banks only; deltas applied per routed assignment in
        # ops/moe.py _expert_lora_delta
        self._lora_expert_targets = ()
        if (
            getattr(self.lora_cfg, "lora_experts", False)
            and "experts_gate_up" in layers
            and "w" in layers["experts_gate_up"]
        ):
            if self.tp_size > 1 or self.ep_size > 1:
                raise NotImplementedError(
                    "expert-weight LoRA with tp/ep sharding"
                )
            from vllm_metax_tpu.lora import empty_expert_banks

            ebanks = empty_expert_banks(
                self.model_cfg, self.lora_cfg, self.model_cfg.dtype
            )
            for name in ("experts_gate_up", "experts_down"):
                tgt = dict(layers[name])
                tgt.update(ebanks[name])
                layers[name] = tgt
            self._lora_expert_targets = ("experts_gate_up", "experts_down")
        out = dict(params)
        out["layers"] = layers
        # lm_head / embedding adapters (llama-family forward implements the
        # deltas; ref: upstream vLLM's punica lm_head/embedding LoRA)
        from vllm_metax_tpu.models import llama as _llama_mod

        self._lora_heads = (
            getattr(self.model, "forward", None) is _llama_mod.forward
            and "embed" in out
        )
        if self._lora_heads:
            from vllm_metax_tpu.lora import empty_head_banks

            out.update(
                empty_head_banks(
                    self.model_cfg, self.lora_cfg, self.model_cfg.dtype
                )
            )
        return out

    def add_lora(self, name: str, path: str) -> int:
        """Load an HF peft adapter into a free slot. Returns the slot id."""
        if self.lora_mgr is None:
            raise RuntimeError("LoRA is not enabled (pass lora_config)")
        if name in self.lora_mgr.slots:
            return self.lora_mgr.slots[name]
        from vllm_metax_tpu.lora import adapter_to_banks, load_peft_adapter
        from vllm_metax_tpu.models import llama as _llama_mod

        tensors, scaling, _rank = load_peft_adapter(path)
        banks = adapter_to_banks(tensors, self.model_cfg, self.lora_cfg)
        slot = self.lora_mgr.assign(name)
        cfg = self.model_cfg
        layers = dict(self.params["layers"])
        for tgt_name, ab in banks.items():
            if tgt_name not in self._lora_targets:
                logger.warning(
                    "adapter targets %s which %s does not adapt; skipping",
                    tgt_name, cfg.architecture,
                )
                continue
            a, b = ab["A"], ab["B"]
            if self.tp_size > 1 and tgt_name in ("qkv", "gate_up"):
                # B columns follow the base weights' rank-major column order
                hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
                widths = (
                    [hq * d, hkv * d, hkv * d]
                    if tgt_name == "qkv"
                    else [cfg.intermediate_size, cfg.intermediate_size]
                )
                perm = _llama_mod._rank_major_perm(widths, self.tp_size)
                b = b[:, :, perm]
            tgt = dict(layers[tgt_name])
            tgt["lora_A"] = tgt["lora_A"].at[:, slot].set(
                jnp.asarray(a, tgt["lora_A"].dtype)
            )
            tgt["lora_B"] = tgt["lora_B"].at[:, slot].set(
                jnp.asarray(b, tgt["lora_B"].dtype)
            )
            tgt["lora_s"] = tgt["lora_s"].at[slot].set(scaling)
            layers[tgt_name] = tgt
        # targets the adapter does not touch still need the slot scale set
        # (their A/B stay zero, so the delta stays zero)
        for tgt_name in self._lora_targets:
            if tgt_name not in banks:
                tgt = dict(layers[tgt_name])
                tgt["lora_s"] = tgt["lora_s"].at[slot].set(scaling)
                layers[tgt_name] = tgt
        self.params = dict(self.params)
        self.params["layers"] = layers
        # expert-weight banks (opt-in; parsed from per-expert peft targets)
        from vllm_metax_tpu.lora import adapter_expert_banks

        ebanks = adapter_expert_banks(tensors, cfg, self.lora_cfg)
        if ebanks and not getattr(self, "_lora_expert_targets", ()):
            logger.warning(
                "adapter targets MoE experts but expert LoRA is disabled "
                "(LoRAConfig.lora_experts) — skipping expert weights"
            )
        elif ebanks:
            for name in self._lora_expert_targets:
                tgt = dict(layers[name])
                tgt["lora_A"] = tgt["lora_A"].at[:, slot].set(
                    jnp.asarray(ebanks[name]["A"], tgt["lora_A"].dtype)
                )
                tgt["lora_B"] = tgt["lora_B"].at[:, slot].set(
                    jnp.asarray(ebanks[name]["B"], tgt["lora_B"].dtype)
                )
                tgt["lora_s"] = tgt["lora_s"].at[:, slot].set(scaling)
                layers[name] = tgt
            self.params["layers"] = layers
        # head adapters (lm_head / embedding) — llama-family only
        for bank_key, param_key in (("lm_head", "lm_head_lora"),
                                    ("embed", "embed_lora")):
            if bank_key not in banks:
                continue
            if not getattr(self, "_lora_heads", False):
                logger.warning(
                    "adapter targets %s which %s does not adapt; skipping",
                    bank_key, cfg.architecture,
                )
                continue
            hb = dict(self.params[param_key])
            hb["lora_A"] = hb["lora_A"].at[slot].set(
                jnp.asarray(banks[bank_key]["A"], hb["lora_A"].dtype)
            )
            hb["lora_B"] = hb["lora_B"].at[slot].set(
                jnp.asarray(banks[bank_key]["B"], hb["lora_B"].dtype)
            )
            hb["lora_s"] = hb["lora_s"].at[slot].set(scaling)
            self.params[param_key] = hb
        return slot

    def _alloc_kv_cache(self) -> None:
        # one flat page pool for all layers (layer l owns pages
        # [l*num_blocks, (l+1)*num_blocks)) so the per-layer cache update is
        # an in-place scatter on the scan carry — no per-step stacked copies
        cc = self.cache_cfg
        kv_spec = self.model.kv_cache_spec(self.model_cfg)
        from vllm_metax_tpu import envs

        # fused [K‖V] pools only apply to symmetric standard-attention
        # caches (MLA latent pools have store_v=False / custom v_dim)
        fused = (
            envs.METAX_TPU_KV_FUSED
            and kv_spec.get("store_v", True)
            and kv_spec.get("v_dim") is None
        )
        self.kv_cache = new_kv_cache(
            kv_spec["num_layers"] * cc.num_blocks,
            cc.block_size,
            kv_spec["num_kv_heads"],
            kv_spec["head_dim"],
            cc.kv_dtype(self.model_cfg.dtype),
            model_dtype=self.model_cfg.dtype,
            store_v=kv_spec.get("store_v", True),
            v_dim=kv_spec.get("v_dim"),
            fused=fused,
        )
        n_lin = kv_spec.get("linear_layers", 0)
        if n_lin:
            # hybrid linear-attention state pools: one slot per live request
            # (Qwen3-Next gated DeltaNet; slots reset lazily at position 0)
            rslot = self.config.scheduler_config.max_num_seqs
            self.kv_cache = self.kv_cache._replace(
                lin_state=jnp.zeros(
                    (n_lin, rslot) + tuple(kv_spec["linear_state_shape"]),
                    jnp.float32,
                ),
                conv_state=jnp.zeros(
                    (n_lin, rslot) + tuple(kv_spec["conv_state_shape"]),
                    self.model_cfg.dtype,
                ),
            )
            self._state_free = list(range(rslot - 1, -1, -1))
            self._state_slots: dict[str, int] = {}
        if self._is_sharded:
            from jax.sharding import NamedSharding

            self.kv_cache = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s)),
                self.kv_cache,
                self._kv_specs(),
            )

    # --------------------------------------------------------- sleep / wake

    def sleep(self, level: int = 1) -> None:
        """Free device memory (TPU-native analog of the reference's CuMem
        sleep mode, device_allocator/cumem.py + csrc/cumem_allocator.cpp —
        no VA remapping needed: arrays are deleted and re-materialized).
        level 1: weights offloaded to host, KV discarded; level 2: weights
        dropped entirely (wake reloads from the checkpoint)."""
        if level == 1:
            self._host_params = jax.device_get(self.params)
        else:
            self._host_params = None
        self.params = None
        self.kv_cache = None
        self._msd_cache = None

    def wake_up(self) -> None:
        if self.params is not None:
            return
        if self._host_params is not None:
            # already merged/quantized/TP-prepared — just reshard
            params = self._host_params
            self._host_params = None
            if self._is_sharded:
                from vllm_metax_tpu.parallel.mesh import shard_params

                params = shard_params(params, self._param_spec_tree(), self.mesh)
            else:
                params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            params = self._load_params()
            if self._is_sharded:
                params = self._shard_params(params)
        self.params = params
        self._alloc_kv_cache()

    @property
    def is_sleeping(self) -> bool:
        return self.params is None

    # ------------------------------------------------------------ build

    def _load_params(self):
        lc = self.config.load_config
        if lc.load_format == "sharded_state":
            from vllm_metax_tpu.weights.sharded_state import load_sharded_state

            logger.info("loading sharded state from %s", self.model_cfg.model)
            return load_sharded_state(None, self.model_cfg.model)
        spec = self.config.speculative_config
        eagle = bool(spec is not None and spec.method == "eagle"
                     and spec.enabled)
        def finish(params):
            # quantized lm_head (GPTQ quantize_config "lm_head": true or
            # explicit lm_head_quantized): int8 per-channel at load — the
            # loaders keep lm_head dense; models dispatch on the dict form
            qc = self.config.quant_config
            if (
                qc is not None
                and qc.enabled
                and qc.lm_head_quantized
                and isinstance(params.get("lm_head"), jax.Array)
            ):
                from vllm_metax_tpu.ops.quant import quantize_int8_channel

                w_i8, s = quantize_int8_channel(params["lm_head"])
                params = dict(params, lm_head={"w_i8": w_i8, "s": s})
            return params

        if lc.load_format == "dummy" or not self.model_cfg.model:
            logger.info("initializing dummy weights (load_format=dummy)")
            params = self.model.init_params(
                self.model_cfg, self.config.quant_config, seed=lc.seed
            )
            if eagle:
                params["mtp"] = self.model.init_eagle_params(self.model_cfg)
            return finish(params)
        logger.info("loading weights from %s", self.model_cfg.model)
        params = self.model.load_weights(
            self.model_cfg, self.config.quant_config, self.model_cfg.model
        )
        if eagle:
            logger.info("loading EAGLE head from %s",
                        self.model_cfg.draft_model)
            params["mtp"] = self.model.load_eagle_weights(
                self.model_cfg, self.config.quant_config,
                self.model_cfg.draft_model,
            )
        return finish(params)

    @property
    def _is_sharded(self) -> bool:
        return (
            self.tp_size > 1
            or self.ep_size > 1
            or self.pp_size > 1
            or self.dcp_size > 1
        )

    def _param_spec_tree(self):
        """Model PartitionSpec tree, with the "pp" stage axis prepended to
        the stacked layer banks when pipeline parallelism is on."""
        specs = self.model.param_specs(self.model_cfg, self.config.quant_config)
        if self.pp_size > 1:
            from vllm_metax_tpu.parallel.pipeline import pp_param_specs

            specs = pp_param_specs(specs)
        return specs

    def _shard_params(self, params):
        """TP: distribute the param tree over the mesh per the model's
        PartitionSpec tree (replaces the reference's per-rank weight-loading
        + MCCL process groups with one sharded pytree)."""
        from vllm_metax_tpu.parallel.mesh import shard_params

        specs = self._param_spec_tree()
        # desc_act GPTQ under TP: column-parallel layers carry the full
        # replicated perm; row-parallel layers all-gather their activation
        # to full width and index it with their (tp-sharded) perm slice
        # (layers/linear.py apply_linear gather_axis).
        if hasattr(self.model, "prepare_for_tp"):
            params = self.model.prepare_for_tp(params, self.model_cfg, self.tp_size)
        return shard_params(params, specs, self.mesh)

    def _kv_specs(self):
        """PartitionSpec tree for the stacked KV cache: heads on the tp axis.
        Single-head (MLA latent) or zero-width leaves sanitize to replicated."""
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        from vllm_metax_tpu.ops.kv_cache import KVCache
        from vllm_metax_tpu.parallel.mesh import _sanitize_spec

        # (L*NB, H, BS, D): the flat page pool is ordered (pp stage, dcp
        # rank, local layers, local pages), so sharding axis 0 over
        # ("pp","dcp") gives each stage its own layers' pages and each DCP
        # rank its round-robin page partition (parallel/dcp.py localizes the
        # block ids in-step); heads shard over "tp"
        ax0 = tuple(
            a
            for a, on in (("pp", self.pp_size > 1), ("dcp", self.dcp_size > 1))
            if on
        ) or None
        val = P(ax0, "tp", None, None)  # (L*NB, H, BS, D)
        scale = P(ax0, "tp", None)  # (L*NB, H, BS) head-major like values
        has_scale = self.kv_cache.k_scale is not None
        specs = KVCache(
            k=val,
            v=val,
            k_scale=scale if has_scale else None,
            v_scale=scale if has_scale else None,
            # hybrid linear-attention state: replicated (small vs the pool)
            lin_state=None if self.kv_cache.lin_state is None else P(),
            conv_state=None if self.kv_cache.conv_state is None else P(),
        )
        mesh_axes = set(self.mesh.axis_names) if self.mesh else None
        return _jax.tree_util.tree_map(
            lambda a, s: _sanitize_spec(s, a.shape, mesh_axes),
            self.kv_cache,
            specs,
        )


    @staticmethod
    def _split_kv(kv):
        """Quantized caches: donating all four leaves trips a PJRT aliasing
        bug on this backend (runtime InvalidArgument). Split so only the
        value buffers are donated; the small scale arrays copy per step."""
        from vllm_metax_tpu.ops.kv_cache import KVCache

        vals = KVCache(
            kv.k, kv.v, lin_state=kv.lin_state, conv_state=kv.conv_state
        )
        scales = (
            (kv.k_scale, kv.v_scale) if kv.k_scale is not None else None
        )
        return vals, scales

    @staticmethod
    def _join_kv(vals, scales):
        if scales is None:
            return vals
        return vals._replace(k_scale=scales[0], v_scale=scales[1])

    def _get_step_fn(self, all_greedy: bool, need_logprobs: bool,
                     plain: bool = False, need_plp: bool = False):
        key = (all_greedy, need_logprobs, plain, need_plp)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step_fn(
                all_greedy, need_logprobs, plain, need_plp
            )
        return self._step_fns[key]

    def _build_step_fn(self, all_greedy: bool = False, need_logprobs: bool = True,
                        plain: bool = False, need_plp: bool = False):
        model, cfg = self.model, self.model_cfg
        tp = self.tp_size
        pp = self.pp_size
        axis_name = "tp" if tp > 1 else None
        ep_axis = "ep" if self.ep_size > 1 else None

        def fwd(params, input_ids, kv_cache, md, microbatches=1):
            if self.dcp_size > 1:
                from vllm_metax_tpu.parallel.dcp import localize_metadata

                md = localize_metadata(
                    md,
                    self.cache_cfg.num_blocks // self.dcp_size,
                    self.cache_cfg.block_size,
                )
            kwargs = dict(
                num_q_heads=cfg.num_q_heads // tp,
                num_kv_heads=cfg.num_kv_heads // tp,
                axis_name=axis_name,
                ep_axis_name=ep_axis,
            )
            if pp > 1:
                from vllm_metax_tpu.parallel.pipeline import pipeline_forward

                return pipeline_forward(
                    model, params, input_ids, kv_cache, md, cfg,
                    num_stages=pp, microbatches=microbatches, **kwargs,
                )
            return model.forward(params, input_ids, kv_cache, md, cfg, **kwargs)

        def step(params, kv_cache, input_ids, md, logits_indices, st,
                 hist_ids, hist_is_out, allowed_ids=None, banned=None,
                 mtp_next=None, plp_targets=None):
            hidden, kv_cache = fwd(params, input_ids, kv_cache, md)
            plp_out = None
            if need_plp:
                # prompt logprobs: full-vocab log-softmax for EVERY token row
                # of the step, chunked so the (C, V) f32 logits stay small
                # (ref surface: SamplingParams.prompt_logprobs,
                # tests/v1/engine/test_output_processor.py:119-133)
                tb_rows = hidden.shape[0]
                c = 128 if tb_rows % 128 == 0 else tb_rows

                def plp_chunk(args):
                    h_c, tgt_c = args
                    lg = model.compute_logits(
                        params, h_c, cfg, axis_name=axis_name
                    ).astype(jnp.float32)
                    lg = jax.nn.log_softmax(lg, axis=-1)
                    tlp = jnp.take_along_axis(lg, tgt_c[:, None], axis=1)[:, 0]
                    tv, ti = jax.lax.top_k(lg, _PLP_TOPK)
                    return tlp, ti.astype(jnp.int32), tv

                tlp, ti, tv = jax.lax.map(
                    plp_chunk,
                    (
                        hidden.reshape(tb_rows // c, c, -1),
                        plp_targets.reshape(tb_rows // c, c),
                    ),
                )
                plp_out = (
                    tlp.reshape(tb_rows),
                    ti.reshape(tb_rows, _PLP_TOPK),
                    tv.reshape(tb_rows, _PLP_TOPK),
                )
            sel = jnp.take(hidden, logits_indices, axis=0)
            if getattr(self, "_lora_heads", False) and md.lora_idx is not None:
                logits = model.compute_logits(
                    params, sel, cfg, axis_name=axis_name,
                    lora_rows=jnp.take(md.lora_idx, logits_indices),
                )
            else:
                logits = model.compute_logits(
                    params, sel, cfg, axis_name=axis_name
                )
            if hist_ids is not None:
                rb = logits.shape[0]
                vocab = logits.shape[1]
                rows = jnp.broadcast_to(
                    jnp.arange(rb, dtype=jnp.int32)[:, None], hist_ids.shape
                )
                counts = jnp.zeros((rb, vocab), jnp.int32).at[
                    rows, hist_ids
                ].add(hist_is_out.astype(jnp.int32), mode="drop")
                seen = jnp.zeros((rb, vocab), bool).at[rows, hist_ids].set(
                    True, mode="drop"
                )
                logits = apply_penalties(logits, counts, seen, st)
            if allowed_ids is not None:
                # structured outputs: packed-bitset allow masks (bit v%32 of
                # word v//32); unconstrained rows pass through
                bits, unconstrained = allowed_ids
                shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
                ok = (bits[:, :, None] >> shifts) & jnp.uint32(1)
                ok = ok.reshape(bits.shape[0], -1)[:, : logits.shape[1]]
                ok = ok.astype(bool) | unconstrained[:, None]
                logits = jnp.where(ok, logits, -1e30)
            if banned is not None:
                # min_tokens / bad_words bans + logit_bias
                ban_ids, bias_ids, bias_vals = banned
                rows_b = jnp.arange(logits.shape[0], dtype=jnp.int32)[:, None]
                logits = logits.at[rows_b, ban_ids].set(-1e30, mode="drop")
                logits = logits.at[rows_b, bias_ids].add(bias_vals, mode="drop")
            out = sample(logits, st, all_greedy, need_logprobs, plain)
            drafts = None
            if mtp_next is not None:
                # MTP draft head: one extra decoder-layer pass over the step's
                # rows. mtp_next carries the known next token per row (prefill
                # ground truth); -1 rows take the freshly sampled token.
                mtp_in = jnp.maximum(mtp_next, 0)
                mtp_in = mtp_in.at[logits_indices].set(
                    jnp.where(
                        mtp_next[logits_indices] < 0,
                        out.token_ids,
                        mtp_in[logits_indices],
                    )
                )
                md_mtp = md
                if self.dcp_size > 1:
                    # the draft layer's KV pages shard over dcp like the
                    # rest of the pool — rebase to rank-local ids (the main
                    # forward localizes inside fwd(); md here is global)
                    from vllm_metax_tpu.parallel.dcp import (
                        localize_metadata,
                    )

                    md_mtp = localize_metadata(
                        md,
                        self.cache_cfg.num_blocks // self.dcp_size,
                        self.cache_cfg.block_size,
                    )
                mtp_hidden, kv_cache = model.mtp_forward(
                    params, mtp_in, hidden, kv_cache, md_mtp, cfg,
                    num_q_heads=cfg.num_q_heads // tp,
                    axis_name=axis_name, ep_axis_name=ep_axis,
                )
                d_logits = model.mtp_compute_logits(
                    params, jnp.take(mtp_hidden, logits_indices, axis=0),
                    cfg, axis_name=axis_name,
                )
                if self._spec_branching > 1:
                    # top-B candidates per row → a depth-1 draft TREE
                    # verified with tree-attention ancestor masks next step
                    _, drafts = jax.lax.top_k(d_logits, self._spec_branching)
                    drafts = drafts.astype(jnp.int32)
                else:
                    drafts = jnp.argmax(d_logits, axis=-1).astype(jnp.int32)
            return (out, drafts, plp_out), kv_cache

        def step_split(params, kv_vals, kv_scales, *rest):
            out, kv = step(params, self._join_kv(kv_vals, kv_scales), *rest)
            return out, self._split_kv(kv)

        if not self._is_sharded:
            inner = jax.jit(step_split, donate_argnums=(1,))

            def outer(params, kv_cache, *rest):
                vals, scales = self._split_kv(kv_cache)
                out, (vals, scales) = inner(params, vals, scales, *rest)
                return out, self._join_kv(vals, scales)

            return outer

        # TP: one SPMD program over the mesh. Weights/KV are sharded by the
        # spec trees; everything else (tokens, metadata, sampling state) is
        # replicated. XLA inserts the ICI collectives (psum after row-parallel
        # projections, all_gather for vocab-sharded logits) — the TPU-native
        # replacement for the reference's MCCL allreduce path
        # (patch/distributed/pynccl_wrapper.py:51).
        from jax.sharding import PartitionSpec as P

        from vllm_metax_tpu.parallel.mesh import sanitize_specs

        param_specs = sanitize_specs(
            self._param_spec_tree(), self.params, self.mesh,
        )
        kv_specs = self._kv_specs()
        sharded = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P(), P(),
                      P(), P(), P(), P()),
            out_specs=(P(), kv_specs),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    # ------------------------------------------------------------ state sync

    def _prepare_mm(self, nr) -> Optional[dict]:
        """Admission-time multimodal work: run the vision tower ONCE per
        request and precompute the host-side mrope tables (the reference
        runs its ViT inside the model forward each prefill chunk; on TPU the
        one-shot encode keeps the decode program free of vision branches)."""
        cfg = self.model_cfg
        mmd = getattr(nr, "multi_modal_data", None)
        ids = np.asarray(nr.prompt_token_ids, np.int64)
        if mmd is None:
            return None
        if not self._is_mrope or not hasattr(self.model, "encode_images"):
            raise ValueError(
                f"{cfg.architecture} does not accept multi_modal_data"
            )
        img_tok = self.model.image_token_id(cfg)
        vid_tok = self.model.video_token_id(cfg)
        img_grids = [tuple(int(x) for x in g)
                     for g in mmd.get("image_grid_thw") or []]
        vid_grids = [tuple(int(x) for x in g)
                     for g in mmd.get("video_grid_thw") or []]
        vid_spg = list(
            mmd.get("video_second_per_grid") or [1.0] * len(vid_grids)
        )
        img_px = mmd.get("pixel_values")
        vid_px = mmd.get("video_pixel_values")
        merge2 = int(
            (cfg.hf_config.get("vision_config") or {}).get(
                "spatial_merge_size", 2
            )
        ) ** 2
        # walk the prompt's vision placeholders in order, consuming the
        # image/video grid queues so mixed prompts interleave correctly
        enc_blocks, enc_grids, rope_grids, scales = [], [], [], []
        ii = iv = 0
        img_off = vid_off = 0
        i, nids = 0, len(ids)
        while i < nids:
            if ids[i] == img_tok and ii < len(img_grids):
                g = img_grids[ii]
                rows = g[0] * g[1] * g[2]
                enc_blocks.append(img_px[img_off : img_off + rows])
                img_off += rows
                enc_grids.append(g)
                rope_grids.append(g)
                scales.append(1.0)
                ii += 1
                i += rows // merge2
            elif ids[i] == vid_tok and iv < len(vid_grids):
                g = vid_grids[iv]
                rows = g[0] * g[1] * g[2]
                enc_blocks.append(vid_px[vid_off : vid_off + rows])
                vid_off += rows
                enc_grids.append(g)
                rg, sc = self.model.video_rope_grids(g, cfg, vid_spg[iv])
                rope_grids.extend(rg)
                scales.extend(sc)
                iv += 1
                i += rows // merge2
            else:
                i += 1
        if ii < len(img_grids) or iv < len(vid_grids):
            raise ValueError(
                f"prompt placeholders cover only {ii} of {len(img_grids)} "
                f"images / {iv} of {len(vid_grids)} videos"
            )
        embeds, deepstack = self.model.encode_images(
            self.params, np.concatenate(enc_blocks), enc_grids, cfg,
            want_deepstack=True,
        )
        embeds = np.asarray(embeds, np.float32)
        deepstack = (
            None if deepstack is None else np.asarray(deepstack, np.float32)
        )
        is_img = (ids == img_tok) | (ids == vid_tok)
        if int(is_img.sum()) != embeds.shape[0]:
            raise ValueError(
                f"prompt has {int(is_img.sum())} vision-placeholder tokens "
                f"but the inputs encode to {embeds.shape[0]} embeddings"
            )
        pos3, delta = self.model.mrope_positions_np(
            ids, rope_grids, cfg, time_scales=scales
        )
        return {
            "embeds": embeds,
            "deepstack": deepstack,  # (K, Nimg, H) Qwen3-VL early-layer adds
            "is_img": is_img,
            "img_ord": np.cumsum(is_img).astype(np.int32) - 1,
            "pos3": pos3,
            "delta": int(delta),
        }

    def _update_states(self, so: SchedulerOutput) -> None:
        for req_id in so.finished_req_ids:
            self.requests.pop(req_id, None)
            if self._state_free is not None:
                slot = self._state_slots.pop(req_id, None)
                if slot is not None:
                    self._state_free.append(slot)
        # NOTE: preempted requests keep their runner state (token ids, sampling
        # params); only their blocks are invalid until resume — vLLM semantics.
        for nr in so.scheduled_new_reqs:
            from vllm_metax_tpu.structured_output import build_constraint

            lora_slot = 0
            lora_name = getattr(nr, "lora_name", None)
            if lora_name is not None:
                if self.lora_mgr is None:
                    raise RuntimeError(
                        "request has a LoRA adapter but LoRA is not enabled"
                    )
                lora_slot = self.lora_mgr.slot_of(lora_name)
            if self._state_free is not None and nr.req_id not in self._state_slots:
                if not self._state_free:
                    raise RuntimeError("out of linear-attention state slots")
                self._state_slots[nr.req_id] = self._state_free.pop()
            self.requests[nr.req_id] = CachedReqState(
                token_ids=list(nr.prompt_token_ids),
                block_ids=list(nr.block_ids),
                sampling_params=nr.sampling_params,
                prompt_len=len(nr.prompt_token_ids),
                num_computed_tokens=nr.num_computed_tokens,
                generator_seed=nr.sampling_params.seed,
                constraint=build_constraint(
                    nr.sampling_params, getattr(nr, "eos_token_id", None)
                ),
                eos_token_id=getattr(nr, "eos_token_id", None),
                lora_slot=lora_slot,
                mm=self._prepare_mm(nr),
            )
        for cr in so.scheduled_cached_reqs:
            st = self.requests[cr.req_id]
            if cr.resumed_from_preemption:
                st.block_ids = list(cr.new_block_ids)
                st.num_computed_tokens = cr.num_computed_tokens
                # recompute restarts prefill from position 0 — drop any
                # partially-accumulated prompt logprobs so the re-run rebuilds
                # the list without duplicated positions
                st.prompt_lp_acc = None
            else:
                st.block_ids.extend(cr.new_block_ids)
                st.num_computed_tokens = cr.num_computed_tokens

    # ------------------------------------------------------------ multi-step

    def _build_multi_step_fn(self, rb: int, m: int, all_greedy: bool = False,
                             need_logprobs: bool = True, plain: bool = False,
                             use_penalties: bool = False,
                             use_bans: bool = False, use_lora: bool = False,
                             counts_warm: bool = False):
        """M decode steps fused into one jitted lax.scan: forward → sample →
        feed the token back, KV appended in place each step. One host round
        trip per M tokens instead of per token. Penalties run DEVICE-side:
        the (R, V) output-count tensor rides the scan carry and each step's
        sampled token bumps it (no per-step host history rebuilds —
        the feature-cliff VERDICT called out)."""
        model, cfg = self.model, self.model_cfg
        tp = self.tp_size
        pp = self.pp_size
        axis_name = "tp" if tp > 1 else None
        ep_axis = "ep" if self.ep_size > 1 else None
        bs = self.cache_cfg.block_size
        num_slots = self.num_slots
        vocab = self.model_cfg.vocab_size

        def run(params, kv_cache, tokens0, block_tables, pos0, valid, wend,
                st, state_idx, hist_ids, hist_is_out, extras, counts_in,
                cascade=None):
            req_rows = jnp.arange(rb, dtype=jnp.int32)
            qsl = jnp.arange(rb + 1, dtype=jnp.int32)
            if use_penalties:
                hrows = jnp.broadcast_to(req_rows[:, None], hist_ids.shape)
                prompt_mask = jnp.zeros((rb, vocab), bool).at[
                    hrows, hist_ids
                ].set(True, mode="drop")
                if counts_warm:
                    # warm window: the previous window's final counts ARE
                    # this window's initial counts (same request set) — no
                    # host history rebuild/upload
                    counts0 = counts_in
                else:
                    counts0 = jnp.zeros((rb, vocab), jnp.int32).at[
                        hrows, hist_ids
                    ].add(hist_is_out.astype(jnp.int32), mode="drop")
            else:
                counts0 = jnp.zeros((rb, 1), jnp.int32)  # unused stub
                prompt_mask = None

            def one_step(carry, step_idx):
                kv, tokens, pos, counts = carry
                slot = (
                    block_tables[req_rows, pos // bs] * bs + pos % bs
                )
                # drop writes of pad rows AND of rows past their own output
                # budget (wend = prompt_len + max_tokens, absolute): finished
                # requests idle to the window's end without consuming KV
                # slots, so the scheduler only reserves each request's OWN
                # remaining budget (not the full window) — see allocate_slots
                slot = jnp.where(valid & (pos < wend), slot, num_slots)
                md = AttentionMetadata(
                    slot_mapping=slot,
                    block_tables=block_tables,
                    seq_lens=jnp.where(valid, pos + 1, 0),
                    query_start_loc=qsl,
                    req_idx=req_rows,
                    positions=pos,
                    num_seqs=jnp.asarray(rb, jnp.int32),
                    decode_only=True,
                    state_idx=state_idx,
                    lora_idx=extras["lora"] if use_lora else None,
                    # mrope decode: rotary position = seq pos + per-request
                    # delta, identical across the 3 t/h/w rows
                    mrope_positions=(
                        jnp.broadcast_to(
                            (pos + extras["mrope_delta"])[None, :], (3, rb)
                        )
                        if self._is_mrope
                        else None
                    ),
                    cascade_blocks=(
                        cascade[0] if cascade is not None else None
                    ),
                    cascade_tables=(
                        cascade[1] if cascade is not None else None
                    ),
                    cascade_len=(
                        cascade[2] if cascade is not None else None
                    ),
                )
                if self.dcp_size > 1:
                    from vllm_metax_tpu.parallel.dcp import localize_metadata

                    md = localize_metadata(
                        md, self.cache_cfg.num_blocks // self.dcp_size, bs
                    )
                fkw = dict(
                    num_q_heads=cfg.num_q_heads // tp,
                    num_kv_heads=cfg.num_kv_heads // tp,
                    axis_name=axis_name,
                    ep_axis_name=ep_axis,
                )
                if pp > 1:
                    from vllm_metax_tpu.parallel.pipeline import (
                        pick_microbatches,
                        pipeline_forward,
                    )

                    hidden, kv = pipeline_forward(
                        model, params, tokens, kv, md, cfg,
                        num_stages=pp,
                        microbatches=pick_microbatches(rb, pp),
                        **fkw,
                    )
                else:
                    hidden, kv = model.forward(
                        params, tokens, kv, md, cfg, **fkw
                    )
                if use_lora and getattr(self, "_lora_heads", False):
                    logits = model.compute_logits(
                        params, hidden, cfg, axis_name=axis_name,
                        lora_rows=extras["lora"],
                    )
                else:
                    logits = model.compute_logits(
                        params, hidden, cfg, axis_name=axis_name
                    )
                if use_penalties:
                    logits = apply_penalties(logits, counts, prompt_mask, st)
                if use_bans:
                    # static per-request bans/biases ride the window: bad
                    # words always banned; eos/stop banned while the output
                    # count sits under min_tokens (device-side counter)
                    rr2 = req_rows[:, None]
                    logits = logits.at[rr2, extras["always_ban"]].set(
                        -1e30, mode="drop"
                    )
                    gen = pos + 1 - extras["prompt_len"]
                    under = gen < extras["min_tok"]
                    logits = logits.at[rr2, extras["min_ban"]].add(
                        jnp.where(under[:, None], -1e30, 0.0), mode="drop"
                    )
                    logits = logits.at[rr2, extras["bias_ids"]].add(
                        extras["bias_vals"], mode="drop"
                    )
                # decorrelate rows/steps without a host round trip: fold the
                # absolute position in (deterministic per replay, and lets
                # the host reuse the same SamplingTensors across windows)
                st_step = SamplingTensors(
                    temperature=st.temperature,
                    top_k=st.top_k,
                    top_p=st.top_p,
                    min_p=st.min_p,
                    seeds=st.seeds
                    + pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B9),
                    presence_penalty=st.presence_penalty,
                    frequency_penalty=st.frequency_penalty,
                    repetition_penalty=st.repetition_penalty,
                )
                out = sample(logits, st_step, all_greedy, need_logprobs, plain)
                if use_penalties:
                    counts = counts.at[req_rows, out.token_ids].add(
                        valid.astype(jnp.int32), mode="drop"
                    )
                return (kv, out.token_ids, pos + 1, counts), (
                    out.token_ids,
                    out.chosen_logprob,
                    out.topk_ids,
                    out.topk_logprobs,
                )

            (kv_cache, tokens_next, pos_next, counts_next), ys = jax.lax.scan(
                one_step,
                (kv_cache, tokens0, pos0, counts0),
                jnp.arange(m, dtype=jnp.int32),
            )
            return ys, kv_cache, tokens_next, pos_next, counts_next

        def run_split(params, kv_vals, kv_scales, *rest):
            ys, kv, tn, pn, cn = run(params, self._join_kv(kv_vals, kv_scales),
                                     *rest)
            vals, scales = self._split_kv(kv)
            return ys, vals, scales, tn, pn, cn

        if not self._is_sharded:
            inner = jax.jit(run_split, donate_argnums=(1,))

            def outer(params, kv_cache, *rest):
                vals, scales = self._split_kv(kv_cache)
                ys, vals, scales, tn, pn, cn = inner(
                    params, vals, scales, *rest
                )
                return ys, self._join_kv(vals, scales), tn, pn, cn

            return outer

        from jax.sharding import PartitionSpec as P

        from vllm_metax_tpu.parallel.mesh import sanitize_specs

        param_specs = sanitize_specs(
            self._param_spec_tree(), self.params, self.mesh,
        )
        kv_specs = self._kv_specs()
        kv_vals_specs, kv_scale_specs = self._split_kv(kv_specs)
        sharded = jax.shard_map(
            run_split,
            mesh=self.mesh,
            in_specs=(param_specs, kv_vals_specs, kv_scale_specs, P(), P(),
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), kv_vals_specs, kv_scale_specs, P(), P(), P()),
            check_vma=False,
        )
        inner = jax.jit(sharded, donate_argnums=(1,))

        def outer(params, kv_cache, *rest):
            vals, scales = self._split_kv(kv_cache)
            ys, vals, scales, tn, pn, cn = inner(params, vals, scales, *rest)
            return ys, self._join_kv(vals, scales), tn, pn, cn

        return outer

    def _execute_multi_step(self, so: SchedulerOutput) -> ModelRunnerOutput:
        return self._resolve_multi_step(self._launch_multi_step(so))

    def _launch_multi_step(self, so: SchedulerOutput) -> dict:
        """Dispatch one multi-step decode window WITHOUT fetching results.

        JAX dispatch is asynchronous: fn() returns unfinished arrays, so the
        host is free to schedule + launch the NEXT window while the device
        runs this one (the async-scheduling overlap the reference pins in
        tests/v1/core/test_async_scheduler.py). _resolve_multi_step()
        performs the blocking device→host fetch."""
        req_ids = list(so.num_scheduled_tokens.keys())
        # Context-homogeneous tiles: the decode kernel packs NR=8 requests
        # per grid tile and each tile's chunk count is the MAX context in
        # the tile, so a mixed-length batch in arrival order pays long-tail
        # cost in most tiles. Sorting rows by context clusters similar
        # lengths per tile. Contexts all grow by the same amount each
        # window, so the order (ties stable) is window-stable and the
        # warm-window fingerprint keeps matching.
        req_ids.sort(key=lambda rid: self.requests[rid].num_computed_tokens)
        num_reqs = len(req_ids)
        m = so.num_decode_steps
        # multi-step windows always pad to the TOP request bucket: decode is
        # weight-read-bound, so padded rows are nearly free, while per-bucket
        # recompiles of the M-step program (ragged batch tails) cost seconds
        rb = self.req_buckets[-1]
        maxb = self.max_blocks_per_req

        # Warm-window reuse: between consecutive pure-decode windows with the
        # same request set and unchanged block tables, every input the device
        # needs (next tokens, positions, block tables, validity, sampling
        # state) is ALREADY on the device from the previous window — skip the
        # host rebuild + uploads entirely (each transfer rides a full RTT on
        # remote-attached TPUs).
        fingerprint = (
            tuple(req_ids),
            tuple(len(self.requests[rid].block_ids) for rid in req_ids),
            rb,
            m,
        )
        cache = self._msd_cache
        warm = cache is not None and cache["fp"] == fingerprint
        # Block-boundary crossing: only the block tables changed (the
        # scheduler appended blocks for the window). Keep every other input
        # device-resident and upload JUST the new tables — a full cold
        # rebuild costs ~6 serialized host→device transfers on
        # remote-attached TPUs (~300ms each through the tunnel).
        warm_delta = (
            not warm
            and cache is not None
            and cache["fp"][0] == fingerprint[0]  # same request set, order
            and cache["fp"][2:] == fingerprint[2:]  # same rb / m buckets
        )
        if warm or warm_delta:
            dev_tokens = cache["tokens"]
            dev_pos = cache["pos"]
            dev_bt = cache["bt"]
            dev_valid = cache["valid"]
            dev_wend = cache["wend"]
            st_tensors = cache["st"]
            all_greedy, need_lp, plain = cache["mode"]
            if warm_delta:
                block_tables = np.zeros((rb, maxb), np.int32)
                for i, rid in enumerate(req_ids):
                    bids = np.asarray(self.requests[rid].block_ids, np.int32)
                    block_tables[i, : len(bids)] = bids
                dev_bt = jnp.asarray(block_tables)
        else:
            tokens0 = np.zeros(rb, np.int32)
            pos0 = np.zeros(rb, np.int32)
            valid = np.zeros(rb, bool)
            wend = np.zeros(rb, np.int32)  # pads: 0 → never write
            block_tables = np.zeros((rb, maxb), np.int32)
            mml = self.model_cfg.max_model_len
            for i, rid in enumerate(req_ids):
                st = self.requests[rid]
                start = st.num_computed_tokens
                tokens0[i] = st.token_ids[start]
                pos0[i] = start
                valid[i] = True
                mt = st.sampling_params.max_tokens
                # absolute write-end: position prompt_len+max_tokens-1 is the
                # last KV a request can ever need (its final sampled token is
                # output-only) — constant across windows, so warm windows
                # reuse the device tensor
                wend[i] = mml if mt is None else min(st.prompt_len + mt, mml)
                bids = np.asarray(st.block_ids, np.int32)
                block_tables[i, : len(bids)] = bids
            all_greedy = all(
                self.requests[rid].sampling_params.temperature == 0.0
                for rid in req_ids
            )
            need_lp = any(
                self.requests[rid].sampling_params.logprobs is not None
                for rid in req_ids
            )
            plain = self._plain_sampling(req_ids)
            dev_tokens = jnp.asarray(tokens0)
            dev_pos = jnp.asarray(pos0)
            dev_bt = jnp.asarray(block_tables)
            dev_valid = jnp.asarray(valid)
            dev_wend = jnp.asarray(wend)
            st_tensors = self._build_sampling_tensors(req_ids, rb)

        use_penalties = any(
            self.requests[rid].sampling_params.presence_penalty != 0.0
            or self.requests[rid].sampling_params.frequency_penalty != 0.0
            or self.requests[rid].sampling_params.repetition_penalty != 1.0
            for rid in req_ids
        )
        use_bans = any(
            self.requests[rid].sampling_params.bad_words_token_ids
            or self.requests[rid].sampling_params.logit_bias
            or self.requests[rid].sampling_params.min_tokens
            for rid in req_ids
        )
        use_lora = any(self.requests[rid].lora_slot for rid in req_ids)
        # warm/warm-delta windows reuse the previous window's final penalty
        # counts device-side — no host history rebuild or upload
        counts_warm = bool(
            use_penalties
            and (warm or warm_delta)
            and cache is not None
            and cache.get("counts") is not None
        )
        # cascade / shared-prefix decode: recomputed whenever the block
        # tables were (re)built; pure-warm windows reuse the device arrays
        if warm and cache is not None:
            cascade = cache.get("cascade")
        else:
            cascade = self._compute_cascade(req_ids, rb, maxb)
        key = (rb, m, all_greedy, need_lp, plain, use_penalties, use_bans,
               use_lora, counts_warm,
               0 if cascade is None else cascade[0].shape[0])
        if key not in self._multi_step_fns:
            self._multi_step_fns[key] = self._build_multi_step_fn(
                rb, m, all_greedy, need_lp, plain, use_penalties, use_bans,
                use_lora, counts_warm,
            )
        fn = self._multi_step_fns[key]

        extras = {}
        if self._is_mrope:
            deltas = np.zeros(rb, np.int32)
            for i, rid in enumerate(req_ids):
                mm = self.requests[rid].mm
                deltas[i] = 0 if mm is None else mm["delta"]
            extras["mrope_delta"] = jnp.asarray(deltas)
        if use_lora:
            lora_np = np.zeros(rb, np.int32)
            for i, rid in enumerate(req_ids):
                lora_np[i] = self.requests[rid].lora_slot
            extras["lora"] = jnp.asarray(lora_np)
        if use_bans:
            vocab = self.model_cfg.vocab_size
            nb_max = 1
            for rid in req_ids:
                sp = self.requests[rid].sampling_params
                nb_max = max(
                    nb_max,
                    len(sp.bad_words_token_ids or ()),
                    len(sp.stop_token_ids or ()) + 1,
                    len(sp.logit_bias or ()),
                )
            bb = max(8, int(2 ** np.ceil(np.log2(nb_max))))
            a_ban = np.full((rb, bb), vocab, np.int32)
            m_ban = np.full((rb, bb), vocab, np.int32)
            min_tok = np.zeros(rb, np.int32)
            plen = np.zeros(rb, np.int32)
            b_ids = np.full((rb, bb), vocab, np.int32)
            b_vals = np.zeros((rb, bb), np.float32)
            for i, rid in enumerate(req_ids):
                stt = self.requests[rid]
                sp = stt.sampling_params
                if sp.bad_words_token_ids:
                    ids = list(sp.bad_words_token_ids)[:bb]
                    a_ban[i, : len(ids)] = ids
                # NB: constrained requests never reach the window path
                # (_needs_per_step_host_state gates them to single-step)
                if sp.min_tokens:
                    stop = [] if stt.eos_token_id is None else [
                        int(stt.eos_token_id)
                    ]
                    stop += [int(x) for x in (sp.stop_token_ids or [])]
                    stop = stop[:bb]
                    m_ban[i, : len(stop)] = stop
                    min_tok[i] = sp.min_tokens
                    plen[i] = stt.prompt_len
                if sp.logit_bias:
                    items = list(sp.logit_bias.items())[:bb]
                    b_ids[i, : len(items)] = [int(t) for t, _ in items]
                    b_vals[i, : len(items)] = [float(v) for _, v in items]
            extras.update(
                always_ban=jnp.asarray(a_ban),
                min_ban=jnp.asarray(m_ban),
                min_tok=jnp.asarray(min_tok),
                prompt_len=jnp.asarray(plen),
                bias_ids=jnp.asarray(b_ids),
                bias_vals=jnp.asarray(b_vals),
            )

        counts_in = (
            cache["counts"] if counts_warm else jnp.zeros((rb, 1), jnp.int32)
        )
        if use_penalties and not counts_warm:
            vocab = self.model_cfg.vocab_size
            hb = pick_bucket(
                self.hist_buckets,
                max(len(self.requests[rid].token_ids) for rid in req_ids),
            )
            hist_ids_np = np.full((rb, hb), vocab, np.int32)
            hist_out_np = np.zeros((rb, hb), bool)
            for i, rid in enumerate(req_ids):
                stt = self.requests[rid]
                n_all = min(len(stt.token_ids), hb)
                hist_ids_np[i, :n_all] = stt.token_ids[:n_all]
                hist_out_np[i, stt.prompt_len : n_all] = True
            hist_ids = jnp.asarray(hist_ids_np)
            hist_is_out = jnp.asarray(hist_out_np)
        else:
            hist_ids = jnp.zeros((rb, 1), jnp.int32)
            hist_is_out = jnp.zeros((rb, 1), bool)

        state_idx = self._build_state_idx(req_ids, rb)
        ys, self.kv_cache, tokens_next, pos_next, counts_next = fn(
            self.params,
            self.kv_cache,
            dev_tokens,
            dev_bt,
            dev_pos,
            dev_valid,
            dev_wend,
            st_tensors,
            state_idx,
            hist_ids,
            hist_is_out,
            extras,
            counts_in,
            cascade,
        )
        # prime the next window's inputs (device-resident; no host hop).
        # fingerprint uses the POST-window block counts so a block-boundary
        # crossing (scheduler appends a block next window) invalidates it.
        self._msd_cache = {
            "fp": (
                fingerprint[0],
                fingerprint[1],
                rb,
                m,
            ),
            "tokens": tokens_next,
            "pos": pos_next,
            "bt": dev_bt,
            "valid": dev_valid,
            "wend": dev_wend,
            "st": st_tensors,
            "mode": (all_greedy, need_lp, plain),
            "counts": counts_next if use_penalties else None,
            "cascade": cascade,
        }
        return {"ys": ys, "req_ids": req_ids, "m": m, "need_lp": need_lp}

    def _resolve_multi_step(self, handle: dict) -> ModelRunnerOutput:
        """Blocking half of a multi-step window: fetch sampled tokens (and
        logprobs) and assemble the ModelRunnerOutput."""
        ys = handle["ys"]
        req_ids = handle["req_ids"]
        m = handle["m"]
        need_lp = handle["need_lp"]
        # fetch only what's needed: each device→host read costs a full
        # round trip on remote-attached TPUs
        tok_steps = np.asarray(ys[0])  # (M, RB)
        if need_lp:
            lp_steps = np.asarray(ys[1])
            topk_id_steps = np.asarray(ys[2])
            topk_lp_steps = np.asarray(ys[3])

        result = ModelRunnerOutput()
        tok_cols = tok_steps.T  # (RB, M) — per-request token rows
        for i, rid in enumerate(req_ids):
            st = self.requests[rid]
            toks = tok_cols[i].tolist()  # one C call, not M int() casts
            result.req_ids.append(rid)
            result.sampled_token_ids.append(toks)
            st.token_ids.extend(toks)
            if st.sampling_params.logprobs is not None:
                lps = []
                for s in range(m):
                    d = {
                        int(topk_id_steps[s, i, j]): float(topk_lp_steps[s, i, j])
                        for j in range(topk_id_steps.shape[2])
                    }
                    d[toks[s]] = float(lp_steps[s, i])
                    lps.append(d)
                result.logprobs.append(lps)
            else:
                result.logprobs.append(None)
        return result

    # ------------------------------------------------------------ execute

    def can_execute_async(self, so: SchedulerOutput) -> bool:
        """True when this scheduler output is a steady multi-step decode
        window that can launch without blocking (async-scheduling overlap)."""
        return (
            so.num_decode_steps > 1
            and so.total_num_scheduled_tokens > 0
            and not so.scheduled_new_reqs
            and not so.preempted_req_ids
            and not any(
                cr.resumed_from_preemption for cr in so.scheduled_cached_reqs
            )
            and not self._needs_per_step_host_state(so)
        )

    def is_warm_for(self, so: SchedulerOutput) -> bool:
        """True when a window over `so` would reuse the device-resident
        inputs of the previous window (warm/warm-delta). Launch-AHEAD
        windows require this: a cold rebuild reads host token state the
        unresolved previous window hasn't produced yet."""
        cache = self._msd_cache
        if cache is None:
            return False
        # mirror _launch_multi_step's context sort (stable; relative order
        # is unchanged by the uniform per-window growth, so sorting by the
        # pre-update counts gives the same sequence the launch will use)
        req_ids = tuple(
            sorted(
                so.num_scheduled_tokens.keys(),
                key=lambda rid: self.requests[rid].num_computed_tokens,
            )
        )
        return (
            cache["fp"][0] == req_ids
            and cache["fp"][3] == so.num_decode_steps
        )

    def execute_model_async(self, so: SchedulerOutput) -> dict:
        """Launch a step without fetching results; pair with resolve_async().
        Steady decode windows use the multi-step launch (caller checked
        can_execute_async); anything else (prefill/mixed steps for the async
        prefill overlap) takes the single-step launch."""
        self._update_states(so)
        if (
            so.scheduled_new_reqs
            or so.preempted_req_ids
            or any(cr.resumed_from_preemption for cr in so.scheduled_cached_reqs)
        ):
            self._msd_cache = None
        if so.num_decode_steps > 1 and not self._needs_per_step_host_state(so):
            return self._launch_multi_step(so)
        self._msd_cache = None
        return self._launch_single_step(so)

    def resolve_async(self, handle: dict) -> ModelRunnerOutput:
        if "single" in handle:
            return self._make_output(*handle["single"])
        return self._resolve_multi_step(handle)

    def execute_model(self, so: SchedulerOutput) -> ModelRunnerOutput:
        self._update_states(so)
        # anything beyond steady-state decode invalidates the warm-window
        # device inputs (block tables / membership may have changed)
        if (
            so.scheduled_new_reqs
            or so.preempted_req_ids
            or any(cr.resumed_from_preemption for cr in so.scheduled_cached_reqs)
        ):
            self._msd_cache = None
        if so.total_num_scheduled_tokens == 0:
            return ModelRunnerOutput()
        if so.num_decode_steps > 1 and not self._needs_per_step_host_state(so):
            return self._execute_multi_step(so)
        self._msd_cache = None
        return self._make_output(*self._launch_single_step(so)["single"])

    def _launch_single_step(self, so: SchedulerOutput) -> dict:
        """Host build + async dispatch of one (prefill/mixed/single-decode)
        step; the blocking device fetches live in _make_output."""
        req_ids = list(so.num_scheduled_tokens.keys())
        num_reqs = len(req_ids)
        t = so.total_num_scheduled_tokens
        tb = pick_bucket(self.token_buckets, t)
        rb = pick_bucket(self.req_buckets, num_reqs)
        bs = self.cache_cfg.block_size
        maxb = self.max_blocks_per_req
        # speculative rows: S logits rows per request (1 + max drafts)
        spec = so.num_scheduled_spec_tokens
        s_rows = 1 + max((len(d) for d in spec.values()), default=0)

        input_ids = np.zeros(tb, np.int32)
        positions = np.zeros(tb, np.int32)
        slot_mapping = np.full(tb, self.num_slots, np.int32)
        req_idx = np.zeros(tb, np.int32)
        qsl = np.zeros(rb + 1, np.int32)
        seq_lens = np.zeros(rb, np.int32)
        block_tables = np.zeros((rb, maxb), np.int32)
        logits_indices = np.zeros(rb * s_rows, np.int32)

        tree_bits_np = None
        offset = 0
        any_penalty = False
        hist_lens = []
        # completion decided at LAUNCH time: with async prefill overlap, a
        # later launch advances st.num_computed_tokens before this step's
        # resolve, so the resolve-time state check would mis-classify
        complete_flags: dict[str, bool] = {}
        for i, rid in enumerate(req_ids):
            st = self.requests[rid]
            n = so.num_scheduled_tokens[rid]
            start = st.num_computed_tokens
            complete_flags[rid] = start + n >= len(st.token_ids)
            toks = st.token_ids[start : start + n]
            drafts = spec.get(rid, [])
            if drafts:
                toks = toks + list(drafts)
            assert len(toks) == n, (rid, start, n, len(st.token_ids))
            input_ids[offset : offset + n] = toks
            positions[offset : offset + n] = np.arange(start, start + n)
            parents = so.spec_token_parents.get(rid)
            if parents and len(drafts) > 31:
                raise ValueError(
                    "draft trees are limited to 31 nodes (uint32 ancestor "
                    "bitmasks cover root + 31 rows)"
                )
            if parents and n == 1 + len(drafts):
                # TREE verify: scheduled row 0 is the committed root, row
                # j+1 is draft node j. Positions are depth-based (siblings
                # share a position); attention sees ancestors only via the
                # per-row bitmask (ref: tree_attn.py ancestor masks).
                if tree_bits_np is None:
                    tree_bits_np = np.zeros(tb, np.uint32)
                depth = np.zeros(len(drafts), np.int32)
                bits = np.zeros(n, np.uint64)
                bits[0] = 1  # root: self
                for j, par in enumerate(parents):
                    prow = 0 if par < 0 else par + 1
                    depth[j] = 0 if par < 0 else depth[par] + 1
                    bits[j + 1] = bits[prow] | (np.uint64(1) << np.uint64(j + 1))
                positions[offset + 1 : offset + n] = start + 1 + depth
                tree_bits_np[offset : offset + n] = bits.astype(np.uint32)
            bids = np.asarray(st.block_ids, np.int32)
            block_tables[i, : len(bids)] = bids
            pos = np.arange(start, start + n)
            slot_mapping[offset : offset + n] = bids[pos // bs] * bs + pos % bs
            req_idx[offset : offset + n] = i
            seq_lens[i] = start + n
            qsl[i + 1] = qsl[i] + n
            if s_rows == 1:
                logits_indices[i] = offset + n - 1
            else:
                # rows for the verify step: the last (1+len(drafts)) positions,
                # padded by repeating the final row
                n_rows = 1 + len(drafts)
                rows = [offset + n - n_rows + j for j in range(n_rows)]
                rows += [rows[-1]] * (s_rows - n_rows)
                logits_indices[i * s_rows : (i + 1) * s_rows] = rows
            offset += n
            sp = st.sampling_params
            if (
                sp.presence_penalty != 0.0
                or sp.frequency_penalty != 0.0
                or sp.repetition_penalty != 1.0
            ):
                any_penalty = True
            hist_lens.append(len(st.token_ids))
        qsl[num_reqs + 1 :] = qsl[num_reqs]

        mrope_np = None
        mm_embeds_np = None
        mm_mask_np = None
        mm_ds_np = None
        if self._is_mrope:
            # rotary position ≠ sequence position on mrope models: prompt
            # tokens use the precomputed 3-row table, generated tokens run
            # at seq_pos + delta (text rows identical); text-only requests
            # have delta 0 and an identity table
            mrope_np = np.zeros((3, tb), np.int32)
            offset2 = 0
            for i, rid in enumerate(req_ids):
                st = self.requests[rid]
                n = so.num_scheduled_tokens[rid]
                start = st.num_computed_tokens
                pos = np.arange(start, start + n)
                mm = st.mm
                if mm is None:
                    rows = np.broadcast_to(pos, (3, n))
                else:
                    rows = np.where(
                        pos[None, :] < st.prompt_len,
                        mm["pos3"][:, np.minimum(pos, st.prompt_len - 1)],
                        pos[None, :] + mm["delta"],
                    )
                    in_prompt = pos < st.prompt_len
                    if in_prompt.any():
                        sl = slice(offset2, offset2 + n)
                        msk = np.zeros(n, bool)
                        msk[in_prompt] = mm["is_img"][pos[in_prompt]]
                        if msk.any():
                            if mm_embeds_np is None:
                                h = self.model_cfg.hidden_size
                                mm_embeds_np = np.zeros((tb, h), np.float32)
                                mm_mask_np = np.zeros(tb, bool)
                            mm_mask_np[sl] = msk
                            rows_at = offset2 + np.flatnonzero(msk)
                            ords = mm["img_ord"][pos[msk]]
                            mm_embeds_np[rows_at] = mm["embeds"][ords]
                            if mm.get("deepstack") is not None:
                                if mm_ds_np is None:
                                    kd = mm["deepstack"].shape[0]
                                    mm_ds_np = np.zeros(
                                        (kd, tb, h), np.float32
                                    )
                                mm_ds_np[:, rows_at] = (
                                    mm["deepstack"][:, ords]
                                )
                mrope_np[:, offset2 : offset2 + n] = rows
                offset2 += n

        st_tensors = self._build_sampling_tensors(req_ids, rb, s_rows)
        # pure-decode step: row i of the token batch IS request i (qsl is an
        # arange over live reqs) — enables the request-batched decode kernel
        decode_only = s_rows == 1 and all(
            so.num_scheduled_tokens[rid] == 1 for rid in req_ids
        )
        lora_idx = None
        if self.lora_cfg is not None:
            lora_np = np.zeros(tb, np.int32)
            offset = 0
            for rid in req_ids:
                n = so.num_scheduled_tokens[rid]
                lora_np[offset : offset + n] = self.requests[rid].lora_slot
                offset += n
            lora_idx = jnp.asarray(lora_np)
        # vertical-slash sparse prefill: a SINGLE long chunk that fills the
        # whole token bucket (q array length == chunk length, chunk ends
        # its context) routes through the block-skipping sparse path
        # (ops/attention.py _sparse_prefill_route; ref:
        # csrc/attention/vertical_slash_index.cu)
        sparse_prefill = None
        mc = self.model_cfg
        if (
            mc.sparse_attention == "vertical_slash"
            and not decode_only
            and num_reqs == 1
            and s_rows == 1
            and t == tb
            and t >= mc.sparse_attention_threshold
            and tree_bits_np is None
            and self.dcp_size == 1
        ):
            sparse_prefill = (
                mc.sparse_nnz_v,
                mc.sparse_nnz_s,
                mc.sparse_block_budget,
                64,
            )

        md = AttentionMetadata(
            slot_mapping=jnp.asarray(slot_mapping),
            block_tables=jnp.asarray(block_tables),
            seq_lens=jnp.asarray(seq_lens),
            query_start_loc=jnp.asarray(qsl),
            req_idx=jnp.asarray(req_idx),
            positions=jnp.asarray(positions),
            num_seqs=jnp.asarray(num_reqs, jnp.int32),
            lora_idx=lora_idx,
            decode_only=decode_only,
            sparse_prefill=sparse_prefill,
            tree_bits=(
                None if tree_bits_np is None else jnp.asarray(tree_bits_np)
            ),
            state_idx=self._build_state_idx(req_ids, rb),
            mrope_positions=(
                None if mrope_np is None else jnp.asarray(mrope_np)
            ),
            mm_embeds=(
                None if mm_embeds_np is None
                else jnp.asarray(mm_embeds_np, self.model_cfg.dtype)
            ),
            mm_mask=(
                None if mm_mask_np is None else jnp.asarray(mm_mask_np)
            ),
            mm_deepstack=(
                None if mm_ds_np is None
                else jnp.asarray(mm_ds_np, self.model_cfg.dtype)
            ),
        )

        # structured outputs: PACKED BITSET masks per constrained row (the
        # xgrammar-style compact form — 32x smaller uploads than id lists;
        # per-FSM-state bitsets are memoized host-side, so steady-state cost
        # is one (rows, V/32) u32 transfer)
        allowed_ids = None
        constrained = [
            (i, rid)
            for i, rid in enumerate(req_ids)
            if self.requests[rid].constraint is not None
        ]
        if constrained:
            vocab = self.model_cfg.vocab_size
            nw = (vocab + 31) // 32
            bits_np = np.zeros((rb * s_rows, nw), np.uint32)
            unconstrained = np.ones(rb * s_rows, bool)
            for i, rid in constrained:
                st = self.requests[rid]
                row_bits = st.constraint.allowed_bitset(
                    st.token_ids[st.prompt_len :], vocab
                )
                rows = slice(i * s_rows, (i + 1) * s_rows)
                bits_np[rows] = row_bits
                unconstrained[rows] = False
            allowed_ids = (jnp.asarray(bits_np), jnp.asarray(unconstrained))

        # min_tokens / logit_bias: per-row banned ids and additive biases
        banned = None
        ban_lists = {}
        bias_lists = {}
        for i, rid in enumerate(req_ids):
            st = self.requests[rid]
            sp = st.sampling_params
            bans = []
            out_len = len(st.token_ids) - st.prompt_len
            if sp.min_tokens and out_len < sp.min_tokens:
                if self.requests[rid].constraint is None:
                    eos = getattr(st, "eos_token_id", None)
                    for t_ban in ([eos] if eos is not None else []) + list(
                        sp.stop_token_ids or []
                    ):
                        bans.append(int(t_ban))
            if sp.bad_words_token_ids:
                bans.extend(sp.bad_words_token_ids)
            if bans:
                ban_lists[i] = bans
            if sp.logit_bias:
                bias_lists[i] = sp.logit_bias
        if ban_lists or bias_lists:
            vocab = self.model_cfg.vocab_size
            nb_max = max(
                [len(b) for b in ban_lists.values()]
                + [len(b) for b in bias_lists.values()]
                + [1]
            )
            bb = max(8, int(2 ** np.ceil(np.log2(nb_max))))
            ban_np = np.full((rb * s_rows, bb), vocab, np.int32)
            bias_id_np = np.full((rb * s_rows, bb), vocab, np.int32)
            bias_val_np = np.zeros((rb * s_rows, bb), np.float32)
            for i, bans in ban_lists.items():
                rows = slice(i * s_rows, (i + 1) * s_rows)
                ban_np[rows, : len(bans)] = bans[:bb]
            for i, lb in bias_lists.items():
                rows = slice(i * s_rows, (i + 1) * s_rows)
                items = list(lb.items())[:bb]
                bias_id_np[rows, : len(items)] = [int(t) for t, _ in items]
                bias_val_np[rows, : len(items)] = [float(v) for _, v in items]
            banned = (
                jnp.asarray(ban_np),
                jnp.asarray(bias_id_np),
                jnp.asarray(bias_val_np),
            )

        hist_ids = hist_is_out = None
        if any_penalty:
            # NOTE: with spec decode the penalty history reflects committed
            # tokens only (draft rows share their request's history) — the
            # same approximation the reference's rejection path makes.
            vocab = self.model_cfg.vocab_size
            hb = pick_bucket(self.hist_buckets, max(hist_lens))
            hist_ids_np = np.full((rb * s_rows, hb), vocab, np.int32)
            hist_out_np = np.zeros((rb * s_rows, hb), bool)
            for i, rid in enumerate(req_ids):
                stt = self.requests[rid]
                n_all = min(len(stt.token_ids), hb)
                rows = slice(i * s_rows, (i + 1) * s_rows)
                hist_ids_np[rows, :n_all] = stt.token_ids[:n_all]
                hist_out_np[rows, stt.prompt_len : n_all] = True
            hist_ids = jnp.asarray(hist_ids_np)
            hist_is_out = jnp.asarray(hist_out_np)

        all_greedy = all(
            self.requests[rid].sampling_params.temperature == 0.0
            for rid in req_ids
        )
        need_lp = any(
            self.requests[rid].sampling_params.logprobs is not None
            for rid in req_ids
        )
        plain = self._plain_sampling(req_ids)
        # prompt logprobs: per-row target = the NEXT prompt token (row at
        # position p scores prompt[p+1]); rows past the prompt are masked
        # host-side in _make_output
        need_plp = any(
            self.requests[rid].sampling_params.prompt_logprobs is not None
            and self.requests[rid].num_computed_tokens
            < self.requests[rid].prompt_len - 1
            for rid in req_ids
        )
        plp_targets = None
        if need_plp:
            plp_np = np.zeros(tb, np.int32)
            offset3 = 0
            for i, rid in enumerate(req_ids):
                stt = self.requests[rid]
                n = so.num_scheduled_tokens[rid]
                start = stt.num_computed_tokens
                if stt.sampling_params.prompt_logprobs is not None:
                    nxt = stt.token_ids[start + 1 : start + n + 1]
                    plp_np[offset3 : offset3 + len(nxt)] = nxt
                offset3 += n
            plp_targets = jnp.asarray(plp_np)
        mtp_next = None
        if self.mtp:
            # known next token per row (prefill ground truth); -1 rows take
            # the freshly sampled token inside the step (draft conditioning)
            mtp_np = np.full(tb, -1, np.int32)
            offset = 0
            for i, rid in enumerate(req_ids):
                stt = self.requests[rid]
                n = so.num_scheduled_tokens[rid]
                start = stt.num_computed_tokens
                known = stt.token_ids[start + 1 : start + n]
                mtp_np[offset : offset + len(known)] = known
                offset += n
            mtp_next = jnp.asarray(mtp_np)
        step_fn = self._get_step_fn(all_greedy, need_lp, plain, need_plp)
        (out, draft_rows, plp_arrs), self.kv_cache = step_fn(
            self.params,
            self.kv_cache,
            jnp.asarray(input_ids),
            md,
            jnp.asarray(logits_indices),
            st_tensors,
            hist_ids,
            hist_is_out,
            allowed_ids,
            banned,
            mtp_next,
            plp_targets,
        )
        return {
            "single": (
                req_ids, out, so, s_rows, draft_rows, plp_arrs,
                complete_flags,
            )
        }

    def _accumulate_prompt_logprobs(
        self, req_ids: list[str], so: SchedulerOutput, plp_arrs
    ) -> None:
        """Fold this step's full-row logprob arrays into each requesting
        request's prompt_lp_acc: the row at prompt position p contributes
        the dict for position p+1 (top-K + the actual next prompt token)."""
        tlp = np.asarray(plp_arrs[0])
        ti = np.asarray(plp_arrs[1])
        tv = np.asarray(plp_arrs[2])
        offset = 0
        for rid in req_ids:
            st = self.requests[rid]
            n = so.num_scheduled_tokens[rid]
            start = st.num_computed_tokens
            k_want = st.sampling_params.prompt_logprobs
            if k_want is None or start >= st.prompt_len - 1:
                offset += n
                continue
            if st.prompt_lp_acc is None:
                st.prompt_lp_acc = []
            k_want = min(k_want, _PLP_TOPK) if k_want > 0 else 0
            for j in range(n):
                pos = start + j
                if pos >= st.prompt_len - 1:
                    break
                row = offset + j
                lps = {
                    int(ti[row, m]): float(tv[row, m]) for m in range(k_want)
                }
                lps[int(st.token_ids[pos + 1])] = float(tlp[row])
                st.prompt_lp_acc.append(lps)
            offset += n

    def _compute_cascade(self, req_ids: list[str], rb: int, maxb: int):
        """Detect a batch-wide shared KV-page prefix for cascade decode
        (ref: cascade_attention, flash_attn.py:1013). Returns
        (cascade_blocks (CB,), suffix_tables (rb, maxb), cascade_len ())
        device arrays, or None. Shared pages must sit strictly below every
        request's write block (full, immutable prefix-cache blocks)."""
        from vllm_metax_tpu import envs

        if (
            not envs.METAX_TPU_CASCADE
            or len(req_ids) < 2
            or self.dcp_size > 1
            or self.pp_size > 1  # microbatch md slicing: keep cascade off
        ):
            return None
        bs = self.cache_cfg.block_size
        tabs = [self.requests[rid].block_ids for rid in req_ids]
        writable = min(
            self.requests[rid].num_computed_tokens for rid in req_ids
        ) // bs
        limit = min(min(len(t) for t in tabs), writable)
        first = tabs[0]
        c = 0
        while c < limit and all(t[c] == first[c] for t in tabs):
            c += 1
        if c < 1:
            return None
        cb = 1 << (c - 1).bit_length()  # bucketed static shape
        blocks = np.asarray(
            list(first[:c]) + [first[c - 1]] * (cb - c), np.int32
        )
        sfx = np.zeros((rb, maxb), np.int32)
        for i, rid in enumerate(req_ids):
            bids = np.asarray(self.requests[rid].block_ids[c:], np.int32)
            sfx[i, : len(bids)] = bids
        return (
            jnp.asarray(blocks),
            jnp.asarray(sfx),
            jnp.asarray(c * bs, jnp.int32),
        )

    def rescale_ep(self, new_ep_size: int) -> None:
        """Elastic expert parallelism: change the EP world size LIVE by
        re-meshing and re-sharding the parameter tree (expert banks
        redistribute over the new "ep" axis; XLA moves only the shards that
        change owners). Ref: examples/online_serving/elastic_ep/scale.py —
        the reference scales EP engines up/down between serving bursts.

        Requires an idle runner (the engine gates on no unfinished
        requests); compiled step programs are dropped and rebuilt lazily
        against the new mesh."""
        import jax as _jax

        from vllm_metax_tpu.parallel.mesh import make_tp_mesh, shard_params

        if new_ep_size == self.ep_size:
            return
        if self.model_cfg.num_experts % max(new_ep_size, 1):
            raise ValueError(
                f"num_experts={self.model_cfg.num_experts} must divide "
                f"expert_parallel_size={new_ep_size}"
            )
        pc = self.config.parallel_config
        need = (
            pc.tensor_parallel_size
            * max(new_ep_size, 1)
            * pc.pipeline_parallel_size
            * pc.decode_context_parallel_size
        )
        if need > len(_jax.devices()):
            raise ValueError(
                f"ep={new_ep_size} needs {need} devices, have "
                f"{len(_jax.devices())}"
            )
        new_mesh = make_tp_mesh(
            pc.tensor_parallel_size,
            max(new_ep_size, 1),
            pp_size=pc.pipeline_parallel_size,
            dcp_size=pc.decode_context_parallel_size,
        )
        self.mesh = new_mesh
        self.ep_size = new_ep_size
        pc.expert_parallel_size = new_ep_size
        specs = self._param_spec_tree()
        self.params = shard_params(self.params, specs, new_mesh)
        # KV pages re-placed on the new mesh (same tp/dcp layout)
        from vllm_metax_tpu.parallel.mesh import sanitize_specs

        kv_specs = self._kv_specs()
        from jax.sharding import NamedSharding

        kv_specs = sanitize_specs(kv_specs, self.kv_cache, new_mesh)
        self.kv_cache = _jax.tree_util.tree_map(
            lambda a, s: _jax.device_put(a, NamedSharding(new_mesh, s)),
            self.kv_cache,
            kv_specs,
        )
        self._step_fns.clear()
        self._multi_step_fns.clear()
        self._msd_cache = None
        logger.info("EP world size rescaled to %d", new_ep_size)

    def _needs_per_step_host_state(self, so: SchedulerOutput) -> bool:
        """Features whose per-step state can't ride the on-device window
        (FSM constraints, logit bias/bans, LoRA rows, live min_tokens)
        fall back to single-stepping; penalties stay in the window via the
        device-resident count carry."""
        for rid in so.num_scheduled_tokens:
            # penalties, min_tokens bans, bad_words, logit_bias and LoRA all
            # ride the on-device window now; only FSM-constrained requests
            # need per-step host state (the allow-mask depends on the
            # freshly sampled token)
            if self.requests[rid].constraint is not None:
                return True
        return False

    def _plain_sampling(self, req_ids) -> bool:
        """True when no scheduled row uses top-k/top-p/min-p — the sampler
        then skips the truncation machinery (static fast path)."""
        for rid in req_ids:
            sp = self.requests[rid].sampling_params
            if sp.top_k > 0 or sp.top_p < 1.0 or sp.min_p > 0.0:
                return False
        return True

    def _build_sampling_tensors(
        self, req_ids: list[str], rb: int, s_rows: int = 1
    ) -> SamplingTensors:
        """Per-row sampling params; with s_rows>1 (spec-decode verify), each
        request owns s_rows consecutive rows with per-position seeds."""
        n = rb * s_rows
        temp = np.zeros(n, np.float32)
        top_k = np.zeros(n, np.int32)
        top_p = np.ones(n, np.float32)
        min_p = np.zeros(n, np.float32)
        seeds = np.zeros(n, np.uint32)
        pres = np.zeros(n, np.float32)
        freq = np.zeros(n, np.float32)
        rep = np.ones(n, np.float32)
        for i, rid in enumerate(req_ids):
            st = self.requests[rid]
            sp = st.sampling_params
            rows = slice(i * s_rows, (i + 1) * s_rows)
            temp[rows] = sp.temperature
            if sp.top_k > _SAMPLER_TOP_K_CAP and not self._warned_top_k_cap:
                self._warned_top_k_cap = True
                logger.warning(
                    "top_k=%d exceeds the sampler's partial-top-k cap (%d); "
                    "sampling uses top_k=%d for this request",
                    sp.top_k, _SAMPLER_TOP_K_CAP, _SAMPLER_TOP_K_CAP,
                )
            top_k[rows] = sp.top_k
            top_p[rows] = sp.top_p
            min_p[rows] = sp.min_p
            pres[rows] = sp.presence_penalty
            freq[rows] = sp.frequency_penalty
            rep[rows] = sp.repetition_penalty
            for j in range(s_rows):
                if st.generator_seed is not None:
                    seeds[i * s_rows + j] = np.uint32(
                        hash((st.generator_seed, len(st.token_ids) + j))
                        & 0xFFFFFFFF
                    )
                else:
                    seeds[i * s_rows + j] = self.rng.integers(
                        0, 2**32, dtype=np.uint32
                    )
        return SamplingTensors(
            temperature=jnp.asarray(temp),
            top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p),
            min_p=jnp.asarray(min_p),
            seeds=jnp.asarray(seeds),
            presence_penalty=jnp.asarray(pres),
            frequency_penalty=jnp.asarray(freq),
            repetition_penalty=jnp.asarray(rep),
        )

    def _make_output(
        self, req_ids: list[str], out: SamplerOutput, so: SchedulerOutput,
        s_rows: int = 1, draft_rows=None, plp_arrs=None,
        complete_flags=None,
    ) -> ModelRunnerOutput:
        tokens = np.asarray(out.token_ids)
        if plp_arrs is not None:
            self._accumulate_prompt_logprobs(req_ids, so, plp_arrs)
        drafts_np = np.asarray(draft_rows) if draft_rows is not None else None
        any_lp = any(
            self.requests[rid].sampling_params.logprobs is not None
            for rid in req_ids
        )
        if any_lp:
            chosen_lp = np.asarray(out.chosen_logprob)
            topk_ids = np.asarray(out.topk_ids)
            topk_lps = np.asarray(out.topk_logprobs)

        def row_lp(row, tok):
            lps = {
                int(topk_ids[row, j]): float(topk_lps[row, j])
                for j in range(topk_ids.shape[1])
            }
            lps[tok] = float(chosen_lp[row])
            return lps

        result = ModelRunnerOutput()
        for i, rid in enumerate(req_ids):
            st = self.requests[rid]
            n = so.num_scheduled_tokens[rid]
            result.req_ids.append(rid)
            # token only valid if the whole context was computed this step
            # (launch-time flag when available — resolve-time state may
            # already reflect later pipelined launches)
            incomplete = (
                not complete_flags[rid]
                if complete_flags is not None
                else st.num_computed_tokens + n < len(st.token_ids)
            )
            if incomplete:
                result.sampled_token_ids.append([])
                result.logprobs.append(None)
                continue
            want_lp = st.sampling_params.logprobs is not None
            drafts = so.num_scheduled_spec_tokens.get(rid, [])
            parents = so.spec_token_parents.get(rid)
            emitted: list[int] = []
            lps: list[dict] = []
            last_row = i * s_rows
            if drafts and parents:
                # TREE verification: walk from the root, descending into the
                # child whose draft token matches the parent row's sampled
                # token; the final mismatching sample is the corrected/bonus
                # token (exact for point-mass proposals, like the linear walk)
                children: dict[int, list[int]] = {}
                for j, par in enumerate(parents):
                    children.setdefault(par, []).append(j)
                cur = -1
                path: list[int] = []
                while True:
                    row = i * s_rows + (0 if cur < 0 else cur + 1)
                    tok = int(tokens[row])
                    emitted.append(tok)
                    last_row = row
                    if want_lp:
                        lps.append(row_lp(row, tok))
                    nxt = next(
                        (c for c in children.get(cur, ()) if drafts[c] == tok),
                        None,
                    )
                    if nxt is None:
                        break
                    path.append(nxt)
                    cur = nxt
                # KV compaction: accepted node k sits at list-order slot
                # start+1+node but must live at path slot start+1+k
                start = st.num_computed_tokens
                bids = np.asarray(st.block_ids, np.int64)
                bs_ = self.cache_cfg.block_size
                for k_path, node in enumerate(path):
                    if node != k_path:
                        sp_, dp_ = start + 1 + node, start + 1 + k_path
                        self._kv_moves.append(
                            (
                                int(bids[sp_ // bs_] * bs_ + sp_ % bs_),
                                int(bids[dp_ // bs_] * bs_ + dp_ % bs_),
                            )
                        )
            else:
                # linear chains: accept the prefix the target reproduces;
                # the first mismatching sampled token is the corrected output
                # (exactly rejection sampling for point-mass ngram proposals)
                for j in range(1 + len(drafts)):
                    row = i * s_rows + j
                    tok = int(tokens[row])
                    emitted.append(tok)
                    last_row = row
                    if want_lp:
                        lps.append(row_lp(row, tok))
                    if j < len(drafts) and tok != drafts[j]:
                        break
            result.sampled_token_ids.append(emitted)
            st.token_ids.extend(emitted)
            result.logprobs.append(lps if want_lp else None)
            if st.prompt_lp_acc is not None and emitted:
                # prefill just completed: ship position-0=None + accumulated
                # per-position dicts alongside the first sampled token
                result.prompt_logprobs[rid] = [None] + st.prompt_lp_acc
                st.prompt_lp_acc = None
            if drafts_np is not None and emitted:
                # the draft head conditioned on the LAST COMMITTED row's
                # sampled token proposes the next step's speculative tokens
                cand = drafts_np[last_row]
                branch = np.atleast_1d(np.asarray(cand)).tolist()
                result.draft_tokens[rid] = [int(c) for c in branch]
                if len(branch) > 1:
                    result.draft_parents[rid] = [-1] * len(branch)
        if self._kv_moves:
            self._apply_kv_moves()
        return result
