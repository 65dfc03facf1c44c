"""Offline inference API (vLLM `LLM`-compatible surface; the reference's e2e
tests drive exactly this: tests/e2e/test_offline_inference_basic.py via the
VllmRunner fixture, tests/conftest.py:779)."""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    ParallelConfig,
    QuantizationConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.outputs import CompletionOutput, RequestOutput
from vllm_metax_tpu.sample.params import SamplingParams, tokenize_bad_words
from vllm_metax_tpu.utils import Counter

logger = init_logger(__name__)


def _build_engine_config(
    model: str,
    *,
    dtype: str = "auto",
    max_model_len: Optional[int] = None,
    block_size: int = 16,
    num_kv_blocks: Optional[int] = None,
    gpu_memory_utilization: float = 0.9,
    kv_cache_dtype: str = "auto",
    enable_prefix_caching: bool = True,
    max_num_seqs: int = 64,
    max_num_batched_tokens: int = 1024,
    enable_chunked_prefill: bool = True,
    num_decode_steps: int = 1,
    tensor_parallel_size: int = 1,
    expert_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    decode_context_parallel_size: int = 1,
    load_format: str = "auto",
    quantization: Optional[str] = None,
    quantization_bits: Optional[int] = None,
    quantization_group_size: Optional[int] = None,
    seed: int = 0,
    speculative_config: Optional[dict] = None,
    enable_lora: bool = False,
    max_loras: int = 4,
    max_lora_rank: int = 16,
    enable_lora_experts: bool = False,
    num_hosts: int = 1,
    host_rank: int = 0,
    coordinator_address: str = "127.0.0.1:29500",
    sparse_attention: str = "",
    sparse_attention_threshold: Optional[int] = None,
    sparse_nnz_v: Optional[int] = None,
    sparse_nnz_s: Optional[int] = None,
    sparse_block_budget: Optional[int] = None,
) -> EngineConfig:
    overrides = {"dtype": dtype} if dtype != "auto" else {}
    if max_model_len:
        overrides["max_model_len"] = max_model_len
    if sparse_attention:
        overrides["sparse_attention"] = sparse_attention
        for name, val in (
            ("sparse_attention_threshold", sparse_attention_threshold),
            ("sparse_nnz_v", sparse_nnz_v),
            ("sparse_nnz_s", sparse_nnz_s),
            ("sparse_block_budget", sparse_block_budget),
        ):
            if val is not None:
                overrides[name] = val
    if model and (
        os.path.isdir(model)
        or (model.endswith(".gguf") and os.path.isfile(model))
    ):
        model_config = ModelConfig.from_pretrained(model, **overrides)
        quant_config = QuantizationConfig.from_hf_config(model_config.hf_config)
    else:
        raise ValueError(
            f"model {model!r} is not a local directory (no network egress; "
            "download checkpoints beforehand or pass a ModelConfig)"
        )
    fp8_ckpt = quant_config.enabled and (
        quant_config.method == "fp8"
        or (
            quant_config.method == "compressed-tensors"
            and quant_config.ct_scheme == "fp8"
        )
    )
    if quantization and (
        not quant_config.enabled
        or (fp8_ckpt and quantization not in ("fp8",))
    ):
        # on-the-fly quantization of a bf16 checkpoint — or load-time
        # REQUANTIZATION of an fp8 checkpoint (weights dequantize exactly
        # at read, so e.g. quantization="w8a8_int8" serves fp8 checkpoints
        # on the int8 MXU instead of the VPU-bound e4m3 dequant path;
        # int8 per-channel measured -0.38% on the PPL gate)
        quant_config = QuantizationConfig(
            method=quantization,
            bits=quantization_bits
            or (4 if quantization in ("gptq", "awq", "int4") else 8),
            group_size=quantization_group_size
            or (128 if quantization in ("gptq", "awq", "int4") else -1),
        )
    cache_config = CacheConfig(
        block_size=block_size,
        num_blocks=num_kv_blocks or 512,
        kv_cache_dtype=kv_cache_dtype,
        gpu_memory_utilization=gpu_memory_utilization,
        enable_prefix_caching=enable_prefix_caching,
    )
    spec_cfg = SpeculativeConfig(**speculative_config) if speculative_config else (
        SpeculativeConfig()
    )
    lora_cfg = None
    if enable_lora:
        from vllm_metax_tpu.lora import LoRAConfig

        lora_cfg = LoRAConfig(
            max_loras=max_loras,
            max_lora_rank=max_lora_rank,
            lora_experts=enable_lora_experts,
        )
    return EngineConfig(
        model_config=model_config,
        cache_config=cache_config,
        scheduler_config=SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            enable_chunked_prefill=enable_chunked_prefill,
            num_decode_steps=num_decode_steps,
        ),
        parallel_config=ParallelConfig(
            tensor_parallel_size=tensor_parallel_size,
            expert_parallel_size=expert_parallel_size,
            pipeline_parallel_size=pipeline_parallel_size,
            decode_context_parallel_size=decode_context_parallel_size,
            num_hosts=num_hosts,
            host_rank=host_rank,
            coordinator_address=coordinator_address,
        ),
        load_config=LoadConfig(load_format=load_format, seed=seed),
        quant_config=quant_config,
        speculative_config=spec_cfg,
        lora_config=lora_cfg,
    )


class LLM:
    def __init__(
        self,
        model: str = "",
        *,
        engine_config: Optional[EngineConfig] = None,
        tokenizer: Optional[str] = None,
        **kwargs,
    ):
        if engine_config is None:
            engine_config = _build_engine_config(model, **kwargs)
        self.config = engine_config
        mesh = None
        pc = engine_config.parallel_config
        if pc.num_hosts > 1:
            # DCN bootstrap BEFORE the first device query: jax.devices()
            # becomes the global list and the mesh below spans hosts
            from vllm_metax_tpu.parallel import multihost

            multihost.initialize(
                pc.coordinator_address, pc.num_hosts, pc.host_rank
            )
        if (
            pc.tensor_parallel_size > 1
            or pc.expert_parallel_size > 1
            or pc.pipeline_parallel_size > 1
            or pc.decode_context_parallel_size > 1
        ):
            from vllm_metax_tpu.parallel.mesh import make_tp_mesh

            mesh = make_tp_mesh(
                pc.tensor_parallel_size,
                pc.expert_parallel_size,
                pp_size=pc.pipeline_parallel_size,
                dcp_size=pc.decode_context_parallel_size,
            )
        self.engine = EngineCore(engine_config, mesh=mesh)
        self._counter = Counter()
        self.tokenizer = self._load_tokenizer(
            tokenizer or engine_config.model_config.model
        )

    def _normalize_mm(self, mmd) -> Optional[dict]:
        from vllm_metax_tpu.multimodal import normalize_mm_data

        return normalize_mm_data(mmd, self.engine.config.model_config)

    def _expand_mm_placeholders(self, ids: list[int], mmd: dict) -> list[int]:
        from vllm_metax_tpu.multimodal import expand_placeholders

        return expand_placeholders(
            ids, mmd, self.engine.config.model_config
        )

    @staticmethod
    def _load_tokenizer(path: str):
        if not path:
            return None
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path)
        except Exception as e:  # dummy checkpoints have no tokenizer files
            logger.warning("no tokenizer loaded from %s (%s)", path, e)
            return None

    @property
    def eos_token_id(self) -> Optional[int]:
        if self.tokenizer is not None:
            return self.tokenizer.eos_token_id
        return self.config.model_config.hf_config.get("eos_token_id")

    def generate(
        self,
        prompts: Union[str, dict, Sequence, None] = None,
        sampling_params: Union[SamplingParams, Sequence[SamplingParams], None] = None,
        *,
        prompt_token_ids: Optional[Sequence[Sequence[int]]] = None,
        lora_request=None,  # LoRARequest or list thereof (vllm parity)
    ) -> list[RequestOutput]:
        if prompts is not None and isinstance(prompts, (str, dict)):
            prompts = [prompts]
        # vLLM-style dict prompts: {"prompt" | "prompt_token_ids",
        # "multi_modal_data": {"image": {"pixel_values", "image_grid_thw"}}}
        mm_datas = None
        if prompts is not None and any(isinstance(p, dict) for p in prompts):
            dicts = [
                p if isinstance(p, dict) else {"prompt": p} for p in prompts
            ]
            mm_datas = [self._normalize_mm(d.get("multi_modal_data"))
                        for d in dicts]
            if prompt_token_ids is None:
                prompt_token_ids = []
                for d, mmd in zip(dicts, mm_datas):
                    if "prompt_token_ids" in d:
                        ids = list(d["prompt_token_ids"])
                    elif self.tokenizer is not None:
                        ids = self.tokenizer.encode(d["prompt"])
                    else:
                        raise ValueError("no tokenizer; pass prompt_token_ids")
                    if mmd is not None:
                        ids = self._expand_mm_placeholders(ids, mmd)
                    prompt_token_ids.append(ids)
            prompts = [d.get("prompt") for d in dicts]
        if prompt_token_ids is None:
            if self.tokenizer is None:
                raise ValueError("no tokenizer; pass prompt_token_ids")
            prompt_token_ids = [
                self.tokenizer.encode(p) for p in prompts  # type: ignore[union-attr]
            ]
        n = len(prompt_token_ids)
        if mm_datas is None:
            mm_datas = [None] * n
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n

        if lora_request is not None and not isinstance(lora_request, list):
            lora_request = [lora_request] * n
        lora_names = []
        for lr in lora_request or [None] * n:
            if lr is None:
                lora_names.append(None)
            else:
                if lr.lora_path:
                    self.engine.runner.add_lora(lr.lora_name, lr.lora_path)
                lora_names.append(lr.lora_name)

        req_ids = []
        for toks, sp, lname, mmd in zip(prompt_token_ids, sampling_params,
                                        lora_names, mm_datas):
            if sp.bad_words and self.tokenizer is not None and not sp.bad_words_token_ids:
                sp.bad_words_token_ids = tokenize_bad_words(
                    sp.bad_words, self.tokenizer
                )
            if sp.guided_choice and self.tokenizer is not None and not getattr(
                sp, "_guided_token_choices", None
            ):
                sp._guided_token_choices = [
                    self.tokenizer.encode(c, add_special_tokens=False)
                    for c in sp.guided_choice
                ]
            if (
                (sp.guided_regex or sp.guided_json or sp.guided_grammar)
                and self.tokenizer is not None
                and not getattr(sp, "_guided_fsm", None)
            ):
                from vllm_metax_tpu.guided_fsm import (
                    get_token_fsm,
                    json_schema_to_regex,
                )

                if sp.guided_grammar:
                    # regex-inlined when non-recursive; pushdown token FSM
                    # for true CFG nesting (guided_grammar.PushdownTokenFSM)
                    from vllm_metax_tpu.guided_grammar import (
                        grammar_token_fsm,
                    )

                    sp._guided_fsm = grammar_token_fsm(
                        sp.guided_grammar, self.tokenizer
                    )
                else:
                    pattern = sp.guided_regex or json_schema_to_regex(
                        sp.guided_json
                    )
                    sp._guided_fsm = get_token_fsm(pattern, self.tokenizer)
            # n>1: fan out into n engine requests (parallel sampling); the
            # prefix cache dedups the shared-prompt prefill across children
            children = []
            for k in range(sp.n):
                rid = str(next(self._counter))
                children.append(rid)
                self.engine.add_request(
                    rid,
                    list(toks),
                    sp if sp.n == 1 else sp.child(k),
                    self.eos_token_id,
                    lora_name=lname,
                    multi_modal_data=mmd,
                )
            req_ids.append(children)

        acc: dict[str, dict] = {
            rid: {"tokens": [], "logprobs": [], "finish_reason": None,
                  "stop": None, "prompt_logprobs": None}
            for children in req_ids
            for rid in children
        }
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                a = acc[out.req_id]
                a["tokens"].extend(out.new_token_ids)
                if out.new_logprobs:
                    a["logprobs"].extend(out.new_logprobs)
                if out.prompt_logprobs is not None:
                    a["prompt_logprobs"] = out.prompt_logprobs
                if out.finished:
                    a["finish_reason"] = out.finish_reason
                    a["stop"] = out.stop_reason

        results = []
        for i, children in enumerate(req_ids):
            sp = sampling_params[i]
            completions = []
            for k, rid in enumerate(children):
                a = acc[rid]
                text = ""
                tokens = a["tokens"]
                if self.tokenizer is not None and sp.detokenize:
                    text = self.tokenizer.decode(
                        tokens, skip_special_tokens=sp.skip_special_tokens
                    )
                    # stop-string truncation (post-hoc; streaming handles inline)
                    for s in sp.stop or []:
                        idx = text.find(s)
                        if idx >= 0:
                            text = text[:idx]
                completions.append(
                    CompletionOutput(
                        index=k,
                        text=text,
                        token_ids=tokens,
                        logprobs=a["logprobs"] or None,
                        cumulative_logprob=None,
                        finish_reason=a["finish_reason"],
                        stop_reason=a["stop"],
                    )
                )
            results.append(
                RequestOutput(
                    request_id=children[0],
                    prompt=prompts[i] if prompts is not None else None,
                    prompt_token_ids=list(prompt_token_ids[i]),
                    prompt_logprobs=acc[children[0]]["prompt_logprobs"],
                    outputs=completions,
                    finished=True,
                )
            )
        return results

    def chat(
        self,
        messages,
        sampling_params: Optional["SamplingParams"] = None,
        add_generation_prompt: bool = True,
    ):
        """Offline chat interface: apply the tokenizer's chat template, then
        generate (the reference's LLM.chat surface). `messages` is one
        conversation (list of {role, content} dicts) or a list of them."""
        if self.tokenizer is None:
            raise ValueError("chat() requires a tokenizer")
        if messages and isinstance(messages[0], dict):
            messages = [messages]
        token_ids = [
            self.tokenizer.apply_chat_template(
                conv, add_generation_prompt=add_generation_prompt
            )
            for conv in messages
        ]
        return self.generate(
            prompt_token_ids=token_ids, sampling_params=sampling_params
        )

    def embed(
        self,
        prompts: Union[str, Sequence[str], None] = None,
        *,
        prompt_token_ids: Optional[Sequence[Sequence[int]]] = None,
        pooling: str = "last",  # "last" | "mean"
    ):
        """Pooled hidden-state embeddings (the reference's pooling-model
        surface, exercised by its MTEB tests). Teacher-forced prefill per
        prompt; returns one vector per prompt."""
        import numpy as np

        from vllm_metax_tpu.evaluation.ppl import _prefill_hidden

        if prompts is not None and isinstance(prompts, str):
            prompts = [prompts]
        if prompt_token_ids is None:
            if self.tokenizer is None:
                raise ValueError("no tokenizer; pass prompt_token_ids")
            prompt_token_ids = [self.tokenizer.encode(p) for p in prompts]
        out = []
        for toks in prompt_token_ids:
            hidden = _prefill_hidden(self.engine.runner, list(toks))
            if pooling == "mean":
                out.append(np.asarray(hidden).mean(axis=0))
            else:
                out.append(np.asarray(hidden)[-1])
        return out

    def sleep(self, level: int = 1) -> None:
        self.engine.sleep(level)

    def wake_up(self) -> None:
        self.engine.wake_up()

    def save_sharded_state(self, path: str) -> None:
        self.engine.save_sharded_state(path)

    def get_stats(self) -> dict:
        return self.engine.stats.snapshot()
