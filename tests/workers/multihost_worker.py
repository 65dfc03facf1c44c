"""Worker process for the 2-host DCN SPMD test (tests/test_multihost.py).

Each worker = one "host": 4 virtual CPU devices, joined into one 8-device
global mesh via jax.distributed.initialize (parallel/multihost.py). Runs the
tiny llama engine at TP=8 spanning both processes and prints the generated
tokens as JSON — the test asserts both hosts agree and match a single-process
TP=8 run (the reference's multi-node exactness bar,
examples/offline_inference/data_parallel.py:17-28).
"""

import json
import os
import sys

import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]

    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        ParallelConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.parallel import multihost
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.sample.params import SamplingParams

    multihost.initialize(f"127.0.0.1:{port}", num_hosts=2, host_rank=rank)
    assert jax.process_count() == 2, "distributed bring-up failed"
    assert len(jax.devices()) == 8

    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=512,
        max_position_embeddings=256,
        max_model_len=256,
        dtype="float32",
    )
    config = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        parallel_config=ParallelConfig(tensor_parallel_size=8, num_hosts=2),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(),
    )
    engine = EngineCore(config, mesh=make_tp_mesh(8))

    # host 0 owns the request stream; followers receive it over the
    # broadcast request plane — the multi-host analog of the reference's
    # master-addr request distribution
    if multihost.is_primary():
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
        prompts = multihost.broadcast_pyobj(prompts)
    else:
        prompts = multihost.broadcast_pyobj()

    for i, p in enumerate(prompts):
        engine.add_request(f"r{i}", p, SamplingParams(max_tokens=8))
    acc = {f"r{i}": [] for i in range(len(prompts))}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    result = [acc[f"r{i}"] for i in range(len(prompts))]
    print("RESULT" + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
