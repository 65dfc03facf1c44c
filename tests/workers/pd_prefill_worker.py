"""Prefill-engine server process for the PD-over-socket test
(tests/test_pd_transport.py). Mirrors the reference's toy proxy topology
(tests/v1/kv_connector/nixl_integration/toy_proxy_server.py)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port_file = sys.argv[1]

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
    from vllm_metax_tpu.distributed.pd_transport import PrefillServer

    # MUST match tests/conftest.py small_model_config (same dummy weights
    # from seed 0 on both sides of the handoff)
    mc = ModelConfig(
        model="dummy-llama",
        architecture="LlamaForCausalLM",
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=512,
        max_position_embeddings=1024,
        max_model_len=1024,
        rope_theta=10000.0,
        dtype="float32",
    )
    engine = EngineCore(
        EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4, max_num_batched_tokens=64
            ),
            parallel_config=ParallelConfig(),
            load_config=LoadConfig(load_format="dummy", seed=0),
            quant_config=QuantizationConfig(),
        )
    )
    server = PrefillServer(engine)
    with open(port_file + ".tmp", "w") as f:
        f.write(str(server.address[1]))
    os.rename(port_file + ".tmp", port_file)
    server.serve_forever()


if __name__ == "__main__":
    main()
