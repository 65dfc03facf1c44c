"""Test harness.

Forces an 8-device virtual CPU mesh so multi-chip sharding paths compile and
execute without TPU hardware (mirrors how the reference tests TP=2 on one node,
tests/e2e/test_offline_inference_parallel.py). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize pins jax_platforms=axon at interpreter start; the env
# var alone doesn't win, so override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_model_config():
    """Tiny Llama-style config, CPU-fast (pattern of the reference's dummy-weight
    tests, tests/benchmarks/test_latency_cli.py:14)."""
    from vllm_metax_tpu.config import ModelConfig

    return ModelConfig(
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
