"""Data-parallel serving replicas (analog of the reference's
examples/offline_inference/data_parallel.py). Each replica owns a device
slice; the process backend gives every replica its own Python process."""

from vllm_metax_tpu.config import EngineConfig, ModelConfig, ParallelConfig
from vllm_metax_tpu.entrypoints.async_engine import EnginePool
from vllm_metax_tpu.sample.params import SamplingParams

config = EngineConfig(
    model_config=ModelConfig.from_pretrained("/path/to/model"),
    parallel_config=ParallelConfig(data_parallel_size=2),
)
pool = EnginePool(config, dp_size=2, backend="process")
for item in pool.stream([1, 2, 3, 4], SamplingParams(max_tokens=16)):
    print(item.new_token_ids, end=" ", flush=True)
pool.shutdown()
