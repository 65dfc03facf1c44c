"""Sharded-state save/load for fast TP restarts (analog of the reference's
save_sharded_state.py / load_sharded_state.py examples)."""

from vllm_metax_tpu import LLM

llm = LLM(model="/path/to/model", tensor_parallel_size=4)
llm.save_sharded_state("/path/to/sharded")  # per-shard arrays, no repack

# later: boot directly from the sharded snapshot (skips HF load + repack)
llm2 = LLM(model="/path/to/sharded", load_format="sharded_state",
           tensor_parallel_size=4)
