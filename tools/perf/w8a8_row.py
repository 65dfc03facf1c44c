"""8B W8A8-int8 decode row (the fp8-checkpoint requantize-override
serving mode): bench fp8-row protocol (warm wave + measured wave), 32
reqs x 64/32. Measured 2444.1 tok/s vs the fp8 path 1166 (2.1x) on 1xv5e
-- quantization=\"w8a8_int8\" on an fp8 checkpoint runs the int8 MXU
stacked kernel instead of the VPU-bound e4m3 dequant."""
import json
import numpy as np
import bench as B

def main():
    from vllm_metax_tpu.config import (CacheConfig, EngineConfig, LoadConfig,
        ModelConfig, QuantizationConfig, SchedulerConfig)
    from vllm_metax_tpu.core.engine import EngineCore
    num_reqs, prompt_len, decode_len = 32, 64, 32
    mc = ModelConfig(
        model="llama-3-8b-dummy-w8a8", architecture="LlamaForCausalLM",
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, vocab_size=128256,
        max_position_embeddings=8192, max_model_len=2048,
        rope_theta=500000.0, dtype="bfloat16")
    need = num_reqs * (prompt_len + decode_len)
    config = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=128,
            num_blocks=max(40, 5 * need // (4 * 128)),
            kv_cache_dtype="int8"),
        scheduler_config=SchedulerConfig(max_num_seqs=num_reqs,
            max_num_batched_tokens=1024, num_decode_steps=32),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(method="w8a8_int8", bits=8,
                                        lm_head_quantized=True),
    )
    engine = EngineCore(config)
    rng = np.random.default_rng(0)
    B._run_wave(engine, num_reqs, prompt_len, decode_len, rng)  # warm
    res = B._run_wave(engine, num_reqs, prompt_len, decode_len, rng)
    print(json.dumps({"w8a8_int8_8b_decode_tok_s": round(res["decode_tok_s"], 1)}))

main()
