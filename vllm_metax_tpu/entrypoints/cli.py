"""Command-line interface: `python -m vllm_metax_tpu <command>`.

Mirrors the reference's CLI surface (vllm serve / vllm bench
latency|throughput|serve — smoke-tested by tests/benchmarks/test_latency_cli.py
and test_serve_cli.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", required=True)
    p.add_argument("--dtype", default="auto")
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-num-batched-tokens", type=int, default=1024)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--quantization", default=None)
    p.add_argument("--tensor-parallel-size", type=int, default=1)
    p.add_argument("--num-decode-steps", type=int, default=1)
    p.add_argument("--load-format", default="auto")
    p.add_argument("--seed", type=int, default=0)


def _engine_kwargs(args) -> dict:
    return dict(
        dtype=args.dtype,
        max_model_len=args.max_model_len,
        max_num_seqs=args.max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        block_size=args.block_size,
        kv_cache_dtype=args.kv_cache_dtype,
        quantization=args.quantization,
        tensor_parallel_size=args.tensor_parallel_size,
        num_decode_steps=args.num_decode_steps,
        load_format=args.load_format,
        seed=args.seed,
    )


def _build_llm(args):
    from vllm_metax_tpu.entrypoints.llm import LLM

    kwargs = {k: v for k, v in _engine_kwargs(args).items() if v is not None}
    return LLM(model=args.model, **kwargs)


def cmd_serve(args) -> int:
    from vllm_metax_tpu.entrypoints import api_server

    argv = ["--model", args.model, "--host", args.host, "--port", str(args.port)]
    for flag, val in [
        ("--dtype", args.dtype),
        ("--max-model-len", args.max_model_len),
        ("--max-num-seqs", args.max_num_seqs),
        ("--max-num-batched-tokens", args.max_num_batched_tokens),
        ("--block-size", args.block_size),
        ("--kv-cache-dtype", args.kv_cache_dtype),
        ("--quantization", args.quantization),
        ("--tensor-parallel-size", args.tensor_parallel_size),
        ("--num-decode-steps", args.num_decode_steps),
        ("--load-format", args.load_format),
    ]:
        if val is not None:
            argv += [flag, str(val)]
    api_server.main(argv)
    return 0


def cmd_bench_latency(args) -> int:
    """Single-batch generation latency (ref: vllm bench latency)."""
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = _build_llm(args)
    rng = np.random.default_rng(args.seed)
    vocab = llm.config.model_config.vocab_size
    prompts = [
        rng.integers(0, vocab, size=args.input_len).tolist()
        for _ in range(args.batch_size)
    ]
    sp = SamplingParams(max_tokens=args.output_len, temperature=0.0,
                        ignore_eos=True)
    times = []
    for i in range(args.num_iters_warmup + args.num_iters):
        t0 = time.perf_counter()
        llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        dt = time.perf_counter() - t0
        if i >= args.num_iters_warmup:
            times.append(dt)
    lat = float(np.mean(times))
    print(
        json.dumps(
            {
                "avg_latency_s": round(lat, 4),
                "p50_latency_s": round(float(np.percentile(times, 50)), 4),
                "p99_latency_s": round(float(np.percentile(times, 99)), 4),
                "tokens_per_s": round(
                    args.batch_size * args.output_len / lat, 1
                ),
            }
        )
    )
    return 0


def cmd_bench_throughput(args) -> int:
    """Offline throughput over a batch of random requests
    (ref: vllm bench throughput)."""
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = _build_llm(args)
    rng = np.random.default_rng(args.seed)
    vocab = llm.config.model_config.vocab_size
    prompts = [
        rng.integers(0, vocab, size=args.input_len).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = SamplingParams(max_tokens=args.output_len, temperature=0.0,
                        ignore_eos=True)
    llm.generate(prompt_token_ids=prompts[:2], sampling_params=sp)  # warmup
    t0 = time.perf_counter()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    total_out = sum(len(o.outputs[0].token_ids) for o in outs)
    total = total_out + args.num_prompts * args.input_len
    print(
        json.dumps(
            {
                "elapsed_s": round(dt, 3),
                "requests_per_s": round(args.num_prompts / dt, 2),
                "output_tokens_per_s": round(total_out / dt, 1),
                "total_tokens_per_s": round(total / dt, 1),
            }
        )
    )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vllm-metax-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_serve = sub.add_parser("serve", help="start the OpenAI-compatible server")
    _add_engine_args(p_serve)
    p_serve.add_argument("--host", default="0.0.0.0")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.set_defaults(fn=cmd_serve)

    p_bench = sub.add_parser("bench", help="benchmarks")
    bench_sub = p_bench.add_subparsers(dest="bench_command", required=True)

    p_lat = bench_sub.add_parser("latency")
    _add_engine_args(p_lat)
    p_lat.add_argument("--input-len", type=int, default=32)
    p_lat.add_argument("--output-len", type=int, default=128)
    p_lat.add_argument("--batch-size", type=int, default=8)
    p_lat.add_argument("--num-iters-warmup", type=int, default=1)
    p_lat.add_argument("--num-iters", type=int, default=3)
    p_lat.set_defaults(fn=cmd_bench_latency)

    p_thr = bench_sub.add_parser("throughput")
    _add_engine_args(p_thr)
    p_thr.add_argument("--input-len", type=int, default=32)
    p_thr.add_argument("--output-len", type=int, default=128)
    p_thr.add_argument("--num-prompts", type=int, default=64)
    p_thr.set_defaults(fn=cmd_bench_throughput)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
