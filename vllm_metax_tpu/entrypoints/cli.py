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
        ("--num-hosts", args.num_hosts),
        ("--host-rank", args.host_rank),
        ("--coordinator-address", args.coordinator_address),
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


def cmd_bench_serve(args) -> int:
    """Online serving benchmark: Poisson (or burst) request arrivals against
    the async engine, reporting TTFT / TPOT / goodput (ref: vllm bench
    serve, tests/benchmarks/test_serve_cli.py — ours drives the in-process
    AsyncEngine so it measures the serving stack without HTTP noise)."""
    import threading

    from vllm_metax_tpu.config import EngineConfig
    from vllm_metax_tpu.entrypoints.async_engine import AsyncEngine
    from vllm_metax_tpu.entrypoints.llm import _build_engine_config
    from vllm_metax_tpu.sample.params import SamplingParams

    kwargs = {k: v for k, v in _engine_kwargs(args).items() if v is not None}
    cfg = _build_engine_config(model=args.model, **kwargs)
    eng = AsyncEngine(cfg)
    rng = np.random.default_rng(args.seed)
    vocab = cfg.model_config.vocab_size
    prompts = [
        rng.integers(0, vocab, size=args.input_len).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = SamplingParams(
        max_tokens=args.output_len, temperature=0.0, ignore_eos=True
    )
    # warmup (compiles prefill + decode programs)
    for _ in eng.stream(prompts[0], sp):
        pass

    if args.request_rate and args.request_rate > 0:
        gaps = rng.exponential(1.0 / args.request_rate, args.num_prompts)
    else:
        gaps = np.zeros(args.num_prompts)  # burst: all at t=0
    arrivals = np.cumsum(gaps)

    results = [None] * args.num_prompts
    lock = threading.Lock()

    def worker(i):
        t_send = time.perf_counter()
        first = None
        n_out = 0
        for item in eng.stream(prompts[i], sp):
            now = time.perf_counter()
            if first is None and item.new_token_ids:
                first = now
            n_out += len(item.new_token_ids)
        with lock:
            results[i] = (t_send, first, time.perf_counter(), n_out)

    t0 = time.perf_counter()
    threads = []
    for i in range(args.num_prompts):
        wait = t0 + arrivals[i] - time.perf_counter()
        if wait > 0:
            time.sleep(wait)
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    t_end = time.perf_counter()
    eng.shutdown()

    ttfts = np.asarray([r[1] - r[0] for r in results if r and r[1]])
    tpots = np.asarray([
        (r[2] - r[1]) / max(r[3] - 1, 1) for r in results if r and r[1]
    ])
    total_out = sum(r[3] for r in results if r)
    dur = t_end - t0
    print(
        json.dumps(
            {
                "completed": sum(r is not None for r in results),
                "duration_s": round(dur, 3),
                "request_rate": args.request_rate or "burst",
                "requests_per_s": round(args.num_prompts / dur, 3),
                "output_tokens_per_s": round(total_out / dur, 1),
                "mean_ttft_s": round(float(ttfts.mean()), 4),
                "p50_ttft_s": round(float(np.percentile(ttfts, 50)), 4),
                "p99_ttft_s": round(float(np.percentile(ttfts, 99)), 4),
                "mean_tpot_s": round(float(tpots.mean()), 5),
                "p99_tpot_s": round(float(np.percentile(tpots, 99)), 5),
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
    p_serve.add_argument("--num-hosts", type=int, default=1)
    p_serve.add_argument("--host-rank", type=int, default=0)
    p_serve.add_argument("--coordinator-address", default="127.0.0.1:29500")
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

    p_srv = bench_sub.add_parser("serve")
    _add_engine_args(p_srv)
    p_srv.add_argument("--input-len", type=int, default=128)
    p_srv.add_argument("--output-len", type=int, default=64)
    p_srv.add_argument("--num-prompts", type=int, default=32)
    p_srv.add_argument(
        "--request-rate", type=float, default=0.0,
        help="Poisson arrival rate (req/s); 0 = burst",
    )
    p_srv.set_defaults(fn=cmd_bench_serve)

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
