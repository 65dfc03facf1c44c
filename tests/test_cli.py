"""CLI smoke tests (the reference only asserts its bench CLIs exit 0,
tests/benchmarks/test_latency_cli.py:11-20 — same bar here, in-process)."""

import json

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("cli")
    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    return path


def test_bench_latency_cli(tiny_ckpt, capsys):
    from vllm_metax_tpu.entrypoints.cli import main

    rc = main(
        [
            "bench", "latency", "--model", tiny_ckpt, "--dtype", "float32",
            "--input-len", "8", "--output-len", "4", "--batch-size", "2",
            "--num-iters", "1", "--num-iters-warmup", "1",
            "--max-model-len", "128",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["avg_latency_s"] > 0 and out["tokens_per_s"] > 0


def test_bench_throughput_cli(tiny_ckpt, capsys):
    from vllm_metax_tpu.entrypoints.cli import main

    rc = main(
        [
            "bench", "throughput", "--model", tiny_ckpt, "--dtype", "float32",
            "--input-len", "8", "--output-len", "4", "--num-prompts", "4",
            "--max-model-len", "128", "--num-decode-steps", "4",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["output_tokens_per_s"] > 0


def test_bench_serve_cli(tiny_ckpt, capsys):
    """vllm bench serve analog: Poisson arrivals against the async engine
    (ref: tests/benchmarks/test_serve_cli.py smoke surface)."""
    import json as _json

    from vllm_metax_tpu.entrypoints.cli import main

    rc = main([
        "bench", "serve", "--model", tiny_ckpt, "--dtype", "float32",
        "--input-len", "8", "--output-len", "4", "--num-prompts", "4",
        "--request-rate", "50", "--max-num-seqs", "4",
        "--max-num-batched-tokens", "32",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["completed"] == 4
    assert out["output_tokens_per_s"] > 0
    assert out["p99_ttft_s"] >= out["p50_ttft_s"] > 0
