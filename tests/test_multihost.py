"""Multi-host (DCN) SPMD engine tests.

Two subprocesses, each a "host" with 4 virtual CPU devices, joined by
jax.distributed.initialize into one 8-device global mesh (the CPU-testable
stand-in for 2 TPU hosts over DCN). TP=8 spans both processes; generated
tokens must agree across hosts AND match a single-process TP=8 run.

Reference analog: multi-node serving with --node-size/--node-rank/
--master-addr (examples/offline_inference/data_parallel.py:17-28); the
bootstrap being replaced is the MCCL unique-id exchange
(vllm_metax/patch/distributed/pynccl_wrapper.py:28-196).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

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
from vllm_metax_tpu.parallel.mesh import make_tp_mesh
from vllm_metax_tpu.sample.params import SamplingParams

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "workers", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
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
        parallel_config=ParallelConfig(tensor_parallel_size=8),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(),
    )
    engine = EngineCore(config, mesh=make_tp_mesh(8))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    for i, p in enumerate(prompts):
        engine.add_request(f"r{i}", p, SamplingParams(max_tokens=8))
    acc = {f"r{i}": [] for i in range(len(prompts))}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    return [acc[f"r{i}"] for i in range(len(prompts))]


def _make_tiny_checkpoint(tmp_path):
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=32000,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp_path / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    from tests.test_api_server import _make_tiny_tokenizer

    _make_tiny_tokenizer(path)
    return path


def test_two_host_serve(tmp_path):
    """`serve --num-hosts 2 --host-rank k` starts: host 0 answers HTTP over
    the 2-process global mesh; host 1 follows via the broadcast request
    plane (the VERDICT r3 done-bar for the multi-host skeleton)."""
    import json as _json
    import time
    import urllib.request

    model = _make_tiny_checkpoint(tmp_path)
    coord = _free_port()
    http_port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "workers",
                          "multihost_serve_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(http_port), str(coord),
             model],
            env=env,
            cwd=ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for r in range(2)
    ]
    try:
        deadline = time.time() + 420
        out = None
        while time.time() < deadline:
            for p in procs:
                if p.poll() is not None:
                    _, err = p.communicate()
                    raise AssertionError(
                        f"serve worker died:\n{err[-3000:]}"
                    )
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{http_port}/v1/completions",
                    data=_json.dumps(
                        {
                            "prompt": "hello world",
                            "max_tokens": 4,
                            "temperature": 0.0,
                        }
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=120) as resp:
                    out = _json.loads(resp.read())
                break
            except (ConnectionError, OSError):
                time.sleep(1.0)
        assert out is not None, "server never came up"
        assert out["usage"]["completion_tokens"] == 4
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()


def test_two_host_tp8_token_exact():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=ROOT,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(json.loads(lines[-1][len("RESULT"):]))

    assert outs[0] == outs[1], "hosts disagree"
    ref = _single_process_reference()
    assert outs[0] == ref, "multi-host output != single-process output"
