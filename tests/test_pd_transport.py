"""PD disaggregation over a real (TCP) transport: a prefill engine process
serves KV handoffs over a socket; a decode engine imports them and
continues generation token-exactly vs a monolithic engine.

Reference analog: tests/v1/kv_connector/nixl_integration/toy_proxy_server.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    QuantizationConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.distributed.kv_transfer import import_prompt_kv
from vllm_metax_tpu.distributed.pd_transport import (
    PrefillServer,
    fetch_prefill,
)
from vllm_metax_tpu.sample.params import SamplingParams

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _config(small_model_config):
    return EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(),
    )


def _generate(engine, prompt, max_tokens=8):
    engine.add_request(
        "g", list(prompt), SamplingParams(max_tokens=max_tokens, temperature=0.0)
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    return toks


def test_pd_over_socket_token_exact(small_model_config):
    """Prefill engine (thread + socket) → decode engine import → decode
    matches the monolithic engine token-for-token, with the prompt's full
    blocks NOT recomputed by the decode engine."""
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 200, size=40)]

    ref = _generate(EngineCore(_config(small_model_config)), prompt)

    prefill_engine = EngineCore(_config(small_model_config))
    server = PrefillServer(prefill_engine)
    server.serve_in_thread()
    try:
        handoff = fetch_prefill(server.address, prompt)
        assert handoff is not None
        assert handoff.num_blocks == len(prompt) // 16

        decode_engine = EngineCore(_config(small_model_config))
        imported = import_prompt_kv(decode_engine, handoff)
        assert imported == handoff.num_blocks

        # the decode engine's scheduler sees the imported prefix: only the
        # tail partial block is recomputed
        sched_tokens = []
        decode_engine.add_request(
            "d", list(prompt), SamplingParams(max_tokens=8, temperature=0.0)
        )
        toks = []
        while decode_engine.has_unfinished_requests():
            so_tokens = 0
            outs = decode_engine.step()
            for out in outs:
                toks.extend(out.new_token_ids)
        assert toks == ref
        assert (
            decode_engine.scheduler.num_prefix_cached_tokens
            >= handoff.num_blocks * 16
        )
    finally:
        server.shutdown()


def test_pd_socket_cross_process(small_model_config, tmp_path):
    """Prefill server in a SEPARATE PROCESS (the real topology)."""
    rng = np.random.default_rng(3)
    prompt = [int(x) for x in rng.integers(1, 200, size=40)]
    ref = _generate(EngineCore(_config(small_model_config)), prompt)

    worker = os.path.join(ROOT, "tests", "workers", "pd_prefill_worker.py")
    port_file = tmp_path / "port.txt"
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, worker, str(port_file)],
        env=env,
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        import time

        deadline = time.time() + 240
        while not port_file.exists() and time.time() < deadline:
            if proc.poll() is not None:
                _, err = proc.communicate()
                raise AssertionError(f"prefill worker died:\n{err[-2000:]}")
            time.sleep(0.3)
        port = int(port_file.read_text())
        handoff = fetch_prefill(("127.0.0.1", port), prompt)
        assert handoff is not None and handoff.num_blocks >= 2

        decode_engine = EngineCore(_config(small_model_config))
        import_prompt_kv(decode_engine, handoff)
        toks = _generate(decode_engine, prompt)
        assert toks == ref
    finally:
        proc.terminate()
        proc.wait(timeout=30)
