"""External-LB data parallelism: independent engine servers behind the
stdlib LB proxy — the reference's multi-node DP topology
(tests/v1/test_external_lb_dp.py; examples/offline_inference/
data_parallel.py multi-node mode)."""

import json
import threading
import urllib.request

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def two_servers(tmp_path_factory):
    from tests.test_api_server import _make_tiny_tokenizer
    from transformers import LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("lbdp")
    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=32000,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    _make_tiny_tokenizer(path)

    from vllm_metax_tpu.entrypoints.api_server import build_server

    servers = []
    for _ in range(2):
        srv = build_server(
            "127.0.0.1", 0, path, dtype="float32", max_model_len=256,
            max_num_seqs=8,
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
    urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in servers]

    from vllm_metax_tpu.entrypoints.lb_proxy import build_proxy

    proxy = build_proxy("127.0.0.1", 0, urls)
    threading.Thread(target=proxy.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{proxy.server_address[1]}", servers
    proxy.shutdown()
    for s in servers:
        try:
            s.shutdown()
            s.server_close()
        except OSError:
            pass
        s.state.engine.shutdown()


def _post(base, path, body):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read())


def test_lb_serves_and_spreads(two_servers):
    base, servers = two_servers
    outs = []
    threads = []
    results = {}

    def worker(i):
        results[i] = _post(
            base,
            "/v1/completions",
            {"prompt": f"req {i}", "max_tokens": 6, "temperature": 0.0},
        )

    for i in range(8):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=240)
    assert len(results) == 8
    for out in results.values():
        assert out["usage"]["completion_tokens"] == 6
    # both engines actually served work
    loads = [s.state.engine.get_stats()["num_generated_tokens"]
             for s in servers]
    assert all(x > 0 for x in loads), loads


def test_lb_health_and_backend_failure(two_servers):
    base, servers = two_servers
    health = json.loads(
        urllib.request.urlopen(base + "/lb/health", timeout=30).read()
    )
    assert len(health) == 2
    # kill one backend: requests keep succeeding via the other
    servers[0].shutdown()
    servers[0].server_close()  # close the listening socket → fast refusal
    out = _post(
        base,
        "/v1/completions",
        {"prompt": "after failure", "max_tokens": 4, "temperature": 0.0},
    )
    assert out["usage"]["completion_tokens"] == 4
    # application-level errors pass through (not retried as node failures)
    try:
        _post(base, "/v1/completions", {"prompt": "x", "max_tokens": -5})
        raise AssertionError("expected HTTP error")
    except urllib.error.HTTPError as e:
        assert e.code == 400
