"""OpenAI API server e2e: completions, chat, streaming, metrics, concurrency.

Pattern of the reference's RemoteOpenAIServer-driven suites (tests/utils.py:253,
tests/benchmarks/test_serve_cli.py) — here the server runs in-process on a
tiny real checkpoint.
"""

import json
import threading
import urllib.request

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from transformers import AutoTokenizer, LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("srv")
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

    srv = build_server(
        "127.0.0.1", 0, path, dtype="float32", max_model_len=256, max_num_seqs=8
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.state.engine.shutdown()


def _make_tiny_tokenizer(path):
    """Build a small byte-level BPE tokenizer locally (no network)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1024,
        special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = ["hello world this is a test request " * 5, "abc def ghi " * 10]
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>"
    )
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n{% endfor %}"
        "assistant:"
    )
    fast.save_pretrained(path)


def _post(url, path, body):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.read().decode()


def test_health_and_models(server):
    assert json.loads(_get(server, "/health"))["status"] == "ok"
    models = json.loads(_get(server, "/v1/models"))
    assert models["data"][0]["object"] == "model"


def test_completions(server):
    out = _post(
        server,
        "/v1/completions",
        {"prompt": "hello world", "max_tokens": 8, "temperature": 0.0},
    )
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] == 8
    assert isinstance(out["choices"][0]["text"], str)
    assert out["choices"][0]["finish_reason"] in ("length", "stop")


def test_completions_token_ids_prompt(server):
    out = _post(
        server,
        "/v1/completions",
        {"prompt": [1, 20, 30], "max_tokens": 4, "temperature": 0.0},
    )
    assert out["usage"]["prompt_tokens"] == 3


def test_completions_logprobs(server):
    out = _post(
        server,
        "/v1/completions",
        {"prompt": "hello", "max_tokens": 4, "temperature": 0.0, "logprobs": 2},
    )
    lp = out["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["tokens"]) == 4
    assert len(lp["token_logprobs"]) == 4
    assert all(isinstance(v, float) and v <= 0.0 for v in lp["token_logprobs"])
    assert all(len(d) <= 2 for d in lp["top_logprobs"])
    # greedy: the chosen token should be the argmax → also the best top-logprob
    for chosen_lp, top in zip(lp["token_logprobs"], lp["top_logprobs"]):
        assert chosen_lp == max(top.values())


def test_chat_completions_logprobs(server):
    out = _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3,
            "temperature": 0.0,
            "logprobs": True,
            "top_logprobs": 2,
        },
    )
    lp = out["choices"][0]["logprobs"]
    assert lp is not None and len(lp["content"]) == 3
    ent = lp["content"][0]
    assert set(ent) == {"token", "logprob", "top_logprobs"}
    assert len(ent["top_logprobs"]) <= 2


def test_chat_completions(server):
    out = _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6,
            "temperature": 0.0,
        },
    )
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_completions(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps(
            {"prompt": "abc", "max_tokens": 6, "temperature": 0.0, "stream": True}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                chunks.append(line[len("data: "):])
    assert chunks[-1] == "[DONE]"
    parsed = [json.loads(c) for c in chunks[:-1]]
    assert parsed, "no stream chunks"
    assert parsed[-1]["choices"][0]["finish_reason"] in ("length", "stop")
    # streamed text equals the non-streamed result for the same greedy request
    streamed = "".join(p["choices"][0]["text"] for p in parsed)
    full = _post(
        server,
        "/v1/completions",
        {"prompt": "abc", "max_tokens": 6, "temperature": 0.0},
    )["choices"][0]["text"]
    assert streamed == full


def test_concurrent_requests_batch(server):
    results = {}

    def worker(i):
        results[i] = _post(
            server,
            "/v1/completions",
            {"prompt": f"request {i}", "max_tokens": 8, "temperature": 0.0},
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 6
    for out in results.values():
        assert out["usage"]["completion_tokens"] == 8


def test_metrics_endpoint(server):
    text = _get(server, "/metrics")
    assert "vllm:generation_tokens_total" in text
    assert 'model_name="' in text


def test_metrics_latency_histograms(server):
    """TTFT/TPOT/queue/e2e histograms appear with bucket/sum/count series
    after at least one finished request (the reference's per-request
    metrics surface, tests/v1/test_metrics_reader.py:19-31)."""
    _post(
        server,
        "/v1/completions",
        {"prompt": "histogram probe", "max_tokens": 4, "temperature": 0.0},
    )
    text = _get(server, "/metrics")
    for name in (
        "vllm:time_to_first_token_seconds",
        "vllm:time_per_output_token_seconds",
        "vllm:request_queue_time_seconds",
        "vllm:e2e_request_latency_seconds",
    ):
        assert f"# TYPE {name} histogram" in text
        assert f"{name}_bucket" in text
        assert f"{name}_sum" in text
        assert f"{name}_count" in text
    # at least one observation landed
    assert any(
        line.split()[-1] not in ("0", "0.0")
        for line in text.splitlines()
        if line.startswith("vllm:time_to_first_token_seconds_count")
    )
    assert "vllm:request_success_total" in text


def test_prompt_logprobs_echo_completions(server):
    """completions echo+logprobs returns prompt-token logprobs with a
    leading null (ref: tests/v1/engine/test_output_processor.py:119-133)."""
    out = _post(
        server,
        "/v1/completions",
        {
            "prompt": "one two three four",
            "max_tokens": 2,
            "temperature": 0.0,
            "echo": True,
            "logprobs": 2,
        },
    )
    lp = out["choices"][0]["logprobs"]
    assert lp is not None
    n_prompt = out["usage"]["prompt_tokens"]
    assert len(lp["tokens"]) == n_prompt + 2
    assert lp["token_logprobs"][0] is None
    assert all(
        v is None or v <= 1e-5 for v in lp["token_logprobs"]
    )
    # echoed text starts with the prompt
    assert out["choices"][0]["text"].startswith("one two three four"[:3])


def test_tokenize_roundtrip(server):
    toks = _post(server, "/tokenize", {"prompt": "hello"})["tokens"]
    text = _post(server, "/detokenize", {"tokens": toks})["prompt"]
    assert "hello" in text


def test_client_disconnect_aborts(server):
    """Closing a streaming connection mid-generation aborts the request
    (ref: tests/v1/shutdown/test_delete.py behavior)."""
    import http.client, time, urllib.parse

    u = urllib.parse.urlparse(server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=60)
    conn.request(
        "POST",
        "/v1/completions",
        body=json.dumps({"prompt": "hello", "max_tokens": 500,
                         "temperature": 0.0, "stream": True,
                         "ignore_eos": True}),
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    resp.read(64)  # receive a bit, then drop the connection
    conn.close()
    deadline = time.time() + 30
    while time.time() < deadline:
        stats = json.loads(_get(server, "/metrics").split("\n")[1].split()[-1])
        # vllm:num_requests_waiting gauge reaches 0 once aborted
        if stats == 0:
            break
        time.sleep(0.5)
    assert stats == 0


def test_dp_pool(tmp_path_factory):
    """Data-parallel engine pool: least-loaded dispatch across replicas
    (ref: tests/v1/test_internal_lb_dp.py surface)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("dp")
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(str(tmp / "m"), safe_serialization=True)

    from vllm_metax_tpu.entrypoints.async_engine import EnginePool
    from vllm_metax_tpu.entrypoints.llm import _build_engine_config
    from vllm_metax_tpu.sample.params import SamplingParams

    config = _build_engine_config(str(tmp / "m"), dtype="float32",
                                  max_model_len=128)
    pool = EnginePool(config, dp_size=2)
    try:
        assert len(pool.engines) == 2
        outs = []
        for i in range(4):
            toks = []
            for item in pool.stream([1, 2, 3 + i],
                                    SamplingParams(max_tokens=4,
                                                   temperature=0.0)):
                toks.extend(item.new_token_ids)
            outs.append(toks)
        assert all(len(o) == 4 for o in outs)
        stats = pool.get_stats()
        assert stats["num_engines"] == 2
        # both replicas produce identical greedy output for the same prompt
        t_a = []
        for item in pool.engines[0].stream([9, 9], SamplingParams(max_tokens=4, temperature=0.0)):
            t_a.extend(item.new_token_ids)
        t_b = []
        for item in pool.engines[1].stream([9, 9], SamplingParams(max_tokens=4, temperature=0.0)):
            t_b.extend(item.new_token_ids)
        assert t_a == t_b
    finally:
        pool.shutdown()


def test_guided_regex_completion(server):
    import re

    pattern = r"[0-9]{2}\.[0-9]{2}"
    out = _post(
        server,
        "/v1/completions",
        {
            "prompt": "pi is about ",
            "max_tokens": 16,
            "temperature": 1.0,
            "seed": 0,
            "guided_regex": pattern,
        },
    )
    assert re.fullmatch(pattern, out["choices"][0]["text"]), out


def test_guided_json_response_format(server):
    import json as _json

    schema = {
        "type": "object",
        "properties": {"n": {"type": "integer"}, "ok": {"type": "boolean"}},
    }
    out = _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "give me json"}],
            "max_tokens": 48,
            "temperature": 1.0,
            "seed": 1,
            "response_format": {
                "type": "json_schema",
                "json_schema": {"name": "x", "schema": schema},
            },
        },
    )
    text = out["choices"][0]["message"]["content"]
    obj = _json.loads(text)
    assert isinstance(obj["n"], int) and isinstance(obj["ok"], bool), text


def test_completions_n_choices(server):
    out = _post(
        server,
        "/v1/completions",
        {"prompt": "hello", "max_tokens": 6, "temperature": 1.0, "seed": 3,
         "n": 3},
    )
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    assert out["usage"]["completion_tokens"] == 18
    assert all(c["finish_reason"] in ("length", "stop") for c in out["choices"])


def test_streaming_n_interleaved(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps(
            {"prompt": "hi", "max_tokens": 5, "temperature": 1.0, "seed": 9,
             "n": 2, "stream": True}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    seen = {0: "", 1: ""}
    finishes = set()
    with urllib.request.urlopen(req, timeout=120) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data:") or line == "data: [DONE]":
                continue
            chunk = json.loads(line[5:])
            c = chunk["choices"][0]
            seen[c["index"]] += c.get("text", "")
            if c["finish_reason"]:
                finishes.add(c["index"])
    assert finishes == {0, 1}


def test_request_validation_400(server):
    """Out-of-range / wrong-typed params → 400 with an error body (the
    reference's pydantic layer behavior)."""
    import json as _json
    import urllib.error
    import urllib.request

    base = server
    for bad in (
        {"prompt": "hi", "temperature": -1.0},
        {"prompt": "hi", "top_p": 1.5},
        {"prompt": "hi", "max_tokens": 0},
        {"prompt": "hi", "n": "two"},
        {"prompt": "hi", "logit_bias": [1, 2]},
        {"prompt": "hi", "presence_penalty": 9.0},
    ):
        req = urllib.request.Request(
            f"{base}/v1/completions",
            data=_json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError(f"expected 400 for {bad}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (bad, e.code)
            payload = _json.loads(e.read())
            assert "error" in payload or "message" in payload


def test_engine_pool_process_backend(small_model_config, monkeypatch):
    """DP replicas as PROCESSES (the reference's per-rank engine isolation):
    requests fan out across process replicas and stream back correctly."""
    import os

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.entrypoints.async_engine import EnginePool
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=128
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    pool = EnginePool(config, dp_size=2, backend="process")
    try:
        import threading

        results = {}

        def consume(tag, prompt):
            toks = []
            for item in pool.stream(
                prompt, SamplingParams(max_tokens=6, temperature=0.0),
                timeout=180.0,
            ):
                toks.extend(item.new_token_ids)
            results[tag] = toks

        threads = [
            threading.Thread(target=consume, args=(i, [1 + i, 5, 9]))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert len(results) == 4
        assert all(len(v) == 6 for v in results.values())
        # determinism: same prompt through (possibly) different replicas
        r0 = {}
        for tag in ("x", "y"):
            toks = []
            for item in pool.stream(
                [9, 8, 7], SamplingParams(max_tokens=5, temperature=0.0),
                timeout=180.0,
            ):
                toks.extend(item.new_token_ids)
            r0[tag] = toks
        assert r0["x"] == r0["y"]
    finally:
        pool.shutdown()


def test_embeddings_endpoint(server):
    """OpenAI /v1/embeddings over pooled hidden states."""
    url = server
    resp = _post(url, "/v1/embeddings", {
        "model": "tiny", "input": ["hello world", [1, 5, 9]],
    })
    assert resp["object"] == "list"
    assert len(resp["data"]) == 2
    assert resp["data"][0]["index"] == 0
    v0 = resp["data"][0]["embedding"]
    v1 = resp["data"][1]["embedding"]
    assert len(v0) == len(v1) > 0
    assert v0 != v1
    assert resp["usage"]["prompt_tokens"] > 0


def test_embeddings_requires_input(server):
    import urllib.error

    url = server
    try:
        _post(url, "/v1/embeddings", {"model": "tiny"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
