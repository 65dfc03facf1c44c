"""OpenAI-compatible HTTP server (stdlib-only; no fastapi in the image).

Endpoints (the surface the reference's serving tests drive through
RemoteOpenAIServer, tests/utils.py:253):
  POST /v1/completions        — incl. SSE streaming
  POST /v1/chat/completions   — chat template + SSE streaming
  GET  /v1/models
  GET  /health
  GET  /metrics               — Prometheus text format (vllm:* names,
                                tests/v1/test_metrics_reader.py:19-31)
  POST /tokenize, /detokenize

Run: python -m vllm_metax_tpu.entrypoints.api_server --model <path> [...]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vllm_metax_tpu.entrypoints.async_engine import EnginePool
from vllm_metax_tpu.entrypoints.detokenizer import IncrementalDetokenizer
from vllm_metax_tpu.entrypoints.llm import _build_engine_config
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.sample.params import SamplingParams

logger = init_logger(__name__)


class ServerState:
    def __init__(self, config, tokenizer, served_model: str, dp_size: int = 1,
                 dp_backend: str = "thread"):
        self.engine = EnginePool(config, dp_size, backend=dp_backend)
        self.tokenizer = tokenizer
        self.served_model = served_model
        self.model_config = config.model_config
        self.eos_token_id = tokenizer.eos_token_id if tokenizer else None


class RequestValidationError(ValueError):
    """Maps to an HTTP 400 with an OpenAI-style error body."""


def _validate_request(body: dict) -> None:
    """Schema/range validation before engine admission (the reference's
    FastAPI/pydantic layer does this; here it is explicit checks)."""

    def check(name, types, lo=None, hi=None):
        v = body.get(name)
        if v is None:
            return
        if not isinstance(v, types) or (
            isinstance(v, bool) and bool not in types
        ):
            raise RequestValidationError(
                f"'{name}' must be of type {'/'.join(t.__name__ for t in types)}"
            )
        if lo is not None and v < lo:
            raise RequestValidationError(f"'{name}' must be >= {lo}")
        if hi is not None and v > hi:
            raise RequestValidationError(f"'{name}' must be <= {hi}")

    check("n", (int,), 1, 64)
    check("max_tokens", (int,), 1)
    check("max_completion_tokens", (int,), 1)
    check("temperature", (int, float), 0.0, 2.0)
    check("top_p", (int, float), 0.0, 1.0)
    check("top_k", (int,), -1)
    check("min_p", (int, float), 0.0, 1.0)
    check("presence_penalty", (int, float), -2.0, 2.0)
    check("frequency_penalty", (int, float), -2.0, 2.0)
    check("repetition_penalty", (int, float), 0.0)
    check("seed", (int,))
    check("logprobs", (int, bool))
    check("top_logprobs", (int,), 0, 20)
    if body.get("stream") not in (None, True, False):
        raise RequestValidationError("'stream' must be a boolean")
    if body.get("logit_bias") is not None and not isinstance(
        body["logit_bias"], dict
    ):
        raise RequestValidationError("'logit_bias' must be an object")
    if body.get("stop") is not None and not isinstance(
        body["stop"], (str, list)
    ):
        raise RequestValidationError("'stop' must be a string or array")


def _is_int(x) -> bool:
    # bool is an int subclass: a chat-style `"logprobs": true` must NOT be
    # read as the integer 1 by the completions endpoint
    return isinstance(x, int) and not isinstance(x, bool)


def _sampling_from_request(body: dict) -> SamplingParams:
    _validate_request(body)
    return SamplingParams(
        n=body.get("n") or 1,
        max_tokens=body.get("max_tokens") or body.get("max_completion_tokens") or 16,
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0),
        top_k=body.get("top_k", 0),
        min_p=body.get("min_p", 0.0),
        presence_penalty=body.get("presence_penalty", 0.0),
        frequency_penalty=body.get("frequency_penalty", 0.0),
        repetition_penalty=body.get("repetition_penalty", 1.0),
        stop=body.get("stop"),
        seed=body.get("seed"),
        bad_words=(body.get("bad_words")
                   or (body.get("extra_body") or {}).get("bad_words")
                   or []),
        logit_bias=(
            {int(k): float(v) for k, v in body["logit_bias"].items()}
            if body.get("logit_bias")
            else None
        ),
        logprobs=(
            body.get("logprobs")
            if _is_int(body.get("logprobs"))
            else (body.get("top_logprobs") if body.get("logprobs") else None)
        ),
        # completions `echo` + logprobs returns prompt-token logprobs too
        # (ref: tests/v1/engine/test_output_processor.py:119-133)
        prompt_logprobs=(
            body.get("prompt_logprobs")
            if _is_int(body.get("prompt_logprobs"))
            else (body.get("extra_body") or {}).get("prompt_logprobs")
            if _is_int((body.get("extra_body") or {}).get("prompt_logprobs"))
            else (
                body.get("logprobs")
                if body.get("echo") and _is_int(body.get("logprobs"))
                else None
            )
        ),
        ignore_eos=body.get("ignore_eos", False),
        guided_choice=(body.get("guided_choice")
                       or (body.get("extra_body") or {}).get("guided_choice")),
        guided_regex=(body.get("guided_regex")
                      or (body.get("extra_body") or {}).get("guided_regex")),
        guided_grammar=(body.get("guided_grammar")
                        or (body.get("extra_body") or {}).get(
                            "guided_grammar")),
        guided_json=(body.get("guided_json")
                     or (body.get("extra_body") or {}).get("guided_json")
                     or _response_format_schema(body)),
    )


def _response_format_schema(body: dict):
    """OpenAI `response_format={"type": "json_schema", ...}` → schema dict."""
    rf = body.get("response_format") or {}
    if rf.get("type") == "json_schema":
        return (rf.get("json_schema") or {}).get("schema")
    return None


def _attach_guided(sp, tokenizer):
    """Resolve guided-decoding params to token-level constraints."""
    if sp.bad_words and not sp.bad_words_token_ids:
        from vllm_metax_tpu.sample.params import tokenize_bad_words

        sp.bad_words_token_ids = tokenize_bad_words(sp.bad_words, tokenizer)
    if sp.guided_choice:
        sp._guided_token_choices = [
            tokenizer.encode(c, add_special_tokens=False)
            for c in sp.guided_choice
        ]
    elif sp.guided_regex or sp.guided_json or sp.guided_grammar:
        from vllm_metax_tpu.guided_fsm import (
            get_token_fsm,
            json_schema_to_regex,
        )

        if sp.guided_grammar:
            from vllm_metax_tpu.guided_grammar import grammar_token_fsm

            try:
                # non-recursive → regex FSM; recursive → pushdown token FSM
                sp._guided_fsm = grammar_token_fsm(
                    sp.guided_grammar, tokenizer
                )
            except ValueError as e:  # malformed/left-recursive → 400
                raise RequestValidationError(str(e))
        else:
            pattern = sp.guided_regex or json_schema_to_regex(sp.guided_json)
            sp._guided_fsm = get_token_fsm(pattern, tokenizer)


def _openai_logprobs(
    token_ids: list[int],
    lp_dicts: list[dict[int, float]],
    tokenizer,
    top_n: int,
    chat: bool,
):
    """Per-token logprob dicts → OpenAI response `logprobs` objects.

    Completions format: {tokens, token_logprobs, top_logprobs}; chat format:
    {content: [{token, logprob, top_logprobs: [...]}]} (the reference serves
    both through vLLM's OpenAI layer)."""
    def tok_str(t):
        return tokenizer.decode([t]) if tokenizer is not None else str(t)

    if chat:
        content = []
        for tid, d in zip(token_ids, lp_dicts):
            if d is None:
                content.append(
                    {"token": tok_str(tid), "logprob": None,
                     "top_logprobs": []}
                )
                continue
            top = sorted(d.items(), key=lambda kv: -kv[1])[: max(top_n, 0)]
            content.append(
                {
                    "token": tok_str(tid),
                    "logprob": d.get(tid, 0.0),
                    "top_logprobs": [
                        {"token": tok_str(t), "logprob": lp} for t, lp in top
                    ],
                }
            )
        return {"content": content}
    tokens, token_logprobs, top_logprobs = [], [], []
    for tid, d in zip(token_ids, lp_dicts):
        tokens.append(tok_str(tid))
        if d is None:
            token_logprobs.append(None)
            top_logprobs.append(None)
            continue
        token_logprobs.append(d.get(tid, 0.0))
        top = sorted(d.items(), key=lambda kv: -kv[1])[: max(top_n, 0)]
        # distinct token ids may decode to the same string (e.g. specials);
        # keep the best-scoring one rather than letting later entries clobber
        td: dict[str, float] = {}
        for t, lp in top:
            td.setdefault(tok_str(t), lp)
        top_logprobs.append(td)
    return {
        "tokens": tokens,
        "token_logprobs": token_logprobs,
        "top_logprobs": top_logprobs,
    }


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through our logger
            logger.debug("%s " + fmt, self.client_address[0], *args)

        # ------------------------------------------------------- helpers

        def _json(self, obj, code: int = 200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _error(self, msg: str, code: int = 400):
            self._json(
                {"error": {"message": msg, "type": "invalid_request_error"}}, code
            )

        def _read_body(self) -> dict:
            length = int(self.headers.get("Content-Length", 0))
            if not length:
                return {}
            return json.loads(self.rfile.read(length))

        def _start_sse(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

        def _sse(self, obj):
            payload = b"data: " + json.dumps(obj).encode() + b"\n\n"
            self.wfile.write(f"{len(payload):x}\r\n".encode())
            self.wfile.write(payload + b"\r\n")

        def _sse_done(self):
            payload = b"data: [DONE]\n\n"
            self.wfile.write(f"{len(payload):x}\r\n".encode())
            self.wfile.write(payload + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")

        # ------------------------------------------------------- routes

        def do_GET(self):
            if self.path == "/health":
                self._json({"status": "ok"})
            elif self.path == "/v1/models":
                self._json(
                    {
                        "object": "list",
                        "data": [
                            {
                                "id": state.served_model,
                                "object": "model",
                                "created": int(time.time()),
                                "owned_by": "vllm-metax-tpu",
                            }
                        ],
                    }
                )
            elif self.path == "/metrics":
                self._metrics()
            else:
                self._error("not found", 404)

        def _metrics(self):
            s = state.engine.get_stats()
            lines = []
            for name, key in [
                ("vllm:num_requests_waiting", "num_waiting"),
                ("vllm:generation_tokens_total", "num_generated_tokens"),
                ("vllm:prompt_tokens_total", "num_scheduled_tokens"),
                ("vllm:gpu_cache_usage_perc", "kv_cache_usage"),
                ("vllm:num_preemptions_total", "num_preemptions"),
                ("vllm:prefix_cache_hits_total", "prefix_cached_tokens"),
            ]:
                lines.append(f"# TYPE {name} gauge")
                lines.append(
                    f'{name}{{model_name="{state.served_model}",engine="0"}} '
                    f"{s.get(key, 0)}"
                )
            if hasattr(state.engine, "prometheus_lines"):
                lines.extend(
                    state.engine.prometheus_lines(state.served_model)
                )
            elif hasattr(state.engine, "engines"):
                # EnginePool: per-engine-index labels
                for i, e in enumerate(state.engine.engines):
                    if hasattr(e, "prometheus_lines"):
                        lines.extend(
                            e.prometheus_lines(state.served_model, str(i))
                        )
            data = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            try:
                body = self._read_body()
            except json.JSONDecodeError:
                return self._error("invalid JSON body")
            try:
                if self.path == "/v1/completions":
                    self._completions(body)
                elif self.path == "/v1/chat/completions":
                    self._chat(body)
                elif self.path == "/v1/embeddings":
                    self._embeddings(body)
                elif self.path == "/tokenize":
                    self._json(
                        {"tokens": state.tokenizer.encode(body.get("prompt", ""))}
                    )
                elif self.path == "/detokenize":
                    self._json(
                        {"prompt": state.tokenizer.decode(body.get("tokens", []))}
                    )
                else:
                    self._error("not found", 404)
            except BrokenPipeError:
                pass
            except RequestValidationError as e:
                self._error(str(e), 400)
            except Exception as e:  # surface engine errors as 500s
                logger.exception("request failed")
                try:
                    self._error(str(e), 500)
                except Exception:
                    pass

        # ------------------------------------------------------- embeddings

        def _embeddings(self, body):
            """OpenAI embeddings API over pooled hidden states (the
            reference's pooling-model surface)."""
            raw = body.get("input")
            if raw is None:
                raise RequestValidationError("'input' is required")
            if isinstance(raw, str):
                raw = [raw]
            token_lists = []
            for item in raw:
                if isinstance(item, str):
                    token_lists.append(state.tokenizer.encode(item))
                elif isinstance(item, list):
                    token_lists.append([int(x) for x in item])
                else:
                    raise RequestValidationError(
                        "'input' must be a string, list of strings, or "
                        "list of token-id lists"
                    )
            if not token_lists or any(not t for t in token_lists):
                raise RequestValidationError("'input' must not be empty")
            eng = state.engine.pick()
            if not hasattr(eng, "embed"):
                return self._error(
                    "embeddings are not available on the process DP "
                    "backend", 501,
                )
            vecs = eng.embed(token_lists)
            self._json(
                {
                    "object": "list",
                    "model": body.get("model", state.served_model),
                    "data": [
                        {
                            "object": "embedding",
                            "index": i,
                            "embedding": [float(x) for x in v],
                        }
                        for i, v in enumerate(vecs)
                    ],
                    "usage": {
                        "prompt_tokens": sum(len(t) for t in token_lists),
                        "total_tokens": sum(len(t) for t in token_lists),
                    },
                }
            )

        # ------------------------------------------------------- completions

        def _completions(self, body: dict):
            prompt = body.get("prompt", "")
            if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                token_ids = prompt
                prompt_text = None
            else:
                if isinstance(prompt, list):
                    prompt = prompt[0]
                token_ids = state.tokenizer.encode(prompt)
                prompt_text = prompt
            sp = _sampling_from_request(body)
            _attach_guided(sp, state.tokenizer)
            rid = f"cmpl-{uuid.uuid4().hex[:16]}"
            self._generate(body, token_ids, sp, rid, chat=False)

        def _chat(self, body: dict):
            messages = body.get("messages", [])
            mmd = None
            if any(isinstance(m.get("content"), list) for m in messages):
                # OpenAI image content parts (Qwen-VL serving): splice the
                # vision placeholder string at each image position, decode
                # data: URIs, run the checkpoint's HF image processor
                from vllm_metax_tpu.multimodal import (
                    extract_chat_images,
                    normalize_mm_data,
                )

                try:
                    messages, images = extract_chat_images(
                        messages, state.tokenizer, state.model_config
                    )
                    if images:
                        mmd = normalize_mm_data(
                            {"image": images}, state.model_config
                        )
                except ValueError as e:
                    raise RequestValidationError(str(e))
            token_ids = state.tokenizer.apply_chat_template(
                messages, add_generation_prompt=True
            )
            if mmd is not None:
                from vllm_metax_tpu.multimodal import expand_placeholders

                try:
                    token_ids = expand_placeholders(
                        token_ids, mmd, state.model_config
                    )
                except ValueError as e:
                    raise RequestValidationError(str(e))
            sp = _sampling_from_request(body)
            _attach_guided(sp, state.tokenizer)
            rid = f"chatcmpl-{uuid.uuid4().hex[:16]}"
            self._generate(body, token_ids, sp, rid, chat=True, mmd=mmd)

        def _generate(self, body, token_ids, sp, rid, chat: bool, mmd=None):
            created = int(time.time())
            obj = "chat.completion" if chat else "text_completion"
            eos = None if sp.ignore_eos else state.eos_token_id
            # OpenAI n: fan out into n engine requests running concurrently
            nc = max(1, sp.n)
            streams = [
                state.engine.stream(
                    token_ids, sp if nc == 1 else sp.child(k), eos,
                    multi_modal_data=mmd,
                )
                for k in range(nc)
            ]
            detoks = [
                IncrementalDetokenizer(state.tokenizer, stop=sp.stop)
                for _ in range(nc)
            ]

            if body.get("stream"):
                self._start_sse()
                import queue as _queue

                merged: "_queue.Queue" = _queue.Queue()

                def pump(k, s):
                    try:
                        for item in s:
                            merged.put((k, item))
                    finally:
                        merged.put((k, None))  # reader gone or stream done

                for k, s in enumerate(streams):
                    threading.Thread(
                        target=pump, args=(k, s), daemon=True
                    ).start()
                first = [True] * nc
                live = nc
                try:
                    while live:
                        k, item = merged.get(timeout=600.0)
                        if item is None:
                            live -= 1
                            continue
                        text = detoks[k].push(item.new_token_ids)
                        if item.finished:
                            text += detoks[k].finish()
                        if not text and not item.finished:
                            continue
                        lp_obj = None
                        if sp.logprobs is not None and item.logprobs:
                            lp_obj = _openai_logprobs(
                                item.new_token_ids, item.logprobs,
                                state.tokenizer, sp.logprobs, chat,
                            )
                        if chat:
                            delta = {"content": text}
                            if first[k]:
                                delta["role"] = "assistant"
                                first[k] = False
                            choice = {
                                "index": k,
                                "delta": delta,
                                "logprobs": lp_obj,
                                "finish_reason": item.finish_reason
                                if item.finished
                                else None,
                            }
                        else:
                            choice = {
                                "index": k,
                                "text": text,
                                "logprobs": lp_obj,
                                "finish_reason": item.finish_reason
                                if item.finished
                                else None,
                            }
                        self._sse(
                            {
                                "id": rid,
                                "object": obj + (".chunk" if chat else ""),
                                "created": created,
                                "model": state.served_model,
                                "choices": [choice],
                            }
                        )
                finally:
                    for s in streams:
                        s.close()  # aborts engine requests on disconnect
                self._sse_done()
                return

            # non-streaming: children run concurrently in the engine loop;
            # draining them in order just buffers in their queues
            choices = []
            total_completion = 0
            for k, s in enumerate(streams):
                tokens: list[int] = []
                lp_dicts: list[dict[int, float]] = []
                plp_dicts = None
                finish_reason = None
                for item in s:
                    tokens.extend(item.new_token_ids)
                    if item.logprobs:
                        lp_dicts.extend(item.logprobs)
                    if getattr(item, "prompt_logprobs", None) is not None:
                        plp_dicts = item.prompt_logprobs
                    detoks[k].push(item.new_token_ids)
                    if item.finished:
                        finish_reason = item.finish_reason
                detoks[k].finish()
                text = detoks[k].emitted
                total_completion += len(tokens)
                echo = bool(body.get("echo")) and not chat
                lp_tokens, lp_all = tokens, lp_dicts
                if echo:
                    if state.tokenizer is not None:
                        text = state.tokenizer.decode(token_ids) + text
                    if plp_dicts is not None:
                        lp_tokens = list(token_ids) + tokens
                        lp_all = list(plp_dicts) + (
                            lp_dicts or [None] * len(tokens)
                        )
                lp_obj = None
                if (sp.logprobs is not None or plp_dicts is not None) and lp_all:
                    lp_obj = _openai_logprobs(
                        lp_tokens, lp_all, state.tokenizer,
                        sp.logprobs or 0, chat,
                    )
                if chat:
                    choices.append(
                        {
                            "index": k,
                            "message": {"role": "assistant", "content": text},
                            "logprobs": lp_obj,
                            "finish_reason": finish_reason,
                        }
                    )
                else:
                    choices.append(
                        {
                            "index": k,
                            "text": text,
                            "logprobs": lp_obj,
                            "finish_reason": finish_reason,
                        }
                    )
            usage = {
                "prompt_tokens": len(token_ids),
                "completion_tokens": total_completion,
                "total_tokens": len(token_ids) + total_completion,
            }
            self._json(
                {
                    "id": rid,
                    "object": obj,
                    "created": created,
                    "model": state.served_model,
                    "choices": choices,
                    "usage": usage,
                }
            )

    return Handler


def build_server(
    host: str, port: int, model: str, served_model_name: str = "",
    data_parallel_size: int = 1, data_parallel_backend: str = "thread",
    **engine_kwargs
) -> ThreadingHTTPServer:
    config = _build_engine_config(model, **engine_kwargs)
    from transformers import AutoTokenizer

    try:
        tokenizer = AutoTokenizer.from_pretrained(model)
    except Exception as e:  # noqa: BLE001 — tokenizer-less checkpoints
        # (dummy/test dirs) still serve token-id requests; ServerState and
        # the handlers already tolerate tokenizer=None (same degradation
        # as entrypoints/llm.py)
        logger.warning("no tokenizer loaded from %s (%s)", model, e)
        tokenizer = None
    state = ServerState(
        config, tokenizer, served_model_name or model, data_parallel_size,
        dp_backend=data_parallel_backend,
    )
    server = ThreadingHTTPServer((host, port), make_handler(state))
    server.state = state
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(description="vllm-metax-tpu OpenAI API server")
    parser.add_argument("--model", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--served-model-name", default="")
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--max-num-seqs", type=int, default=64)
    parser.add_argument("--max-num-batched-tokens", type=int, default=1024)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--kv-cache-dtype", default="auto")
    parser.add_argument("--quantization", default=None)
    parser.add_argument("--tensor-parallel-size", type=int, default=1)
    parser.add_argument("--data-parallel-size", type=int, default=1)
    parser.add_argument(
        "--data-parallel-backend", choices=("thread", "process"),
        default="thread",
        help="'process' isolates each DP engine replica in its own process "
             "(per-replica device visibility; no shared scheduler GIL)",
    )
    parser.add_argument("--num-decode-steps", type=int, default=1)
    parser.add_argument("--dtype", default="auto")
    parser.add_argument("--load-format", default="auto")
    # multi-host SPMD serving (parallel/multihost.py): host 0 serves HTTP
    # and broadcasts the request stream; ranks > 0 run follower engines
    parser.add_argument("--num-hosts", type=int, default=1)
    parser.add_argument("--host-rank", type=int, default=0)
    parser.add_argument("--coordinator-address", default="127.0.0.1:29500")
    args = parser.parse_args(argv)

    if args.num_hosts > 1:
        from vllm_metax_tpu.parallel import multihost

        multihost.initialize(
            args.coordinator_address, args.num_hosts, args.host_rank
        )
        if args.host_rank > 0:
            # follower: same engine over the same global mesh; the engine
            # loop's broadcast rendezvous drives it — no HTTP surface
            import time as _time

            from vllm_metax_tpu.entrypoints.async_engine import EnginePool

            config = _build_engine_config(
                args.model,
                max_model_len=args.max_model_len,
                max_num_seqs=args.max_num_seqs,
                max_num_batched_tokens=args.max_num_batched_tokens,
                block_size=args.block_size,
                kv_cache_dtype=args.kv_cache_dtype,
                quantization=args.quantization,
                num_decode_steps=args.num_decode_steps,
                tensor_parallel_size=args.tensor_parallel_size,
                dtype=args.dtype,
                load_format=args.load_format,
                num_hosts=args.num_hosts,
                host_rank=args.host_rank,
                coordinator_address=args.coordinator_address,
            )
            pool = EnginePool(config, args.data_parallel_size)
            logger.info(
                "follower host %d/%d joined the mesh; engine loop running",
                args.host_rank, args.num_hosts,
            )
            try:
                while True:
                    _time.sleep(3600)
            except KeyboardInterrupt:
                pool.shutdown()
            return

    server = build_server(
        args.host,
        args.port,
        args.model,
        served_model_name=args.served_model_name,
        data_parallel_size=args.data_parallel_size,
        data_parallel_backend=args.data_parallel_backend,
        max_model_len=args.max_model_len,
        max_num_seqs=args.max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        block_size=args.block_size,
        kv_cache_dtype=args.kv_cache_dtype,
        quantization=args.quantization,
        num_decode_steps=args.num_decode_steps,
        tensor_parallel_size=args.tensor_parallel_size,
        dtype=args.dtype,
        load_format=args.load_format,
        num_hosts=args.num_hosts,
        host_rank=args.host_rank,
        coordinator_address=args.coordinator_address,
    )
    logger.info("serving %s on %s:%d", args.model, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.state.engine.shutdown()


if __name__ == "__main__":
    main()
