"""Prefill/decode disaggregation over a REAL transport (TCP sockets).

The in-process handoff (distributed/kv_transfer.py) exports a prompt's KV
pages by content hash; this module moves that payload between engine
PROCESSES — the toy-proxy topology the reference tests
(tests/v1/kv_connector/nixl_integration/toy_proxy_server.py: a proxy routes
each prompt to a prefill instance, then a decode instance continues from
the transferred KV).

Wire format: length-prefixed JSON header + raw ndarray payload bytes —
deliberately NON-EXECUTABLE (no pickle), so a hostile peer can at worst
feed bad KV pages, never run code. A production deployment would ride
RDMA/ICI.

  prefill host:  PrefillServer(engine, port).serve_forever()
  decode host:   handoff = fetch_prefill(("host", port), prompt_ids)
                 import_prompt_kv(decode_engine, handoff)
                 decode_engine.add_request(prompt_ids, ...)  # prefix hit
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from typing import Optional

import numpy as np

from vllm_metax_tpu.distributed.kv_transfer import (
    KVHandoff,
    export_prompt_kv,
)
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.sample.params import SamplingParams

logger = init_logger(__name__)

# dtypes a KV page may legitimately carry; the decoder refuses anything else
# (in particular object dtypes, which would re-open the code-execution hole)
_WIRE_DTYPES = frozenset(
    {"float32", "bfloat16", "float16", "int8", "uint8", "int32", "float8_e4m3fn"}
)


def _encode(obj) -> bytes:
    """JSON header + concatenated raw ndarray buffers. Understands None,
    JSON scalars/lists/dicts, numpy arrays, and KVHandoff."""
    buffers: list[bytes] = []

    def enc(x):
        if isinstance(x, KVHandoff):
            return {
                "__kvhandoff__": {
                    "block_size": x.block_size,
                    "num_layers": x.num_layers,
                    "hashes": [int(h) for h in x.hashes],
                    "k": enc(x.k),
                    "v": enc(x.v),
                    "k_scale": enc(x.k_scale),
                    "v_scale": enc(x.v_scale),
                    "meta": x.meta,
                }
            }
        if isinstance(x, np.ndarray):
            name = x.dtype.name
            if name not in _WIRE_DTYPES:
                raise TypeError(f"refusing to serialize dtype {name}")
            buffers.append(np.ascontiguousarray(x).tobytes())
            return {"__nd__": len(buffers) - 1, "dtype": name,
                    "shape": list(x.shape)}
        if isinstance(x, dict):
            return {str(k): enc(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [enc(v) for v in x]
        return x  # None / str / int / float / bool

    header = json.dumps(enc(obj)).encode()
    return struct.pack("!I", len(header)) + header + b"".join(buffers)


def _decode(payload: bytes):
    (hlen,) = struct.unpack("!I", payload[:4])
    header = json.loads(payload[4 : 4 + hlen])
    body = memoryview(payload)[4 + hlen :]
    # pre-scan buffer extents in order of __nd__ index
    offsets: dict[int, tuple[int, int]] = {}

    def scan(x):
        if isinstance(x, dict):
            if "__nd__" in x:
                name = x["dtype"]
                if name not in _WIRE_DTYPES:
                    raise ValueError(f"refusing wire dtype {name}")
                import jax.numpy as jnp  # bfloat16/fp8 dtypes live here

                n = int(np.prod(x["shape"], dtype=np.int64)) * jnp.dtype(name).itemsize
                offsets[x["__nd__"]] = (n, 0)
            else:
                for v in x.values():
                    scan(v)
        elif isinstance(x, list):
            for v in x:
                scan(v)

    scan(header)
    pos = 0
    starts: dict[int, int] = {}
    for idx in sorted(offsets):
        starts[idx] = pos
        pos += offsets[idx][0]

    def dec(x):
        if isinstance(x, dict):
            if "__nd__" in x:
                import jax.numpy as jnp

                dt = jnp.dtype(x["dtype"])
                n, s = offsets[x["__nd__"]][0], starts[x["__nd__"]]
                flat = np.frombuffer(body[s : s + n], dtype=np.uint8)
                return flat.view(dt).reshape(x["shape"])
            if "__kvhandoff__" in x:
                f = {k: dec(v) for k, v in x["__kvhandoff__"].items()}
                return KVHandoff(**f)
            return {k: dec(v) for k, v in x.items()}
        if isinstance(x, list):
            return [dec(v) for v in x]
        return x

    return dec(header)


def send_msg(sock: socket.socket, obj) -> None:
    payload = _encode(obj)
    sock.sendall(struct.pack("!Q", len(payload)) + payload)


def recv_msg(sock: socket.socket):
    header = _recv_exact(sock, 8)
    (n,) = struct.unpack("!Q", header)
    return _decode(_recv_exact(sock, n))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        chunk = sock.recv(min(n, 1 << 20))
        if not chunk:
            raise ConnectionError("socket closed mid-message")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


class PrefillServer:
    """Serves {"prompt_token_ids": [...]} → KVHandoff over TCP.

    The prefill engine runs the prompt once (max_tokens=1 greedy fills the
    prefix cache), exports the full-block pages, and ships them. The decode
    side recomputes at most block_size-1 tail tokens — the same split the
    reference's disaggregated prefill makes at block granularity."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    req = recv_msg(self.request)
                    handoff = outer._prefill(req["prompt_token_ids"])
                    send_msg(self.request, handoff)
                except Exception as e:  # noqa: BLE001
                    logger.error("prefill request failed: %s", e)
                    try:
                        send_msg(self.request, {"error": str(e)})
                    except Exception:  # noqa: BLE001
                        pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self.address = self.server.server_address
        self._lock = threading.Lock()

    def _prefill(self, prompt_token_ids: list[int]) -> Optional[KVHandoff]:
        with self._lock:  # one engine, serialized steps
            rid = f"pd-{id(prompt_token_ids)}-{len(prompt_token_ids)}"
            self.engine.add_request(
                rid,
                list(prompt_token_ids),
                SamplingParams(max_tokens=1, temperature=0.0),
            )
            while self.engine.has_unfinished_requests():
                self.engine.step()
            return export_prompt_kv(self.engine, prompt_token_ids)

    def serve_forever(self):
        self.server.serve_forever()

    def serve_in_thread(self) -> threading.Thread:
        t = threading.Thread(target=self.server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.server.shutdown()
        self.server.server_close()


def fetch_prefill(address, prompt_token_ids: list[int]):
    """Decode-side client: returns a KVHandoff (or None if the prompt has
    no full block) fetched from a PrefillServer."""
    with socket.create_connection(address, timeout=300) as sock:
        send_msg(sock, {"prompt_token_ids": list(prompt_token_ids)})
        result = recv_msg(sock)
    if isinstance(result, dict) and "error" in result:
        raise RuntimeError(f"prefill server error: {result['error']}")
    return result
