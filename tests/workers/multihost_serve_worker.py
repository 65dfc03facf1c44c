"""One host of the 2-host SPMD serving test (tests/test_multihost.py).

rank 0: OpenAI API server over the global mesh; rank 1: follower engine
joined via the request-plane broadcast (entrypoints/api_server.py --num-hosts).
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rank, http_port, coord_port, model = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4],
    )
    from vllm_metax_tpu.entrypoints import api_server

    api_server.main(
        [
            "--model", model,
            "--host", "127.0.0.1",
            "--port", http_port,
            "--dtype", "float32",
            "--max-model-len", "256",
            "--max-num-seqs", "8",
            "--tensor-parallel-size", "8",
            "--num-hosts", "2",
            "--host-rank", str(rank),
            "--coordinator-address", f"127.0.0.1:{coord_port}",
        ]
    )


if __name__ == "__main__":
    main()
