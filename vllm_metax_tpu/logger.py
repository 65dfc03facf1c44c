"""Engine-wide logging (ref uses vllm.logger throughout, e.g. platform.py:16)."""

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_configured = False


def init_logger(name: str) -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        root = logging.getLogger("vllm_metax_tpu")
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
        root.addHandler(handler)
        root.setLevel(os.getenv("METAX_TPU_LOG_LEVEL", "INFO"))
        root.propagate = False
        _configured = True
    return logger
