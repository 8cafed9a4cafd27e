"""Structured logging (reference vllm/logger.py, env-controlled level)."""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    from .. import envs
    level = envs.VPC_LOGGING_LEVEL.upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root = logging.getLogger("vpc")
    root.setLevel(level)
    root.addHandler(handler)
    root.propagate = False
    _configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    short = name.replace("vllm_paged_compression_tpu", "vpc")
    logger = logging.getLogger(
        short if short.startswith("vpc") else f"vpc.{short}")
    return logger
