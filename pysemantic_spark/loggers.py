"""Run logging (reference parity: pysemantic/loggers.py :: setup_logging).

The reference wrote a per-run log file; at cluster scale the equivalent
signal is (a) a structured logger on the driver and (b) the per-partition
metrics rows the checkpoint manifest already records (tableio.BucketEntry).
This module supplies (a) with the reference's call shape."""

from __future__ import annotations

import logging
import os
import time


def setup_logging(project_name: str, log_dir: str | None = None) -> logging.Logger:
    """Configure and return a logger named after the project, mirroring the
    reference's one-file-per-run behavior when ``log_dir`` is given."""
    logger = logging.getLogger(f"pysemantic_spark.{project_name}")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(log_dir, f"{project_name}_{int(time.time())}.log")
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
