"""Logging setup.

Rebuilds the reference's setup_logging (reference
``src/config/logging_config.py:5-43``): root logger, a timestamped file
``logs/analysis_YYYYmmdd_HHMMSS.log`` plus a console handler, and quieter
levels for noisy third-party packages. One entry point — the reference
additionally scattered module-level basicConfig calls (fusion_model.py:11-14
etc.), which this rebuild does not repeat.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime
from pathlib import Path


def setup_logging(
    log_dir: str = "logs",
    level: int | str | None = None,
    console: bool = True,
) -> str:
    """Configure root logging; returns the log-file path."""
    level = level if level is not None else os.getenv("LOG_LEVEL", "INFO")
    fmt = os.getenv(
        "LOG_FORMAT", "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    log_file = str(
        Path(log_dir) / f"analysis_{datetime.now().strftime('%Y%m%d_%H%M%S')}.log"
    )

    root = logging.getLogger()
    root.setLevel(level)
    root.handlers.clear()
    formatter = logging.Formatter(fmt)
    fh = logging.FileHandler(log_file)
    fh.setFormatter(formatter)
    root.addHandler(fh)
    if console:
        ch = logging.StreamHandler()
        ch.setFormatter(formatter)
        root.addHandler(ch)

    # keep chatty dependencies at WARNING (reference :30-40 did the same for
    # its torch/transformers stack)
    for noisy in ("jax", "jaxlib", "matplotlib", "PIL"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    return log_file
