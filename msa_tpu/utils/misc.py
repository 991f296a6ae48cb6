"""Small host utilities.

``create_directories`` exists here because the reference *imports* it
(``src/main.py:24``) but never defines it anywhere — defect D1 made the
reference CLI unrunnable. The rebuild provides the intended behavior.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

DEFAULT_DIRECTORIES = ("data", "checkpoints", "output", "temp", "logs")


def create_directories(paths: Iterable[str] = DEFAULT_DIRECTORIES) -> None:
    for p in paths:
        Path(p).mkdir(parents=True, exist_ok=True)
