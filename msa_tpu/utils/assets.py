"""Asset path resolution for shipped checkpoints.

The repo ships small trained checkpoints (speaker embedder, landmark net —
procedurally-supervised substitutes for the reference's pretrained
pyannote/MediaPipe dependencies, which are not downloadable in this
environment). Their config defaults are repo-relative paths
(``checkpoints/...``); this resolver makes them load regardless of the
caller's working directory: an existing path wins, then the same path
relative to the repo root, else the original string (callers treat a
missing file as "asset not available" and degrade).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
_warned: set = set()


def resolve_asset(path: str | None) -> str | None:
    if not path or os.path.isabs(path) or os.path.exists(path):
        return path
    candidate = _REPO_ROOT / path
    if candidate.exists():
        return str(candidate)
    # e.g. a pip-installed package without the repo's checkpoints/ tree:
    # callers degrade (random init / clustering diarizer) — make that
    # degradation visible instead of silent (round-2 advisor finding)
    if path not in _warned:
        _warned.add(path)
        logging.getLogger(__name__).warning(
            "shipped asset %s not found (searched cwd and %s); the dependent "
            "component degrades to its no-asset fallback",
            path,
            _REPO_ROOT,
        )
    return path
