"""Asset path resolution for shipped checkpoints.

The package ships small trained checkpoints (speaker embedder, landmark net,
face/audio emotion, text heads, fusion — procedurally-supervised substitutes
for the reference's pretrained pyannote/MediaPipe/DeepFace/wav2vec2
dependencies, which are not downloadable in this environment) under
``msa_tpu/checkpoints/`` so they travel inside the sdist/wheel (round-2
advisor finding: a pip install must not silently degrade to random init).

Config defaults are package-relative paths (``checkpoints/...``); this
resolver makes them load regardless of the caller's working directory: an
existing path wins (so a locally retrained ``./checkpoints/`` overrides the
shipped copy), then the path relative to the repo root, then relative to the
installed ``msa_tpu`` package, else the original string (callers treat a
missing file as "asset not available" and degrade, with one warning).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parents[1]  # .../msa_tpu
_REPO_ROOT = _PKG_ROOT.parent
_warned: set = set()


def resolve_asset(path: str | None, warn: bool = True) -> str | None:
    """``warn=False`` for optional paths whose absence is the normal case
    (e.g. a user-trained checkpoint that only exists after training)."""
    if not path or os.path.isabs(path) or os.path.exists(path):
        return path
    for base in (_REPO_ROOT, _PKG_ROOT):
        candidate = base / path
        if candidate.exists():
            return str(candidate)
    # a pip-installed package whose wheel was built without package data:
    # callers degrade (random init / clustering diarizer) — make that
    # degradation visible instead of silent (round-2 advisor finding)
    if warn and path not in _warned:
        _warned.add(path)
        logging.getLogger(__name__).warning(
            "shipped asset %s not found (searched cwd, %s and %s); the "
            "dependent component degrades to its no-asset fallback",
            path,
            _REPO_ROOT,
            _PKG_ROOT,
        )
    return path
