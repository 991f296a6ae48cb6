"""Canonical emotion taxonomy and label-order adapters.

The reference suffers from label-order chaos (SURVEY.md defect D6): the
dataclass order (reference ``src/structures/emotions.py:11-17``), the DeepFace
model order (``src/analyzers/face_analyzer.py:164-172``), and the Portuguese
UI order (``src/visualizers/streaming_visualizer.py:23-31``,
``src/inference.py:55-58``) all disagree, and argmax indices are therefore
inconsistently labeled across surfaces.

This module defines ONE canonical order and explicit adapters at every model
boundary. All permutations are precomputed index tuples so they can be applied
inside jitted graphs with a static ``take``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# Canonical 7-emotion order — matches the reference's EmotionVector field
# order (reference src/structures/emotions.py:11-17).
CANONICAL: Tuple[str, ...] = (
    "neutral",
    "happy",
    "sad",
    "angry",
    "fearful",
    "disgusted",
    "surprised",
)

# Order emitted by the face emotion CNN — matches the DeepFace dict unpack
# order in the reference (src/analyzers/face_analyzer.py:164-172).
DEEPFACE: Tuple[str, ...] = (
    "angry",
    "disgust",
    "fear",
    "happy",
    "sad",
    "surprise",
    "neutral",
)

# Portuguese labels in the order used by the reference example/visualizer/
# evaluator (examples/streaming_example.py:23, streaming_visualizer.py:23-31,
# inference.py:55-58). Index i of a fused vector is labeled PT_UI[i] there.
PT_UI: Tuple[str, ...] = (
    "feliz",
    "triste",
    "raiva",
    "medo",
    "surpresa",
    "nojo",
    "neutro",
)

# English names keyed by the streaming color map
# (reference streaming_processor.py:93-102).
EN_COLOR_KEYS: Tuple[str, ...] = (
    "happy",
    "sad",
    "angry",
    "fear",
    "surprise",
    "disgust",
    "neutral",
)

# IEMOCAP 4-class audio emotion convention. The SpeechBrain model emits 4
# classes which the reference duplicates to 8 (audio_analyzer.py:162-168,
# defect D7 — we keep the 8-dim contract).
IEMOCAP4: Tuple[str, ...] = ("neutral", "angry", "happy", "sad")

# Synonym table so adapters can map between naming dialects.
_SYNONYMS = {
    "fear": "fearful",
    "fearful": "fearful",
    "medo": "fearful",
    "disgust": "disgusted",
    "disgusted": "disgusted",
    "nojo": "disgusted",
    "surprise": "surprised",
    "surprised": "surprised",
    "surpresa": "surprised",
    "happy": "happy",
    "feliz": "happy",
    "sad": "sad",
    "triste": "sad",
    "angry": "angry",
    "raiva": "angry",
    "neutral": "neutral",
    "neutro": "neutral",
}


def _norm(label: str) -> str:
    try:
        return _SYNONYMS[label.lower()]
    except KeyError as e:
        raise ValueError(f"unknown emotion label: {label!r}") from e


def permutation(src: Sequence[str], dst: Sequence[str]) -> Tuple[int, ...]:
    """Index tuple ``p`` such that ``probs_dst = probs_src[p]``."""
    src_n = [_norm(s) for s in src]
    dst_n = [_norm(d) for d in dst]
    if sorted(src_n) != sorted(dst_n):
        raise ValueError(f"orders are not permutations: {src} vs {dst}")
    return tuple(src_n.index(d) for d in dst_n)


# Precomputed adapters (static, safe inside jit).
DEEPFACE_TO_CANONICAL = permutation(DEEPFACE, CANONICAL)
CANONICAL_TO_DEEPFACE = permutation(CANONICAL, DEEPFACE)
PT_UI_TO_CANONICAL = permutation(PT_UI, CANONICAL)
CANONICAL_TO_PT_UI = permutation(CANONICAL, PT_UI)


def reorder(probs, perm: Tuple[int, ...]):
    """Apply a precomputed permutation along the last axis (jit-safe)."""
    return jnp.take(jnp.asarray(probs), jnp.asarray(perm), axis=-1)


def reorder_np(probs, perm: Tuple[int, ...]) -> np.ndarray:
    return np.take(np.asarray(probs), perm, axis=-1)


def duplicate_4_to_8(probs4):
    """Expand 4-class IEMOCAP probs to the 8-dim audio contract.

    Mirrors the reference behavior of concatenating the 4 probs with
    themselves and renormalizing to sum 1
    (reference audio_analyzer.py:162-168, defect D7 kept on purpose:
    AudioAnalysis.emotion_probs is documented as 8-dim and the fusion
    audio_dim depends on it).
    """
    probs8 = jnp.concatenate([probs4, probs4], axis=-1)
    return probs8 / jnp.sum(probs8, axis=-1, keepdims=True)


def label_of(index: int, order: Sequence[str] = CANONICAL) -> str:
    return order[int(index)]


# Scatter of the 4 IEMOCAP classes into the canonical 7 slots; the three
# emotions the audio model cannot express (fearful/disgusted/surprised) get
# probability 0. Static, safe inside jit.
_IEMOCAP4_SLOTS: Tuple[int, ...] = tuple(
    CANONICAL.index(_norm(lbl)) for lbl in IEMOCAP4
)


def iemocap4_to_canonical7(probs4):
    """[..., 4] IEMOCAP probabilities → [..., 7] canonical-order probability
    vector (zeros in the inexpressible slots). Keeps sum = 1."""
    probs4 = jnp.asarray(probs4)
    out = jnp.zeros(probs4.shape[:-1] + (len(CANONICAL),), probs4.dtype)
    return out.at[..., jnp.asarray(_IEMOCAP4_SLOTS)].set(probs4)
