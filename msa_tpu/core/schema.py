"""Result schemas.

Pytree dataclasses mirroring the reference analysis dataclasses
(reference ``src/structures/analysis.py:26-143``) plus a builder for the
canonical streaming output dict (reference
``src/processors/streaming_processor.py:322-370`` — the public schema the
rebuild must preserve).

Arrays are ``numpy``/``jax`` arrays instead of torch tensors; the dataclasses
are registered as jax pytrees so whole batches of them can flow through jitted
functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np


class DictMixin:
    """Dict-style access, as the reference's DictMixin (analysis.py:14-24)."""

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)


def _register_pytree(cls, array_fields, static_fields):
    def flatten(obj):
        children = tuple(getattr(obj, f) for f in array_fields)
        aux = tuple(getattr(obj, f) for f in static_fields)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(array_fields, children))
        kwargs.update(dict(zip(static_fields, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclass
class FaceAnalysis(DictMixin):
    """Per-frame face result (reference analysis.py:26-40)."""

    speaker_id: str
    emotion_probs: Any  # [..., 7]
    micro_expressions: Any  # [..., 5]
    gaze_direction: Any  # [..., 3]
    muscle_tension: Any  # [..., 4]
    movement_patterns: Any  # [..., 4]
    face_position: Dict[str, int]  # {x, y, w, h}
    detection_confidence: float
    landmark_quality: float
    expression_quality: float
    movement_quality: float


@dataclass
class AudioAnalysis(DictMixin):
    """Per-clip audio result (reference analysis.py:42-56)."""

    speaker_id: str
    emotion_probs: Any  # [..., 8] — D7 contract kept
    pitch: Any  # [..., 1]
    intensity: Any  # [..., 1]
    timbre: Any  # [..., 13]
    speech_rate: Any  # [..., 1]
    rhythm: Any  # [..., 3]
    audio_quality: float
    signal_noise_ratio: float
    clarity: float
    consistency: float


@dataclass
class TextAnalysis(DictMixin):
    """Per-utterance text result (reference analysis.py:58-72)."""

    speaker_id: str
    emotion_probs: Any  # [..., 7]
    sarcasm_score: Any  # [..., 1]
    humor_score: Any  # [..., 1]
    polarity: Any  # [..., 1]
    intensity: Any  # [..., 1]
    context_embedding: Any  # [..., 768]
    text_quality: float
    coherence: float
    completeness: float
    relevance: float


@dataclass
class SegmentAnalysis(DictMixin):
    """One diarized segment (reference analysis.py:74-100)."""

    start_time: float
    end_time: float
    speaker_id: str
    face_analysis: Optional[FaceAnalysis]
    audio_analysis: Optional[AudioAnalysis]
    text_analysis: Optional[TextAnalysis]
    fused_vector: Any  # [7] logits (reference emits raw logits, SURVEY §3.3)
    transcript: Optional[str]
    confidence: float
    dominant_emotion: str


@dataclass
class SpeakerAnalysis(DictMixin):
    """Per-speaker aggregate (reference analysis.py:102-110)."""

    speaker_id: str
    segments: List[SegmentAnalysis]
    dominant_emotion: str
    emotion_patterns: List[str]
    average_confidence: float
    emotion_timeline: List[Dict[str, Union[float, str]]]


@dataclass
class VideoAnalysis(DictMixin):
    """Whole-video aggregate (reference analysis.py:112-120)."""

    video_path: Path
    duration: float
    speakers: List[SpeakerAnalysis]
    global_emotion: str
    emotion_transitions: List[Dict[str, Union[float, str]]]
    confidence: float


@dataclass
class StreamingAnalysis(DictMixin):
    """Live result snapshot (reference analysis.py:122-132)."""

    current_emotion: str
    current_confidence: float
    emotion_history: List[Dict[str, Union[float, str]]]
    speaker_id: str
    timestamp: float
    is_speaking: bool
    face_detected: bool
    audio_quality: float


@dataclass
class CompleteAnalysisResult(DictMixin):
    """Top-level result (reference analysis.py:134-143)."""

    video_path: Path
    duration: float
    speakers: List[SpeakerAnalysis]
    global_emotion: str
    emotion_transitions: List[Dict[str, Union[float, str]]]
    confidence: float
    processing_time: float
    error: Optional[str] = None


def _np(x) -> Optional[np.ndarray]:
    if x is None:
        return None
    return np.asarray(x).squeeze()


def build_streaming_output(
    face: Optional[FaceAnalysis],
    audio: Optional[AudioAnalysis],
    text: Optional[TextAnalysis],
    fused_vector: Optional[Any],
    weights: Optional[Dict[str, float]],
    speaker_id: Optional[str],
) -> Dict:
    """Build the canonical streaming output dict.

    Field-for-field the schema of reference streaming_processor.py:322-370:
    per-modality sub-dicts (None when the modality is unavailable), the fused
    vector (or the most-confident raw modality fallback — resolved by the
    caller), the softmaxed modality weights, and the speaker id.
    """
    return {
        "face": None
        if face is None
        else {
            "emotion_probs": _np(face.emotion_probs),
            "micro_expressions": _np(face.micro_expressions),
            "gaze_direction": _np(face.gaze_direction),
            "muscle_tension": _np(face.muscle_tension),
            "movement_patterns": _np(face.movement_patterns),
            "face_position": face.face_position,
            "face_quality": {
                "detection_confidence": face.detection_confidence,
                "landmark_quality": face.landmark_quality,
                "expression_quality": face.expression_quality,
                "movement_quality": face.movement_quality,
            },
        },
        "audio": None
        if audio is None
        else {
            "emotion_probs": _np(audio.emotion_probs),
            "pitch": _np(audio.pitch),
            "intensity": _np(audio.intensity),
            "timbre": _np(audio.timbre),
            "speech_rate": _np(audio.speech_rate),
            "rhythm": _np(audio.rhythm),
            "audio_quality": {
                "quality": audio.audio_quality,
                "signal_noise_ratio": audio.signal_noise_ratio,
                "clarity": audio.clarity,
                "consistency": audio.consistency,
            },
        },
        "text": None
        if text is None
        else {
            "emotion_probs": _np(text.emotion_probs),
            "sarcasm_score": _np(text.sarcasm_score),
            "humor_score": _np(text.humor_score),
            "polarity": _np(text.polarity),
            "intensity": _np(text.intensity),
            "context_embedding": _np(text.context_embedding),
            "text_quality": {
                "quality": text.text_quality,
                "coherence": text.coherence,
                "completeness": text.completeness,
                "relevance": text.relevance,
            },
        },
        "fused_emotion": _np(fused_vector),
        "weights": weights,
        "speaker_id": speaker_id,
    }


EMPTY_STREAMING_OUTPUT: Dict = {
    "face": None,
    "audio": None,
    "text": None,
    "fused_emotion": None,
    "weights": None,
    "speaker_id": None,
}

# Register the array-carrying dataclasses as pytrees (speaker_id and quality
# floats ride as static aux data; arrays are leaves).
_register_pytree(
    FaceAnalysis,
    (
        "emotion_probs",
        "micro_expressions",
        "gaze_direction",
        "muscle_tension",
        "movement_patterns",
    ),
    (
        "speaker_id",
        "face_position",
        "detection_confidence",
        "landmark_quality",
        "expression_quality",
        "movement_quality",
    ),
)
_register_pytree(
    AudioAnalysis,
    ("emotion_probs", "pitch", "intensity", "timbre", "speech_rate", "rhythm"),
    (
        "speaker_id",
        "audio_quality",
        "signal_noise_ratio",
        "clarity",
        "consistency",
    ),
)
_register_pytree(
    TextAnalysis,
    (
        "emotion_probs",
        "sarcasm_score",
        "humor_score",
        "polarity",
        "intensity",
        "context_embedding",
    ),
    ("speaker_id", "text_quality", "coherence", "completeness", "relevance"),
)
