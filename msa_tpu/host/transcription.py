"""Transcription interface.

The reference intended openai/whisper-medium (config.py:75-79) but actually
constructed an ASR pipeline from a BERT checkpoint and rebuilt it per segment
(offline_processor.py:317-321, defect D3) — so every transcript degraded to
"". The interface here is pluggable; the default stub preserves the
reference's *effective* behavior while a real backend (HF whisper when
weights are available) can drop in.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np


class Transcriber(Protocol):
    def transcribe(self, waveform: np.ndarray, sample_rate: int) -> str: ...


class StubTranscriber:
    """Always returns "" — the reference's effective behavior (D3). The text
    modality then takes its default analysis, exactly as the reference's
    empty-transcript path does (text_analyzer.py:66-68)."""

    def transcribe(self, waveform: np.ndarray, sample_rate: int) -> str:
        return ""


class HFTranscriber:
    """transformers ASR pipeline adapter (built ONCE, unlike the reference's
    per-segment reconstruction — D3). Requires downloadable weights."""

    def __init__(self, model: str = "openai/whisper-medium", language: str = "pt"):
        from transformers import pipeline  # deferred heavy import

        self._pipe = pipeline("automatic-speech-recognition", model=model)
        self._language = language

    def transcribe(self, waveform: np.ndarray, sample_rate: int) -> str:
        try:
            out = self._pipe(
                {"raw": np.asarray(waveform, np.float32), "sampling_rate": sample_rate}
            )
            return out.get("text", "")
        except Exception:
            return ""


def make_transcriber(name: str, language: str = "pt") -> Transcriber:
    if name in ("stub", "", None):
        return StubTranscriber()
    try:
        return HFTranscriber(name, language)
    except Exception:
        return StubTranscriber()
