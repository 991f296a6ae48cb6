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


class JaxWhisperTranscriber:
    """TPU-native Whisper-style transcriber (msa_tpu.models.whisper): log-mel
    frontend + encoder-decoder + KV-cached greedy decode, all jitted.

    Text output needs a BPE tokenizer asset; without one (this build
    environment has no downloadable assets) decoded token ids are returned
    as a deterministic placeholder string only when ``tokenizer`` is given,
    else "". Pretrained weights import via
    models.whisper.params_from_hf_whisper.
    """

    def __init__(self, cfg=None, params=None, tokenizer=None, max_len: int = 64):
        import jax
        import jax.numpy as jnp

        from msa_tpu.models import whisper as W

        self.cfg = cfg or W.WhisperConfig.tiny()
        self.model = W.WhisperModel(self.cfg)
        self.params = params if params is not None else W.init_params(self.cfg)
        self.tokenizer = tokenizer
        self.max_len = min(max_len, self.cfg.max_target_positions)

        def _decode(params, mel):
            return self.model.apply(
                {"params": params}, mel, self.max_len, method=W.WhisperModel.greedy_decode
            )

        self._decode = jax.jit(_decode)
        self._jnp = jnp

    def _log_mel(self, waveform, sample_rate):
        """Whisper-style log-mel: n_fft 400, hop 160, n_mels, log10 with
        dynamic-range clamp."""
        import numpy as np

        from msa_tpu.ops.audio_features import mel_filterbank, power_spectrogram

        x = self._jnp.asarray(waveform, self._jnp.float32)
        power = power_spectrogram(x, n_fft=400, hop=160)  # [freq, frames]
        fb = self._jnp.asarray(
            mel_filterbank(201, self.cfg.n_mels, sample_rate, 0.0, sample_rate / 2)
        )
        mel = self._jnp.einsum("ft,fm->mt", power, fb)
        log_mel = self._jnp.log10(self._jnp.maximum(mel, 1e-10))
        log_mel = self._jnp.maximum(log_mel, log_mel.max() - 8.0)
        log_mel = (log_mel + 4.0) / 4.0
        t = log_mel.shape[1]
        # pad frames to the static source window
        t_max = 2 * self.cfg.max_source_positions
        if t < t_max:
            log_mel = self._jnp.pad(log_mel, ((0, 0), (0, t_max - t)))
        else:
            log_mel = log_mel[:, :t_max]
        return log_mel.T[None]  # [1, frames, n_mels]

    def transcribe(self, waveform, sample_rate: int) -> str:
        try:
            mel = self._log_mel(waveform, sample_rate)
            tokens, lengths = self._decode(self.params, mel)
            n = int(lengths[0])
            ids = [int(t) for t in tokens[0][:n]]
            if self.tokenizer is not None:
                return self.tokenizer.decode(ids)
            return ""  # no tokenizer asset → effective reference behavior
        except Exception:
            return ""


def make_transcriber(name: str, language: str = "pt") -> Transcriber:
    if name in ("stub", "", None):
        return StubTranscriber()
    if name in ("jax-whisper", "whisper-jax"):
        return JaxWhisperTranscriber()
    try:
        return HFTranscriber(name, language)
    except Exception:
        return StubTranscriber()
