"""Host-side audio ingest: WAV IO and resampling.

Replaces the reference's torchaudio.load + Resample path
(reference ``src/analyzers/audio_analyzer.py:71-77``) and the PyAudio int16
byte stream (``src/processors/streaming_processor.py:183-196``). Pure
numpy/stdlib on the host; fixed-shape float32 windows are handed to the
device pipeline.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file → (float32 mono waveform in [-1, 1], sample_rate).
    Multi-channel audio is averaged to mono (the reference always works in
    mono, config.py:55)."""
    with wave.open(str(path), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def save_wav(path: str, x: np.ndarray, sample_rate: int) -> None:
    """Write a float32 mono waveform as 16-bit PCM (the reference's temp-wav
    format, streaming_processor.py:190-196)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    pcm = np.clip(np.asarray(x) * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())


def pcm16_bytes_to_float(data: bytes) -> np.ndarray:
    """Streaming byte buffer → float32 waveform
    (streaming_processor.py:183-188 convention). Uses the native runtime
    conversion when built."""
    pcm = np.frombuffer(data, np.int16)
    from msa_tpu.runtime import pcm16_to_f32

    return pcm16_to_f32(pcm)


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling to the pipeline rate (16 kHz). scipy's
    resample_poly matches torchaudio's kaiser-windowed sinc interpolation
    closely enough for feature parity; identity when rates match."""
    if sr_in == sr_out:
        return np.asarray(x, np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)


def fixed_window(x: np.ndarray, samples: int) -> np.ndarray:
    """Zero-pad or truncate a waveform to the static window size — ragged
    diarized segments bucket into one compiled shape (SURVEY §7 hard parts)."""
    x = np.asarray(x, np.float32)
    if x.shape[0] >= samples:
        return x[:samples]
    return np.pad(x, (0, samples - x.shape[0]))
