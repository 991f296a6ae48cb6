"""Host-side video ingest.

Replaces the reference's per-segment cv2 seek+decode and ffmpeg subprocesses
(reference ``src/processors/offline_processor.py:72-94``, ``:118-169`` — one
ffmpeg + one cv2 open PER SEGMENT). Here a video is opened once; frames for
every diarized segment are decoded in a single sequential pass and batched
for the device.

ffmpeg is optional: audio extraction uses it when present, otherwise WAV
sidecar files are read directly and videos without extractable audio degrade
gracefully (audio_avail=False — the reference's fallback-to-default
contract).
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


class VideoReader:
    """One-pass frame access over a video file (cv2 backend)."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self.path = str(path)
        self._cap = cv2.VideoCapture(self.path)
        if not self._cap.isOpened():
            # cv2 returns -1 for every property on a failed open; surface a
            # real error instead of fabricating a 1-second phantom video
            raise IOError(f"cannot open video: {self.path}")
        self.fps = max(float(self._cap.get(cv2.CAP_PROP_FPS)), 0.0) or 30.0
        self.frame_count = max(int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT)), 0)
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)) or 640
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) or 480
        self.duration = self.frame_count / self.fps if self.fps else 0.0

    def close(self):
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def frame_at(self, time_sec: float) -> np.ndarray:
        """Single seek+decode; black 480×640 frame on failure — exact
        reference fallback (offline_processor.py:166-167). BGR uint8."""
        self._cap.set(self._cv2.CAP_PROP_POS_MSEC, max(time_sec, 0.0) * 1000.0)
        ret, frame = self._cap.read()
        if not ret or frame is None:
            return np.zeros((480, 640, 3), np.uint8)
        return frame

    def frames_at(self, times: List[float]) -> List[np.ndarray]:
        """Batched mid-segment frames in ONE ordered pass (the reference pays
        a fresh VideoCapture + seek per segment — offline_processor.py:161)."""
        order = np.argsort(times)
        frames: List[Optional[np.ndarray]] = [None] * len(times)
        for i in order:
            frames[i] = self.frame_at(float(times[i]))
        return frames  # type: ignore[return-value]


def preprocess_frame(frame_bgr: np.ndarray, size: int) -> np.ndarray:
    """BGR uint8 → RGB uint8 resized to the landmark-net input. Stays uint8:
    normalization to [0,1] happens on device (4× less transfer)."""
    import cv2

    rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
    return cv2.resize(rgb, (size, size), interpolation=cv2.INTER_LINEAR)


def extract_audio_track(
    video_path: str, temp_dir: str, sample_rate: int = 16_000
) -> Optional[Tuple[np.ndarray, int]]:
    """Extract the mono audio track of a video.

    Strategy (graceful degradation, no hard ffmpeg dependency):
    1. a sidecar ``<video>.wav`` next to the file (test/offline-friendly)
    2. ffmpeg subprocess — the reference's exact command
       (offline_processor.py:87-93: pcm_s16le, 16 kHz, mono)
    3. None → the audio modality is unavailable for this video.
    """
    from msa_tpu.host.audio_io import load_wav, resample

    sidecar = Path(video_path).with_suffix(".wav")
    if sidecar.exists():
        x, sr = load_wav(str(sidecar))
        return resample(x, sr, sample_rate), sample_rate

    if shutil.which("ffmpeg"):
        out = Path(temp_dir) / "extracted_audio.wav"
        out.parent.mkdir(parents=True, exist_ok=True)
        cmd = [
            "ffmpeg",
            "-y",
            "-i",
            str(video_path),
            "-acodec",
            "pcm_s16le",
            "-ar",
            str(sample_rate),
            "-ac",
            "1",
            str(out),
        ]
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        if proc.returncode == 0 and out.exists():
            x, sr = load_wav(str(out))
            return x, sr
    return None
