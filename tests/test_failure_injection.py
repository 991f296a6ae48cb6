"""Failure detection / graceful degradation under injected faults
(SURVEY §5: the reference's degrade-to-default contract is a real capability
— here it is exercised by breaking components on purpose)."""

import numpy as np
import pytest

from msa_tpu.core.config import DirectoryConfig, PipelineConfig, SystemConfig
from msa_tpu.pipeline.graph import PipelineModels
from msa_tpu.processors.offline import OfflineProcessor
from msa_tpu.processors.streaming import (
    StreamingProcessor,
    SyntheticAudioSource,
    SyntheticFrameSource,
)

SAMPLES = 4000


# tiny_models comes from conftest.py (session-scoped, shared across modules)


def _cfg(tmp_path):
    return SystemConfig(
        pipeline=PipelineConfig(segment_samples=SAMPLES, batch_size=4, model_scale="tiny"),
        dirs=DirectoryConfig(
            data_dir=str(tmp_path / "d"),
            checkpoints_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"),
            temp_dir=str(tmp_path / "t"),
        ),
    )


class ExplodingDiarizer:
    def diarize(self, waveform, sample_rate):
        raise RuntimeError("diarizer exploded")


class ExplodingTranscriber:
    def transcribe(self, waveform, sample_rate):
        raise RuntimeError("ASR exploded")


def _make_video(tmp_path, with_audio=True):
    cv2 = pytest.importorskip("cv2")
    from msa_tpu.host.audio_io import save_wav

    path = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(20):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()
    if with_audio:
        sr = 16000
        t = np.arange(2 * sr) / sr
        save_wav(str(tmp_path / "v.wav"), 0.3 * np.sin(2 * np.pi * 200 * t), sr)
    return str(path)


def test_offline_survives_diarizer_crash(tmp_path, tiny_models):
    """Diarizer exception → surfaced via on_error (never a silent crash)."""
    video = _make_video(tmp_path)
    proc = OfflineProcessor(
        config=_cfg(tmp_path), models=tiny_models, diarizer=ExplodingDiarizer()
    )
    errs = []
    out = proc.process_video(video, on_error=errs.append)
    assert out == []
    assert errs and "diarizer exploded" in str(errs[0])


def test_streaming_survives_pipeline_crash(tmp_path, tiny_models, monkeypatch):
    """Device-graph exception mid-stream → the reference's empty result dict
    (streaming_processor.py:372-377), loop keeps running."""
    proc = StreamingProcessor(
        config=_cfg(tmp_path),
        models=tiny_models,
        frame_source=SyntheticFrameSource(1, 48, 64),
        audio_source=SyntheticAudioSource(),
    )
    from msa_tpu.pipeline.graph import SegmentPipeline

    def boom(self, *args):
        raise RuntimeError("device graph exploded")

    # both dispatch entry points (packed stream + pytree fallback) hit the
    # same device graph, so a real device failure raises from either
    monkeypatch.setattr(SegmentPipeline, "run", boom)
    monkeypatch.setattr(SegmentPipeline, "run_stream", boom)
    frame = np.zeros((48, 64, 3), np.uint8)
    audio = SyntheticAudioSource(chunk_seconds=0.25).drain()
    out = proc.process_segment([frame], audio, "")
    assert out == {
        "face": None,
        "audio": None,
        "text": None,
        "fused_emotion": None,
        "weights": None,
        "speaker_id": None,
    }


def test_streaming_survives_diarizer_crash(tmp_path, tiny_models):
    """Diarization failure → speaker 'unknown', analysis continues
    (streaming_processor.py:203-205)."""
    proc = StreamingProcessor(
        config=_cfg(tmp_path),
        models=tiny_models,
        frame_source=SyntheticFrameSource(1, 48, 64),
        audio_source=SyntheticAudioSource(),
        diarizer=ExplodingDiarizer(),
    )
    frame = np.zeros((48, 64, 3), np.uint8)
    audio = SyntheticAudioSource(chunk_seconds=0.25).drain()
    out = proc.process_segment([frame], audio, "")
    assert out["speaker_id"] == "unknown"
    assert out["fused_emotion"] is not None  # analysis still ran


def test_offline_survives_transcriber_crash(tmp_path, tiny_models):
    """ASR failure per segment → empty transcript + default text analysis,
    exactly the reference's D3 degradation (offline_processor.py:204-208)."""
    video = _make_video(tmp_path)

    proc = OfflineProcessor(
        config=_cfg(tmp_path), models=tiny_models, transcriber=ExplodingTranscriber()
    )
    # transcriber exceptions must not kill the pipeline
    try:
        results = proc.process_video(video)
    except RuntimeError:
        pytest.fail("transcriber crash propagated out of process_video")
    assert results
    assert all(
        seg["transcript"] == "" for sp in results for seg in sp["raw_analysis"]
    )
