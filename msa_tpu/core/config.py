"""Single typed configuration tree with environment overrides.

The reference has three drifting config mechanisms — dotenv vars, module-level
dicts (reference ``src/config/config.py:31-101``), and dataclasses
(``src/structures/config.py``) that disagree with each other (SURVEY.md
defects D1/D6). Here there is exactly one source of truth: this dataclass
tree, with ``SystemConfig.from_env()`` applying environment overrides.

All shape-bearing fields are static so a single jit compilation covers the
whole run (segment windows are fixed 5 s @ 16 kHz = 80_000 samples, text is
fixed 512 tokens — mirrors reference config.py:43, text_analyzer.py:143).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors the reference MODEL_CONFIG dict (config.py:31-39)."""

    device: str = "tpu"
    face_model: str = "msa_tpu/face-emotion-cnn"
    audio_model: str = "msa_tpu/audio-emotion-encoder"  # wav2vec2-style
    text_model: str = "msa_tpu/bert-trunk"  # BERT-base-style shared trunk
    # user-trained fusion weights (training/train_fusion.py output path —
    # reference config.py:35); when absent the SHIPPED trained checkpoint
    # (msa_tpu/checkpoints/fusion.msgpack) loads instead
    fusion_checkpoint: str = "checkpoints/best_model.msgpack"
    # (face, audio, text) — reference config.py:37
    weights: Tuple[float, float, float] = (0.4, 0.3, 0.3)
    hf_token: Optional[str] = None


@dataclass(frozen=True)
class ProcessingConfig:
    """Mirrors PROCESSING_CONFIG (reference config.py:42-48)."""

    segment_duration: float = 5.0
    min_speech_duration: float = 0.5
    min_pause_duration: float = 0.5
    output_dir: str = "output"
    temp_dir: str = "temp"


@dataclass(frozen=True)
class StreamingConfig:
    """Mirrors STREAMING_CONFIG (reference config.py:51-57)."""

    video_source: int = 0
    audio_source: int = 0
    sample_rate: int = 16000
    channels: int = 1
    chunk_size: int = 1024
    # Live transcription of each streaming window. The reference always
    # passes text="" live (streaming_processor.py:422-424, defect D9), so
    # False is the parity default; True feeds each drained audio window
    # through the configured Transcriber so the text modality runs live —
    # the capability the reference's whisper config intended but never wired.
    live_transcription: bool = False


@dataclass(frozen=True)
class DiarizationConfig:
    """Mirrors DIARIZATION_CONFIG (reference config.py:67-72)."""

    # pluggable; reference used pyannote. "neural" (default — the shipped
    # GE2E-trained checkpoint in ``speaker_weights`` makes it active out of
    # the box) = learned speaker embeddings (models/speaker.py) +
    # agglomerative clustering; the factory degrades to "clustering"
    # (energy VAD + MFCC-signature k-means) when no checkpoint exists.
    model: str = "neural"
    min_speakers: int = 1
    max_speakers: int = 4
    # trained SpeakerEmbeddingNet checkpoint (training/train_speaker.py)
    speaker_weights: str = "checkpoints/speaker_embedder.msgpack"
    # agglomerative merge threshold on cosine similarity of span embeddings
    # (NeuralDiarizer): merging stops when the best pair falls below this
    clustering_threshold: float = 0.6


@dataclass(frozen=True)
class TranscriptionConfig:
    """Mirrors TRANSCRIPTION_CONFIG (reference config.py:75-79).

    The reference intended openai/whisper-medium but actually built an ASR
    pipeline from a BERT checkpoint (defect D3) so transcription always
    degraded to "". We expose a pluggable Transcriber. The default ``auto``
    resolves to the TPU-native jax-whisper backend when pretrained weights +
    BPE tokenizer assets exist under ``data/assets/whisper`` (override with
    MSA_WHISPER_ASSETS) and to the stub — the reference's *effective*
    behavior, empty transcripts — otherwise. ``jax-whisper`` forces the
    native backend regardless of assets; ``stub`` forces empty transcripts.
    """

    model: str = "auto"
    language: str = "pt"
    task: str = "transcribe"


@dataclass(frozen=True)
class FaceAnalysisConfig:
    """Face pipeline statics (reference FACE_ANALYSIS_CONFIG config.py:82-87
    plus FaceMesh settings face_analyzer.py:27-32)."""

    max_num_faces: int = 1  # reference cap, face_analyzer.py:29
    min_detection_confidence: float = 0.5
    landmark_count: int = 478  # MediaPipe FaceMesh landmark contract
    frame_size: int = 192  # landmark net input resolution
    crop_size: int = 48  # emotion CNN input resolution
    history_size: int = 10  # movement history, face_analyzer.py:35


@dataclass(frozen=True)
class AudioAnalysisConfig:
    """Audio DSP statics (reference AUDIO_ANALYSIS_CONFIG config.py:90-94 and
    analyzer constants audio_analyzer.py:52-54)."""

    sample_rate: int = 16000
    channels: int = 1
    window_size: float = 0.025  # 25 ms rhythm window
    hop_length: float = 0.010  # 10 ms rhythm hop
    n_mfcc: int = 13
    # torchaudio.transforms.MFCC defaults the reference relied on:
    n_fft: int = 400
    mel_hop: int = 200
    n_mels: int = 128
    # D8 repair switch: "reference" keeps the pitch slot at 0.0 (the
    # reference's PitchShift(n_steps=0) construction is a no-op), "acf"
    # enables a real autocorrelation F0 estimate behind the same 1-dim slot.
    pitch_mode: str = "reference"


@dataclass(frozen=True)
class TextAnalysisConfig:
    """Text statics (reference TEXT_ANALYSIS_CONFIG config.py:97-101)."""

    max_length: int = 512
    truncation: bool = True
    padding: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / parallelism axes (no reference equivalent — the
    reference is single-process single-device, SURVEY.md §2.10)."""

    data_parallel: int = -1  # -1 → all devices on the data axis
    model_parallel: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class PipelineConfig:
    """Static shapes for the single jitted end-to-end graph."""

    segment_samples: int = 80_000  # 5 s @ 16 kHz
    max_tokens: int = 512
    batch_size: int = 8
    compute_dtype: str = "bfloat16"  # MXU-friendly matmuls
    feature_dtype: str = "float32"  # feature math stays f32 for parity
    # "full" = production encoder sizes; "tiny" = test-scale models (same
    # graph, fast compile). Env override: MSA_MODEL_SCALE.
    model_scale: str = "full"
    # Pre-compile every (batch, token-bucket) graph shape at processor start
    # so no live window/batch ever hits a mid-stream compile stall. None →
    # resolved by scale (see should_precompile): full-scale processors
    # precompile by default (a library user's first process_segment must not
    # pay a multi-minute cold compile, VERDICT r2 #9), tiny/test models keep
    # it off to stay fast. Env override: MSA_PRECOMPILE=1/0.
    precompile: Optional[bool] = None

    def should_precompile(self) -> bool:
        if self.precompile is not None:
            return self.precompile
        return self.model_scale == "full"


@dataclass(frozen=True)
class DirectoryConfig:
    data_dir: str = "data"
    checkpoints_dir: str = "checkpoints"
    output_dir: str = "output"
    temp_dir: str = "temp"


@dataclass(frozen=True)
class SystemConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    streaming: StreamingConfig = field(default_factory=StreamingConfig)
    diarization: DiarizationConfig = field(default_factory=DiarizationConfig)
    transcription: TranscriptionConfig = field(default_factory=TranscriptionConfig)
    face: FaceAnalysisConfig = field(default_factory=FaceAnalysisConfig)
    audio: AudioAnalysisConfig = field(default_factory=AudioAnalysisConfig)
    text: TextAnalysisConfig = field(default_factory=TextAnalysisConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    dirs: DirectoryConfig = field(default_factory=DirectoryConfig)
    seed: int = 0

    @classmethod
    def from_env(cls, **overrides) -> "SystemConfig":
        """Build a config applying the same env vars the reference reads
        (HF_TOKEN config.py:17, MODEL_DEVICE config.py:32, FACE_MODEL
        face_analyzer.py:39, AUDIO_MODEL audio_analyzer.py:34)."""
        cfg = cls(**overrides)
        model_updates = {}
        if os.getenv("HF_TOKEN"):
            model_updates["hf_token"] = os.getenv("HF_TOKEN")
        if os.getenv("MODEL_DEVICE"):
            model_updates["device"] = os.getenv("MODEL_DEVICE")
        if os.getenv("FACE_MODEL"):
            model_updates["face_model"] = os.getenv("FACE_MODEL")
        if os.getenv("AUDIO_MODEL"):
            model_updates["audio_model"] = os.getenv("AUDIO_MODEL")
        if model_updates:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **model_updates)
            )
        if os.getenv("MSA_MODEL_SCALE"):
            cfg = dataclasses.replace(
                cfg,
                pipeline=dataclasses.replace(
                    cfg.pipeline, model_scale=os.environ["MSA_MODEL_SCALE"]
                ),
            )
        if os.getenv("MSA_PRECOMPILE"):
            cfg = dataclasses.replace(
                cfg,
                pipeline=dataclasses.replace(
                    cfg.pipeline,
                    precompile=os.environ["MSA_PRECOMPILE"] not in ("0", "false", ""),
                ),
            )
        return cfg

    def ensure_directories(self) -> None:
        """Create the working directories (reference config.py:104-105 did
        this implicitly at import time; here it is explicit)."""
        for d in (
            self.dirs.data_dir,
            self.dirs.checkpoints_dir,
            self.dirs.output_dir,
            self.dirs.temp_dir,
        ):
            Path(d).mkdir(parents=True, exist_ok=True)
