from msa_tpu.host.audio_io import load_wav, resample  # noqa: F401
from msa_tpu.host.diarization import (  # noqa: F401
    Diarizer,
    EnergyVADDiarizer,
    FixedWindowDiarizer,
    make_diarizer,
)
from msa_tpu.host.transcription import StubTranscriber, Transcriber, make_transcriber  # noqa: F401
from msa_tpu.host.video import VideoReader, extract_audio_track  # noqa: F401
