"""Streaming example — the canonical consumer of the streaming callback dict.

Mirrors the reference example (reference ``examples/streaming_example.py:
7-61``): argmax of ``result["fused_emotion"]`` mapped through the Portuguese
emotion list, printed with confidence, per-modality weights and speaker id.

Runs headless with synthetic capture when no webcam/microphone is present
(pass --synthetic or let it fall back automatically).
"""

import argparse

import numpy as np

from msa_tpu.core import emotions
from msa_tpu.core.config import SystemConfig
from msa_tpu.processors.streaming import (
    StreamingProcessor,
    SyntheticAudioSource,
    SyntheticFrameSource,
)


def process_result(result):
    """Callback mirroring the reference's result handling
    (examples/streaming_example.py:18-48)."""
    try:
        if result["fused_emotion"] is not None:
            vec = np.asarray(result["fused_emotion"]).reshape(-1)
            idx = int(np.argmax(vec[:7]))
            print(f"Emoção detectada: {emotions.PT_UI[idx]}")
            print(f"Confiança: {float(vec[idx]):.2f}")
            if result["weights"] is not None:
                print("\nPesos das modalidades:")
                print(f"  Face:  {result['weights']['face']:.2f}")
                print(f"  Áudio: {result['weights']['audio']:.2f}")
                print(f"  Texto: {result['weights']['text']:.2f}")
            if result["speaker_id"] is not None:
                print(f"\nSpeaker: {result['speaker_id']}")
        else:
            print("Nenhuma emoção detectada")
    except Exception as e:
        print(f"Erro ao processar resultado: {e}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", action="store_true", help="fontes sintéticas")
    parser.add_argument("--duration", type=float, default=5.0)
    parser.add_argument("--segments", type=int, default=3)
    args = parser.parse_args()

    kwargs = {}
    if args.synthetic:
        kwargs = {
            "frame_source": SyntheticFrameSource(num_frames=120),
            "audio_source": SyntheticAudioSource(),
        }
    processor = StreamingProcessor(config=SystemConfig.from_env(), **kwargs)

    print("Iniciando processamento de streaming... (Ctrl-C para sair)")
    try:
        processor.run(
            duration=args.duration,
            callback=process_result,
            max_segments=args.segments,
        )
    except KeyboardInterrupt:
        print("\nProcessamento interrompido pelo usuário")
    finally:
        print("Processamento finalizado")


if __name__ == "__main__":
    main()
