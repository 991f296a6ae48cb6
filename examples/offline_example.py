"""Offline example — analyze a video file end-to-end.

The canonical consumer of `OfflineProcessor.process_video` (reference entry
point, offline_processor.py:235-303): per-speaker dominant emotion, timeline
and consistency patterns.

Usage:
    python examples/offline_example.py VIDEO.mp4 [--tiny]
"""

import argparse
import json

from msa_tpu.core.config import SystemConfig
from msa_tpu.processors.offline import OfflineProcessor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("video")
    parser.add_argument(
        "--tiny", action="store_true", help="test-scale models (fast compile)"
    )
    parser.add_argument("--out", default="output/offline_results.json")
    args = parser.parse_args()

    import os

    if args.tiny:
        os.environ["MSA_MODEL_SCALE"] = "tiny"
    processor = OfflineProcessor(config=SystemConfig.from_env())

    speakers = processor.process_video(
        args.video,
        on_progress=lambda p: print(f"progresso: {p:.0%}", end="\r"),
    )
    print()
    for sp in speakers:
        print(f"Locutor {sp['person']}: emoção dominante = {sp['dominant_emotion']}")
        for seg in sp["emotion_segments"]:
            t0, t1 = seg["time"]
            print(f"  [{t0:7.2f}–{t1:7.2f}s] {seg['emotion']}")
        for pattern in sp["patterns"]:
            print(f"  padrão: {pattern}")

    from pathlib import Path

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(speakers, default=str, indent=2))
    print(f"resultados completos em {args.out}")


if __name__ == "__main__":
    main()
