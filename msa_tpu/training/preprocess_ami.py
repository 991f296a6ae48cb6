"""AMI corpus preprocessing → fusion-training JSON.

Rebuilds the reference preprocessor (reference
``src/training/preprocess_ami.py:16-145``): per-meeting segment records with
per-modality feature vectors and a pseudo-label target =
renormalized 0.4/0.3/0.3 weighted average of the unimodal emotion vectors
(:93-100), shuffled and split 70/15/15 (:25, :127-137), written as
``{split}/data.json``.

Differences by documented intent:
- the reference's extractors are placeholders returning uniform 1/7 vectors
  (:45-67). Here extraction runs the REAL segment pipeline over the media
  when present (batched on device), with the uniform placeholder as the
  explicit fallback for missing modalities.
- records carry the full-dimension feature vectors (face 27 / audio 31 /
  text 783) the fusion model actually consumes, fixing the reference's
  7-dim/27-dim training-vs-inference mismatch (defect D5).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

PSEUDO_LABEL_WEIGHTS = np.asarray([0.4, 0.3, 0.3])  # face, audio, text (:93)


def pseudo_label(
    face_emotions: np.ndarray, audio_emotions: np.ndarray, text_emotions: np.ndarray
) -> np.ndarray:
    """Renormalized weighted average of unimodal 7-dim emotion vectors —
    exact reference formula (preprocess_ami.py:93-100)."""
    target = (
        PSEUDO_LABEL_WEIGHTS[0] * face_emotions
        + PSEUDO_LABEL_WEIGHTS[1] * audio_emotions
        + PSEUDO_LABEL_WEIGHTS[2] * text_emotions
    )
    return target / target.sum()


class AMIPreprocessor:
    def __init__(
        self,
        ami_dir: str,
        output_dir: str,
        split_ratios: Tuple[float, float, float] = (0.7, 0.15, 0.15),
        models=None,
        config=None,
        seed: int = 0,
    ):
        self.ami_dir = Path(ami_dir)
        self.output_dir = Path(output_dir)
        self.split_ratios = split_ratios
        self.models = models
        self.config = config
        self.seed = seed
        for split in ("train", "val", "test"):
            (self.output_dir / split).mkdir(parents=True, exist_ok=True)

    # --- extraction ---------------------------------------------------------

    def _uniform(self, dim: int) -> np.ndarray:
        """Reference placeholder: uniform emotion vector padded into the
        full feature width (emotions uniform, other slots zero)."""
        v = np.zeros(dim, np.float32)
        n = 8 if dim == 31 else 7
        v[:n] = 1.0 / n
        return v

    def _process_meeting(self, meeting_dir: Path) -> List[Dict]:
        """One meeting directory (*.mp4/*.wav/*.txt triplets, reference
        :79-85) → segment records."""
        videos = sorted(meeting_dir.glob("*.mp4"))
        segments: List[Dict] = []

        if videos and self.models is not None:
            from msa_tpu.processors.offline import OfflineProcessor

            proc = OfflineProcessor(config=self.config, models=self.models)
            for video in videos:
                try:
                    for speaker in proc.process_video(str(video)):
                        for seg in speaker["raw_analysis"]:
                            face = np.asarray(seg["face_vec"], np.float32)
                            audio = np.asarray(seg["audio_vec"], np.float32)
                            text = np.asarray(seg["text_vec"], np.float32)
                            # pseudo-label from the TRUE probability vectors
                            # (canonical order, exported by the pipeline) —
                            # the *_vec slices are post-LayerNorm and can be
                            # negative / sum to ~0, which would make the KL
                            # target invalid (round-1 advisor finding)
                            target = pseudo_label(
                                np.asarray(seg["face_probs"], np.float32),
                                np.asarray(seg["audio_probs"], np.float32),
                                np.asarray(seg["text_probs"], np.float32),
                            )
                            segments.append(
                                {
                                    "face_vec": face.tolist(),
                                    "audio_vec": audio.tolist(),
                                    "text_vec": text.tolist(),
                                    "target": target.tolist(),
                                }
                            )
                except Exception as e:
                    logger.warning("meeting %s failed: %s", video, e)
        else:
            # placeholder path (reference :45-67): one uniform record per
            # media triplet so the training pipeline is runnable end-to-end
            count = max(len(videos), len(sorted(meeting_dir.glob("*.wav"))), 1)
            for _ in range(count):
                face = self._uniform(27)
                audio = self._uniform(31)
                text = self._uniform(783)
                target = pseudo_label(face[:7], audio[:7] * (8 / 7), text[:7])
                segments.append(
                    {
                        "face_vec": face.tolist(),
                        "audio_vec": audio.tolist(),
                        "text_vec": text.tolist(),
                        "target": (target / target.sum()).tolist(),
                    }
                )
        return segments

    # --- driver ---------------------------------------------------------------

    def process(self) -> Dict[str, int]:
        """Process every meeting; shuffle; split 70/15/15; write JSON
        (reference :114-145). Returns counts per split."""
        meeting_dirs = sorted(d for d in self.ami_dir.glob("*") if d.is_dir())
        all_segments: List[Dict] = []
        for meeting in meeting_dirs:
            all_segments.extend(self._process_meeting(meeting))

        rng = np.random.default_rng(self.seed)
        rng.shuffle(all_segments)
        n = len(all_segments)
        train_end = int(n * self.split_ratios[0])
        val_end = train_end + int(n * self.split_ratios[1])
        splits = {
            "train": all_segments[:train_end],
            "val": all_segments[train_end:val_end],
            "test": all_segments[val_end:],
        }
        for split, segs in splits.items():
            out = self.output_dir / split / "data.json"
            out.write_text(json.dumps(segs, indent=2))
            logger.info("wrote %d segments to %s", len(segs), out)
        return {k: len(v) for k, v in splits.items()}


def main(argv=None):
    """CLI mirroring the reference preprocessor's main
    (preprocess_ami.py:147-158)."""
    import argparse

    parser = argparse.ArgumentParser(description="Pré-processa o dataset AMI")
    parser.add_argument("--ami-dir", default="data/ami_raw")
    parser.add_argument("--output-dir", default="data/ami")
    parser.add_argument(
        "--real-extraction",
        action="store_true",
        help="run the full segment pipeline per meeting (default: placeholder)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    models = None
    if args.real_extraction:
        from msa_tpu.pipeline.graph import PipelineModels

        models = PipelineModels.initialize()
    counts = AMIPreprocessor(args.ami_dir, args.output_dir, models=models).process()
    logger.info("splits: %s", counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
