"""Evaluation harness — ground-truth comparison per modality.

Rebuilds the reference evaluator (reference ``src/inference.py:36-300``):
per modality ∈ {face, audio, text, fused} computes accuracy, a
classification report, per-emotion ROC-AUC (:116-170); renders per-modality
confusion-matrix heatmaps and a 4-line emotion timeline (:172-248); writes
``metrics.json`` (:296-298). Emotion labels use the reference's Portuguese
order (:55-58).

Ground truth format (reference :283-287): ``{"0.0-5.0": ["feliz", ...]}`` —
segment time-key → list of annotations.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from msa_tpu.core import emotions

logger = logging.getLogger(__name__)

PT_EMOTIONS = list(emotions.PT_UI)


def _dominant_label(vec: List[float]) -> str:
    """argmax over the first 7 dims, labeled in the reference UI order
    (examples/streaming_example.py:23-25 convention)."""
    v = np.asarray(vec, np.float32).reshape(-1)[:7]
    return PT_EMOTIONS[int(np.argmax(v))]


class ModelEvaluator:
    def __init__(self, processor=None, config=None, models=None):
        if processor is None:
            from msa_tpu.processors.offline import OfflineProcessor

            processor = OfflineProcessor(config=config, models=models)
        self.processor = processor
        self.emotions = PT_EMOTIONS

    # ------------------------------------------------------------------

    def evaluate_video(
        self,
        video_path: str,
        ground_truth: Dict[str, List[str]],
        output_dir: str = "evaluation",
    ) -> Dict[str, Dict]:
        """Process a video, compare against ground truth, write plots +
        metrics.json (reference inference.py:68-114)."""
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)

        segments: List[Dict] = []
        speakers = self.processor.process_video(video_path)
        for sp in speakers:
            segments.extend(sp["raw_analysis"])

        metrics = {
            m: self._calculate_metrics(segments, ground_truth, m)
            for m in ("face", "audio", "text", "fused")
        }
        self._generate_visualizations(segments, ground_truth, out)
        (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
        return metrics

    # ------------------------------------------------------------------

    def _pairs(self, segments, ground_truth, modality):
        """(y_true, y_pred) per reference inference.py:126-146: ground truth
        looked up by 'start-end' key (default ['neutro']), prediction
        repeated per annotation."""
        y_true: List[str] = []
        y_pred: List[str] = []
        key_of = lambda r: f"{r['start']:.1f}-{r['end']:.1f}"  # noqa: E731
        vec_of = {
            "face": lambda r: r["face_vec"],
            "audio": lambda r: r["audio_vec"],
            "text": lambda r: r["text_vec"],
            "fused": lambda r: r["fused_vec"],
        }[modality]
        for r in segments:
            truth = ground_truth.get(key_of(r), ["neutro"])
            pred = _dominant_label(vec_of(r))
            y_true.extend(truth)
            y_pred.extend([pred] * len(truth))
        return y_true, y_pred

    def _scores(self, segments, ground_truth, modality):
        """(y_true labels, [n, 7] probability scores in PT-UI order) for
        score-based AUC. Per-modality records carry true probability vectors
        in CANONICAL order (``face_probs``/``audio_probs``/``text_probs``,
        processors/offline.py); the fused record is raw logits in the PT-UI
        argmax convention → softmax. Returns (None, None) when the records
        predate the prob export (binarized fallback applies)."""
        key_of = lambda r: f"{r['start']:.1f}-{r['end']:.1f}"  # noqa: E731
        y_true: List[str] = []
        scores: List[np.ndarray] = []
        for r in segments:
            truth = ground_truth.get(key_of(r), ["neutro"])
            if modality == "fused":
                combo = r.get("modalities")
                if combo is not None and int(combo).bit_count() < 2:
                    # degraded segment: fused_vec is a raw single-modality
                    # slice (or a default vector), NOT fused-head logits —
                    # softmaxing it as PT-UI logits would pollute the AUC.
                    # Use the modality's true probability vector instead.
                    probs = {
                        0b100: r.get("face_probs"),
                        0b010: r.get("audio_probs"),
                        0b001: r.get("text_probs"),
                    }.get(int(combo))
                    if probs is None:
                        s = np.full(7, 1 / 7.0)
                    else:
                        s = emotions.reorder_np(
                            np.asarray(probs, np.float64)[:7],
                            emotions.CANONICAL_TO_PT_UI,
                        )
                else:
                    v = np.asarray(r["fused_vec"], np.float64)[:7]
                    e = np.exp(v - v.max())
                    s = e / e.sum()
            else:
                probs = r.get(f"{modality}_probs")
                if probs is None:
                    return None, None
                s = emotions.reorder_np(
                    np.asarray(probs, np.float64)[:7], emotions.CANONICAL_TO_PT_UI
                )
            y_true.extend(truth)
            scores.extend([s] * len(truth))
        return y_true, np.asarray(scores)

    def _calculate_metrics(self, segments, ground_truth, modality) -> Dict:
        """accuracy + classification_report (inference.py:148-156) +
        per-emotion ROC-AUC.

        AUC repair (documented intent): the reference computes AUC on
        BINARIZED argmax predictions (inference.py:158-168), which is
        degenerate (one threshold). Probability vectors are available here,
        so AUC uses the real per-emotion scores; the binarized form remains
        the fallback for prob-less records."""
        from sklearn.metrics import (
            accuracy_score,
            classification_report,
            roc_auc_score,
        )

        y_true, y_pred = self._pairs(segments, ground_truth, modality)
        if not y_true:
            return {"accuracy": 0.0}
        metrics: Dict = {
            "accuracy": float(accuracy_score(y_true, y_pred)),
            "classification_report": classification_report(
                y_true, y_pred, labels=self.emotions, output_dict=True, zero_division=0
            ),
        }
        ys, scores = self._scores(segments, ground_truth, modality)
        for i, emotion in enumerate(self.emotions):
            if scores is not None:
                t = [1 if e == emotion else 0 for e in ys]
                p = scores[:, i]
            else:  # reference-faithful binarized fallback
                t = [1 if e == emotion else 0 for e in y_true]
                p = [1 if e == emotion else 0 for e in y_pred]
            try:
                metrics[f"roc_auc_{emotion}"] = float(roc_auc_score(t, p))
            except ValueError:
                metrics[f"roc_auc_{emotion}"] = 0.0
        return metrics

    def _generate_visualizations(self, segments, ground_truth, out: Path):
        """Confusion-matrix heatmaps + emotion timeline
        (inference.py:172-248)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.metrics import confusion_matrix

        for modality in ("face", "audio", "text", "fused"):
            y_true, y_pred = self._pairs(segments, ground_truth, modality)
            if not y_true:
                continue
            cm = confusion_matrix(y_true, y_pred, labels=self.emotions)
            fig, ax = plt.subplots(figsize=(10, 8))
            im = ax.imshow(cm, cmap="Blues")
            ax.set_xticks(range(len(self.emotions)), self.emotions, rotation=45)
            ax.set_yticks(range(len(self.emotions)), self.emotions)
            for i in range(cm.shape[0]):
                for j in range(cm.shape[1]):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center")
            ax.set_title(f"Matriz de Confusão - {modality}")
            ax.set_xlabel("Predição")
            ax.set_ylabel("Ground Truth")
            fig.colorbar(im)
            fig.tight_layout()
            fig.savefig(out / f"confusion_matrix_{modality}.png")
            plt.close(fig)

        # timeline: one line per modality (inference.py:221-248)
        fig, ax = plt.subplots(figsize=(15, 5))
        for modality in ("face", "audio", "text", "fused"):
            times, emos = [], []
            vec_of = {
                "face": "face_vec",
                "audio": "audio_vec",
                "text": "text_vec",
                "fused": "fused_vec",
            }[modality]
            for r in segments:
                times.append(r["start"])
                emos.append(self.emotions.index(_dominant_label(r[vec_of])))
            ax.plot(times, emos, label=modality)
        ax.set_yticks(range(len(self.emotions)), self.emotions)
        ax.set_title("Timeline de Emoções")
        ax.set_xlabel("Tempo (s)")
        ax.set_ylabel("Emoção")
        ax.legend()
        fig.savefig(out / "emotion_timeline.png")
        plt.close(fig)
