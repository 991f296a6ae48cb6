"""Preprocessing → training → evaluation roundtrip tests."""

import json

import numpy as np
import pytest

from msa_tpu.training.preprocess_ami import AMIPreprocessor, pseudo_label


def test_pseudo_label_reference_formula(rng):
    """preprocess_ami.py:93-100: renormalized 0.4/0.3/0.3 weighted average."""
    f, a, t = rng.random(7), rng.random(7), rng.random(7)
    got = pseudo_label(f, a, t)
    want = 0.4 * f + 0.3 * a + 0.3 * t
    want /= want.sum()
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.sum() == pytest.approx(1.0)


def test_preprocess_placeholder_path_and_splits(tmp_path):
    """Placeholder extraction (reference :45-67) + 70/15/15 split
    (:25, :127-137) + JSON layout (:139-145)."""
    ami = tmp_path / "ami_raw"
    for meeting in ("m1", "m2"):
        d = ami / meeting
        d.mkdir(parents=True)
        for i in range(10):
            (d / f"seg{i}.wav").write_bytes(b"")
    pre = AMIPreprocessor(str(ami), str(tmp_path / "ami"), models=None)
    counts = pre.process()
    assert counts["train"] == 14  # 70% of 20
    assert counts["val"] == 3
    assert counts["test"] == 3
    rec = json.loads((tmp_path / "ami/train/data.json").read_text())[0]
    assert len(rec["face_vec"]) == 27
    assert len(rec["audio_vec"]) == 31
    assert len(rec["text_vec"]) == 783
    assert len(rec["target"]) == 7
    assert sum(rec["target"]) == pytest.approx(1.0, abs=1e-5)


def test_preprocess_feeds_trainer(tmp_path):
    """The preprocessor's JSON is directly trainable (fixes reference D5
    7-dim/27-dim mismatch)."""
    from msa_tpu.models.fusion import FusionMLP
    from msa_tpu.training.train_fusion import train

    ami = tmp_path / "ami_raw" / "m1"
    ami.mkdir(parents=True)
    for i in range(40):
        (ami / f"seg{i}.wav").write_bytes(b"")
    AMIPreprocessor(str(tmp_path / "ami_raw"), str(tmp_path / "ami")).process()

    params, history = train(
        data_dir=str(tmp_path / "ami"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_size=8,
        num_epochs=1,
        model=FusionMLP(hidden_dim=32),
    )
    assert np.isfinite(history["train_loss"][0])


def test_evaluator_metrics_and_plots(tmp_path):
    """Evaluator on canned segments: metrics.json + PNGs
    (inference.py:116-248, :296-298)."""
    from msa_tpu.evaluation.evaluator import ModelEvaluator

    rng = np.random.default_rng(0)

    class FakeProcessor:
        def process_video(self, path):
            segs = []
            for i in range(4):
                vec = rng.random(7).tolist()
                segs.append(
                    {
                        "start": float(i * 5),
                        "end": float(i * 5 + 5),
                        "speaker": "A",
                        "face_vec": rng.random(27).tolist(),
                        "audio_vec": rng.random(31).tolist(),
                        "text_vec": rng.random(783).tolist(),
                        "fused_vec": vec,
                        "fused_emotion": "feliz",
                        "transcript": "",
                    }
                )
            return [{"person": "A", "raw_analysis": segs}]

    ev = ModelEvaluator(processor=FakeProcessor())
    gt = {"0.0-5.0": ["feliz", "neutro"], "5.0-10.0": ["triste"]}
    metrics = ev.evaluate_video("x.mp4", gt, output_dir=str(tmp_path / "eval"))
    assert set(metrics) == {"face", "audio", "text", "fused"}
    assert 0.0 <= metrics["fused"]["accuracy"] <= 1.0
    assert "roc_auc_feliz" in metrics["fused"]
    assert (tmp_path / "eval/metrics.json").exists()
    for m in ("face", "audio", "text", "fused"):
        assert (tmp_path / f"eval/confusion_matrix_{m}.png").exists()
    assert (tmp_path / "eval/emotion_timeline.png").exists()


def test_cli_offline_mode(tmp_path, monkeypatch):
    """python -m msa_tpu.main --mode offline --video ... (D1 repaired)."""
    cv2 = pytest.importorskip("cv2")
    from msa_tpu.host.audio_io import save_wav
    from msa_tpu import main as cli

    video = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(20):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()
    sr = 16000
    save_wav(str(tmp_path / "v.wav"), 0.2 * rng.normal(size=2 * sr), sr)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MSA_MODEL_SCALE", "tiny")
    rc = cli.main(
        ["--mode", "offline", "--video", str(video), "--output-dir", str(tmp_path / "out")]
    )
    assert rc == 0
    lines = (tmp_path / "out/results.json").read_text().strip().splitlines()
    assert lines
    rec = json.loads(lines[0])
    assert rec["fused_emotion"] in ["feliz", "triste", "raiva", "medo", "surpresa", "nojo", "neutro"]
