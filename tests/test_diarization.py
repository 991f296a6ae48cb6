"""Diarizer tests: VAD spans, fixed windows, multi-speaker clustering."""

import numpy as np
import pytest

from msa_tpu.host.diarization import (
    ClusteringDiarizer,
    EnergyVADDiarizer,
    FixedWindowDiarizer,
)

SR = 16_000


def test_fixed_window_segments():
    d = FixedWindowDiarizer(segment_duration=5.0)
    segs = d.diarize(np.zeros(int(12.5 * SR), np.float32), SR)
    assert [round(s["end"] - s["start"], 2) for s in segs] == [5.0, 5.0, 2.5]
    assert all(s["speaker"] == "SPEAKER_00" for s in segs)


def test_vad_finds_speech_islands(rng):
    """speech (2 s) – silence (2 s) – speech (2 s) → two spans."""
    t = np.arange(2 * SR) / SR
    speech = (0.5 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    silence = (0.001 * rng.normal(size=2 * SR)).astype(np.float32)
    x = np.concatenate([speech, silence, speech])
    segs = EnergyVADDiarizer(min_pause_duration=0.5).diarize(x, SR)
    assert len(segs) == 2
    assert segs[0]["start"] < 0.5 and abs(segs[0]["end"] - 2.0) < 0.5
    assert abs(segs[1]["start"] - 4.0) < 0.5


def test_vad_silence_only(rng):
    x = (1e-5 * rng.normal(size=3 * SR)).astype(np.float32)
    segs = EnergyVADDiarizer().diarize(x, SR)
    assert segs == [] or all(s["end"] - s["start"] >= 0.5 for s in segs)


def test_clustering_separates_two_speakers(rng):
    """Alternating low-pitch and high-pitch 'voices' → two speaker labels
    with the alternation preserved."""

    def voice(f0, seconds=2.0, seed=0):
        r = np.random.default_rng(seed)
        t = np.arange(int(seconds * SR)) / SR
        x = np.zeros_like(t)
        # harmonic stack gives a distinct spectral envelope per f0
        for h, amp in ((1, 1.0), (2, 0.6), (3, 0.3), (5, 0.15)):
            x += amp * np.sin(2 * np.pi * f0 * h * t)
        x *= 0.3 * (1 + 0.4 * np.sin(2 * np.pi * 3.1 * t))
        return (x + 0.01 * r.normal(size=len(t))).astype(np.float32)

    gap = (0.0005 * rng.normal(size=SR)).astype(np.float32)
    clips = []
    order = ["A", "B", "A", "B"]
    for i, who in enumerate(order):
        clips.append(voice(110 if who == "A" else 340, seed=i))
        clips.append(gap)
    x = np.concatenate(clips)

    d = ClusteringDiarizer(min_pause_duration=0.5, max_speakers=4)
    segs = d.diarize(x, SR)
    assert len(segs) >= 4
    labels = [s["speaker"] for s in segs]
    assert len(set(labels)) == 2, f"expected 2 speakers, got {set(labels)}"
    # alternation: consecutive spans belong to different clusters
    assert labels[0] != labels[1]
    # stable naming convention
    assert labels[0] == "SPEAKER_00"


def test_clustering_single_speaker_stays_single(rng):
    t = np.arange(6 * SR) / SR
    x = (0.3 * np.sin(2 * np.pi * 160 * t) * (1 + 0.3 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    segs = ClusteringDiarizer(max_speakers=4).diarize(x, SR)
    assert segs
    assert set(s["speaker"] for s in segs) == {"SPEAKER_00"}
