"""Golden tests for the face landmark-geometry ops.

Reference formulas: src/analyzers/face_analyzer.py (citations per test).
Goldens computed independently in numpy from the reference formulas.
"""

import numpy as np
import pytest

from msa_tpu.ops import face_features as FF


@pytest.fixture
def landmarks(rng):
    """Synthetic face: landmarks in [0.2, 0.8]² with small z."""
    lm = rng.uniform(0.2, 0.8, size=(478, 3)).astype(np.float32)
    lm[:, 2] = rng.normal(scale=0.05, size=478)
    return lm


def _d(a, b):
    return float(np.sqrt(((a - b) ** 2).sum()))


def _tz(x):
    """torch-style z-score (unbiased std + 1e-6)."""
    x = np.asarray(x, np.float64)
    return (x - x.mean()) / (x.std(ddof=1) + 1e-6)


def test_micro_expressions_golden(landmarks):
    """face_analyzer.py:196-255: 5 distances then z-score."""
    pairs = [(10, 151), (105, 334), (33, 133), (1, 4), (61, 291)]
    want = _tz([_d(landmarks[i], landmarks[j]) for i, j in pairs])
    got = np.asarray(FF.micro_expressions(landmarks))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gaze_golden(landmarks):
    """face_analyzer.py:257-294."""
    lm = landmarks
    left = np.array(
        [lm[33, 0] - lm[133, 0], lm[159, 1] - lm[145, 1], lm[33, 2] - lm[133, 2]]
    )
    right = np.array(
        [lm[362, 0] - lm[263, 0], lm[386, 1] - lm[374, 1], lm[362, 2] - lm[263, 2]]
    )
    want = _tz((left + right) / 2)
    np.testing.assert_allclose(np.asarray(FF.gaze(lm)), want, atol=1e-4)


def test_muscle_tension_golden(landmarks):
    """face_analyzer.py:296-336: mean consecutive-pair distance per region."""
    regions = [(10, 151, 9, 8), (33, 133, 145, 159), (1, 4, 5, 6), (61, 291, 0, 17)]
    vals = []
    for r in regions:
        ds = [_d(landmarks[r[i]], landmarks[r[i + 1]]) for i in range(3)]
        vals.append(np.mean(ds))
    want = _tz(vals)
    np.testing.assert_allclose(np.asarray(FF.muscle_tension(landmarks)), want, atol=1e-4)


def test_movement_golden(landmarks, rng):
    """face_analyzer.py:338-392: 6 per-landmark deltas vs previous frame."""
    prev = landmarks + rng.normal(scale=0.01, size=landmarks.shape).astype(np.float32)
    ids = [10, 105, 33, 1, 61, 0]
    want = _tz([_d(landmarks[i], prev[i]) for i in ids])
    got = np.asarray(FF.movement(landmarks, prev, np.asarray(True)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_movement_without_history_is_zero(landmarks):
    got = np.asarray(FF.movement(landmarks, landmarks, np.asarray(False)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_bbox_golden(landmarks):
    """face_analyzer.py:63-83: min/max landmark box in pixels, clamped."""
    h, w = 480, 640
    got = np.asarray(FF.bbox(landmarks, h, w))
    x = int(landmarks[:, 0].min() * w)
    y = int(landmarks[:, 1].min() * h)
    bw = int((landmarks[:, 0].max() - landmarks[:, 0].min()) * w)
    bh = int((landmarks[:, 1].max() - landmarks[:, 1].min()) * h)
    want = [
        max(0, min(x, w)),
        max(0, min(y, h)),
        max(0, min(bw, w - x)),
        max(0, min(bh, h - y)),
    ]
    np.testing.assert_allclose(got, want, atol=1.0)


def test_landmark_quality_golden(landmarks):
    """face_analyzer.py:424-438 — np.std (biased) CV."""
    d = np.sqrt(((landmarks[:-1] - landmarks[1:]) ** 2).sum(axis=1))
    cv = d.std() / (d.mean() + 1e-6)
    want = 1.0 - min(cv, 1.0)
    assert float(FF.landmark_quality(landmarks)) == pytest.approx(want, abs=1e-4)


def test_expression_quality_golden(landmarks):
    lm = landmarks
    eye_sym = 1.0 - abs((lm[33, 1] - lm[133, 1]) - (lm[362, 1] - lm[263, 1]))
    mouth_q = 1.0 - abs((lm[61, 1] - lm[291, 1]) - 0.1)
    want = (eye_sym + mouth_q) / 2
    assert float(FF.expression_quality(lm)) == pytest.approx(want, abs=1e-4)


def test_movement_quality_golden(landmarks, rng):
    prev = landmarks + rng.normal(scale=1e-4, size=landmarks.shape).astype(np.float32)
    total = np.sqrt(((landmarks - prev) ** 2).sum(axis=1)).sum()
    want = 1.0 - min(total, 1.0)
    got = float(FF.movement_quality(landmarks, prev, np.asarray(True)))
    assert got == pytest.approx(want, abs=1e-3)
    assert float(FF.movement_quality(landmarks, prev, np.asarray(False))) == 0.0


def test_face_feature_stack_shapes_and_masking(landmarks):
    geometry, position, quality = FF.face_feature_stack(
        landmarks, landmarks, np.asarray(True), np.asarray(True), 480, 640
    )
    assert geometry.shape == (18,)
    assert position.shape == (4,)
    assert quality.shape == (4,)
    # no face → all zeros (reference default analysis, face_analyzer.py:476-490)
    g0, p0, q0 = FF.face_feature_stack(
        landmarks, landmarks, np.asarray(False), np.asarray(False), 480, 640
    )
    np.testing.assert_allclose(np.asarray(g0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q0), 0.0, atol=1e-6)


def test_stack_vmaps(landmarks, rng):
    import jax

    batch_lm = np.stack([landmarks] * 3)
    prev = np.roll(batch_lm, 1, axis=0)
    present = np.asarray([True, True, False])
    has_prev = np.asarray([False, True, True])
    g, p, q = jax.vmap(
        lambda lm, pl, fp, hp: FF.face_feature_stack(lm, pl, fp, hp, 480, 640)
    )(batch_lm, prev, present, has_prev)
    assert g.shape == (3, 18) and p.shape == (3, 4) and q.shape == (3, 4)
