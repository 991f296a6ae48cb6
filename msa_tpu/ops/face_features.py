"""Face landmark-geometry feature ops — pure jnp over [478, 3] landmarks.

TPU-first rebuild of the reference's landmark feature math (reference
``src/analyzers/face_analyzer.py``). The reference re-ran the MediaPipe C++
FaceMesh graph FIVE times per frame, once per feature family (defect D10:
face_analyzer.py:49,203,264,303,345); here landmarks are computed ONCE by the
landmark model and every feature below is a cheap vector op over them, fused
into the jitted segment graph and vmapped over frames.

Landmark convention: MediaPipe FaceMesh — 478 points, coordinates normalized
to [0,1] in x/y with z in the same scale, so all reference index constants
(eyes 33/133/362/263, brows 105/334, nose 1/4, mouth 61/291, forehead 10/151)
carry over.

Movement state: the reference mutates a 10-frame Python history but only ever
reads the last two entries (face_analyzer.py:352-383, SURVEY §7 hard parts).
Here previous-frame landmarks are explicit carried state — batched offline
processing shifts the landmark batch by one segment, streaming passes the
previous frame's landmarks in.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from msa_tpu.ops.audio_features import zscore

NUM_LANDMARKS = 478

# Landmark index constants (reference citations inline below).
_MICRO_PAIRS = (
    (10, 151),  # forehead tension (face_analyzer.py:214-218)
    (105, 334),  # brow movement (:221-225)
    (33, 133),  # eye tension (:228-232)
    (1, 4),  # nose movement (:235-239)
    (61, 291),  # mouth tension (:242-246)
)
_TENSION_REGIONS = (
    (10, 151, 9, 8),  # forehead (:314-315)
    (33, 133, 145, 159),  # eyes (:318-319)
    (1, 4, 5, 6),  # nose (:322-323)
    (61, 291, 0, 17),  # mouth (:326-327)
)
_MOVEMENT_IDS = (10, 105, 33, 1, 61, 0)  # (:362-383)
_KEY_POINTS = (33, 133, 362, 263, 61, 291, 199, 1)  # (:418)


def _dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance between landmark rows [..., 3]
    (face_analyzer.py:394-396)."""
    return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1))


def bbox(landmarks: jnp.ndarray, frame_h: int, frame_w: int) -> jnp.ndarray:
    """Face bounding box [x, y, w, h] in pixels, clamped to the frame
    (face_analyzer.py:63-83). Returns float32; callers may round to int."""
    x_min = jnp.min(landmarks[:, 0])
    x_max = jnp.max(landmarks[:, 0])
    y_min = jnp.min(landmarks[:, 1])
    y_max = jnp.max(landmarks[:, 1])
    x = jnp.floor(x_min * frame_w)
    y = jnp.floor(y_min * frame_h)
    w = jnp.floor((x_max - x_min) * frame_w)
    h = jnp.floor((y_max - y_min) * frame_h)
    x = jnp.clip(x, 0, frame_w)
    y = jnp.clip(y, 0, frame_h)
    w = jnp.clip(w, 0, frame_w - x)
    h = jnp.clip(h, 0, frame_h - y)
    return jnp.stack([x, y, w, h]).astype(jnp.float32)


def micro_expressions(landmarks: jnp.ndarray) -> jnp.ndarray:
    """5 z-scored landmark distances (face_analyzer.py:196-255). → [5]."""
    d = jnp.stack([_dist(landmarks[i], landmarks[j]) for i, j in _MICRO_PAIRS])
    return zscore(d)


def gaze(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Gaze direction: mean of per-eye corner-difference vectors, z-scored
    (face_analyzer.py:257-294). → [3]."""
    left = jnp.stack(
        [
            landmarks[33, 0] - landmarks[133, 0],
            landmarks[159, 1] - landmarks[145, 1],
            landmarks[33, 2] - landmarks[133, 2],
        ]
    )
    right = jnp.stack(
        [
            landmarks[362, 0] - landmarks[263, 0],
            landmarks[386, 1] - landmarks[374, 1],
            landmarks[362, 2] - landmarks[263, 2],
        ]
    )
    return zscore((left + right) / 2.0)


def muscle_tension(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Per-region mean consecutive-pair distance, z-scored over the 4 regions
    (face_analyzer.py:296-336, helper :402-412). → [4]."""
    vals = []
    for region in _TENSION_REGIONS:
        pts = landmarks[jnp.asarray(region)]
        d = _dist(pts[:-1], pts[1:])
        vals.append(jnp.mean(d))
    return zscore(jnp.stack(vals))


def movement(
    landmarks: jnp.ndarray, prev_landmarks: jnp.ndarray, has_prev: jnp.ndarray
) -> jnp.ndarray:
    """6 per-landmark deltas vs the previous frame, z-scored
    (face_analyzer.py:338-392); all-zero when there is no history
    (z-score of zeros is zeros under the +1e-6 guard). → [6]."""
    ids = jnp.asarray(_MOVEMENT_IDS)
    d = _dist(landmarks[ids], prev_landmarks[ids])
    d = d * has_prev.astype(d.dtype)
    return zscore(d)


# --- quality metrics (face_analyzer.py:414-474) -------------------------------


def detection_confidence(face_present: jnp.ndarray) -> jnp.ndarray:
    """Fraction of the 8 key landmarks present (face_analyzer.py:414-422).
    With the fixed 478-landmark contract this is 1.0 whenever a face is
    detected, 0.0 otherwise."""
    return face_present.astype(jnp.float32)


def landmark_quality(landmarks: jnp.ndarray) -> jnp.ndarray:
    """1 − min(CV of consecutive-landmark distances, 1)
    (face_analyzer.py:424-438). The reference uses np.std here — biased
    (ddof=0), unlike its torch z-scores."""
    d = _dist(landmarks[:-1], landmarks[1:])
    mean = jnp.mean(d)
    std = jnp.sqrt(jnp.mean(jnp.square(d - mean)))
    cv = std / (mean + 1e-6)
    return 1.0 - jnp.minimum(cv, 1.0)


def expression_quality(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Eye symmetry + mouth-opening quality, averaged
    (face_analyzer.py:440-454)."""
    left_eye = landmarks[33, 1] - landmarks[133, 1]
    right_eye = landmarks[362, 1] - landmarks[263, 1]
    eye_symmetry = 1.0 - jnp.abs(left_eye - right_eye)
    mouth_open = landmarks[61, 1] - landmarks[291, 1]
    mouth_quality = 1.0 - jnp.abs(mouth_open - 0.1)
    return (eye_symmetry + mouth_quality) / 2.0


def movement_quality(
    landmarks: jnp.ndarray, prev_landmarks: jnp.ndarray, has_prev: jnp.ndarray
) -> jnp.ndarray:
    """1 − min(total landmark movement, 1); 0 without history
    (face_analyzer.py:456-474)."""
    total = jnp.sum(_dist(landmarks, prev_landmarks))
    q = 1.0 - jnp.minimum(total, 1.0)
    return q * has_prev.astype(q.dtype)


# --- assembled stack -----------------------------------------------------------


def face_feature_stack(
    landmarks: jnp.ndarray,
    prev_landmarks: jnp.ndarray,
    face_present: jnp.ndarray,
    has_prev: jnp.ndarray,
    frame_h: int,
    frame_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All geometry slots for one frame.

    Returns (geometry[18], position[4], quality[4]):
    - geometry = [micro 5, gaze 3, tension 4, movement 6] — the tail appended
      to the 7 emotion probs before the 27-dim normalizer
      (face_analyzer.py:119-128). When no face is detected every family
      returns its zero default (face_analyzer.py:205-206, :266-267, :305-306,
      :347-348).
    - position = [x, y, w, h] pixels ({0,0,0,0} without a face,
      face_analyzer.py:52).
    - quality = [detection_confidence, landmark_quality, expression_quality,
      movement_quality] (zeros without a face, face_analyzer.py:54-58).
    """
    present = face_present.astype(jnp.float32)
    micro = micro_expressions(landmarks) * present
    gz = gaze(landmarks) * present
    tension = muscle_tension(landmarks) * present
    mov = movement(landmarks, prev_landmarks, has_prev) * present
    geometry = jnp.concatenate([micro, gz, tension, mov])  # [18]
    position = bbox(landmarks, frame_h, frame_w) * present
    quality = jnp.stack(
        [
            detection_confidence(face_present),
            landmark_quality(landmarks) * present,
            expression_quality(landmarks) * present,
            movement_quality(landmarks, prev_landmarks, has_prev) * present,
        ]
    )
    return geometry, position, quality
