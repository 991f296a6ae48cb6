"""Feature normalizers: pad/truncate to a fixed target dim + LayerNorm.

TPU-first rewrite of the reference normalizers (reference
``src/utils/normalization.py:7-97``). The reference wraps ``nn.LayerNorm``
modules whose affine params are created fresh per run and never trained, so the
effective math is a plain parameter-free LayerNorm over the padded vector —
including the zero padding in the statistics (normalization.py:36-44). That
exact behavior is reproduced here as pure jnp functions with static shapes,
so they inline into the jitted segment graph.

Target dims (normalization.py:24, :51, :78):
  - audio:  8 + 1 + 1 + 13 + 1 + 3 + 4  = 31
  - face:   7 + 5 + 3 + 4 + 4 + 4       = 27
  - text:   7 + 1 + 1 + 1 + 1 + 768 + 4 = 783
"""

from __future__ import annotations

import jax.numpy as jnp

# torch.nn.LayerNorm default epsilon — required for 1e-3 numerics parity.
LN_EPS = 1e-5

AUDIO_TARGET_DIM = 8 + 1 + 1 + 13 + 1 + 3 + 4  # 31
FACE_TARGET_DIM = 7 + 5 + 3 + 4 + 4 + 4  # 27
TEXT_TARGET_DIM = 7 + 1 + 1 + 1 + 1 + 768 + 4  # 783

# Raw (pre-pad) concat widths produced by the analyzers before normalization:
# face emo7+micro5+gaze3+tension4+movement6 (face_analyzer.py:119-125),
# audio emo8+pitch1+intensity1+timbre13+rate1+rhythm3 (audio_analyzer.py:113-120),
# text emo7+sarcasm1+humor1+polarity1+intensity1+emb768 (text_analyzer.py:100-107).
FACE_RAW_DIM = 7 + 5 + 3 + 4 + 6  # 25 → padded to 27
AUDIO_RAW_DIM = 8 + 1 + 1 + 13 + 1 + 3  # 27 → padded to 31
TEXT_RAW_DIM = 7 + 1 + 1 + 1 + 1 + 768  # 779 → padded to 783


def layer_norm(x: jnp.ndarray, eps: float = LN_EPS) -> jnp.ndarray:
    """Parameter-free LayerNorm over the last axis, torch semantics
    (biased variance, eps inside the sqrt). Computed in float32."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def pad_or_truncate(x: jnp.ndarray, target_dim: int) -> jnp.ndarray:
    """Zero-pad or truncate the last axis to ``target_dim`` (static shapes;
    mirrors normalization.py:36-42)."""
    d = x.shape[-1]
    if d == target_dim:
        return x
    if d < target_dim:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, target_dim - d)]
        return jnp.pad(x, pad)
    return x[..., :target_dim]


def normalize_features(x: jnp.ndarray, target_dim: int) -> jnp.ndarray:
    """pad/truncate then LayerNorm — the full reference normalizer path
    (normalization.py:26-44). The zero padding participates in the LN
    statistics, exactly as in the reference."""
    return layer_norm(pad_or_truncate(x, target_dim))


def normalize_audio(x: jnp.ndarray) -> jnp.ndarray:
    return normalize_features(x, AUDIO_TARGET_DIM)


def normalize_face(x: jnp.ndarray) -> jnp.ndarray:
    return normalize_features(x, FACE_TARGET_DIM)


def normalize_text(x: jnp.ndarray) -> jnp.ndarray:
    return normalize_features(x, TEXT_TARGET_DIM)
