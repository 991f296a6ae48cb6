"""Face models — landmark regressor + emotion CNN + in-graph crop, Flax.

Replaces the reference's MediaPipe FaceMesh C++ graph and DeepFace TF/Keras
emotion CNN (reference ``src/analyzers/face_analyzer.py:26-32``, ``:148-194``)
with two Flax convnets that live inside the jitted segment graph:

- :class:`FaceLandmarkNet`: [B, 192, 192, 3] frame → 478 landmarks in
  MediaPipe's normalized-coordinate convention + a face-presence score
  (reference FaceMesh settings: max 1 face, min confidence 0.5,
  face_analyzer.py:27-32 — the single-face cap is kept).
- :class:`FaceEmotionCNN`: [B, 48, 48, 1] grayscale crop → 7 emotion probs in
  the DeepFace dict order (angry, disgust, fear, happy, sad, surprise,
  neutral — face_analyzer.py:164-172), renormalized to sum 1 like the
  reference (:182-185).
- :func:`bilinear_crop_resize`: fixed-output-shape differentiable crop of the
  landmark bbox — the TPU-native replacement for DeepFace's host-side OpenCV
  detect+crop+align (detector_backend='opencv', align=True, :151-157). A
  traced bbox selects the region; the output is always 48×48 so one compiled
  graph covers every frame.

D10 fixed by construction: landmarks are computed ONCE per frame; the five
feature families (SURVEY §2.11) are derived from them in
:mod:`msa_tpu.ops.face_features`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FaceModelConfig:
    landmark_count: int = 478
    frame_size: int = 192
    crop_size: int = 48
    backbone_channels: Tuple[int, ...] = (16, 32, 64, 128, 128)
    cnn_channels: Tuple[int, ...] = (32, 64, 128)
    min_detection_confidence: float = 0.5  # face_analyzer.py:30

    @classmethod
    def tiny(cls) -> "FaceModelConfig":
        return cls(backbone_channels=(4, 8), cnn_channels=(4, 8), frame_size=32)


def rgb_to_gray(frame: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luminance, [..., 3] → [..., 1]."""
    w = jnp.asarray([0.299, 0.587, 0.114], frame.dtype)
    return jnp.sum(frame * w, axis=-1, keepdims=True)


def bilinear_crop_resize(
    image: jnp.ndarray, bbox: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Crop ``bbox`` = [x, y, w, h] (pixels, traced values) from [H, W, C] and
    resize to [out_size, out_size, C] with bilinear sampling. Degenerate boxes
    (w or h ≤ 1) fall back to the full frame, mirroring DeepFace's
    enforce_detection=False whole-frame behavior (face_analyzer.py:154)."""
    h, w = image.shape[0], image.shape[1]
    x0, y0, bw, bh = bbox[0], bbox[1], bbox[2], bbox[3]
    ok = jnp.logical_and(bw > 1.0, bh > 1.0)
    x0 = jnp.where(ok, x0, 0.0)
    y0 = jnp.where(ok, y0, 0.0)
    bw = jnp.where(ok, bw, float(w))
    bh = jnp.where(ok, bh, float(h))
    # sample centers: src = origin + (i + 0.5) * extent/out − 0.5
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = y0 + grid * bh - 0.5
    xs = x0 + grid * bw - 0.5
    y_lo = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x_lo = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, h - 1)
    x_hi = jnp.minimum(x_lo + 1, w - 1)
    wy = jnp.clip(ys - y_lo.astype(jnp.float32), 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x_lo.astype(jnp.float32), 0.0, 1.0)[None, :, None]
    img = image.astype(jnp.float32)
    tl = img[y_lo][:, x_lo]
    tr = img[y_lo][:, x_hi]
    bl = img[y_hi][:, x_lo]
    br = img[y_hi][:, x_hi]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


class FaceLandmarkNet(nn.Module):
    cfg: FaceModelConfig

    @nn.compact
    def __call__(self, frame: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """frame: [B, S, S, 3] float32 in [0, 1] →
        landmarks [B, 478, 3] (x, y ∈ [0,1]; z small, centered) +
        presence score [B]."""
        c = self.cfg
        x = frame
        for i, ch in enumerate(c.backbone_channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(ch, 8), name=f"gn_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = jnp.mean(x, axis=(1, 2))  # [B, C]
        x = nn.gelu(nn.Dense(256, name="fc")(x), approximate=False)
        raw = nn.Dense(c.landmark_count * 3, name="landmark_head")(x)
        raw = raw.reshape(-1, c.landmark_count, 3)
        xy = nn.sigmoid(raw[..., :2])
        z = 0.1 * nn.tanh(raw[..., 2:])
        presence = nn.sigmoid(nn.Dense(1, name="presence_head")(x)[..., 0])
        return {
            "landmarks": jnp.concatenate([xy, z], axis=-1),
            "presence": presence,
        }


class FaceEmotionCNN(nn.Module):
    """7-way emotion classifier over 48×48 grayscale crops — the DeepFace
    emotion-CNN capability (face_analyzer.py:151-157), DeepFace label order
    preserved (adapters in msa_tpu.core.emotions handle reordering)."""

    cfg: FaceModelConfig

    @nn.compact
    def __call__(self, crop: jnp.ndarray) -> jnp.ndarray:
        """crop: [B, 48, 48, 1] float32 in [0, 1] → probs [B, 7]."""
        x = crop
        for i, ch in enumerate(self.cfg.cnn_channels):
            x = nn.Conv(ch, (3, 3), name=f"conv_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.gelu(nn.Dense(128, name="fc")(x), approximate=False)
        logits = nn.Dense(7, name="emotion_head")(x)
        probs = nn.softmax(logits, axis=-1)
        # renormalize-to-sum-1 contract (face_analyzer.py:182-185); softmax
        # already sums to 1, kept explicit for the degenerate all-zero guard
        return probs / jnp.sum(probs, axis=-1, keepdims=True)


def init_landmark_params(model: FaceLandmarkNet, seed: int = 0) -> Any:
    s = model.cfg.frame_size
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3)))["params"]


def init_emotion_params(model: FaceEmotionCNN, seed: int = 0) -> Any:
    s = model.cfg.crop_size
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 1)))["params"]
