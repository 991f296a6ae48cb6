"""Audio emotion encoder — wav2vec2-style, Flax.

Replaces the reference's SpeechBrain ``CustomEncoderWav2vec2Classifier``
(reference ``src/analyzers/audio_analyzer.py:33-39``, ``:152-173``): a conv
waveform feature extractor, a transformer encoder, attentive statistics
pooling, and a 4-class IEMOCAP emotion head whose probabilities are duplicated
to the 8-dim contract (defect D7 kept: AudioAnalysis.emotion_probs is 8-dim
and the fusion audio_dim depends on it — audio_analyzer.py:162-168).

TPU-first notes:
- raw [B, 80_000] waveforms (5 s @ 16 kHz, static) are striding-conv
  downsampled ×320 → 250 frames; everything stays on-device, no host DSP.
- the transformer reuses :mod:`msa_tpu.models.transformer` so the tensor-
  parallel PartitionSpec rules apply unchanged.
- positional information uses a fixed sinusoidal table (the original conv
  positional embedding is an architectural detail, not a capability; a
  pretrained-weight import would add it alongside).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.core.emotions import duplicate_4_to_8
from msa_tpu.models.transformer import (
    AttentiveStatsPool,
    EncoderConfig,
    TransformerEncoder,
)


@dataclasses.dataclass(frozen=True)
class AudioModelConfig:
    # wav2vec2-base conv extractor: 512 channels, ×320 total downsample
    conv_channels: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_classes: int = 4  # IEMOCAP (neutral/angry/happy/sad)
    pool_hidden: int = 128
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)

    @classmethod
    def tiny(cls) -> "AudioModelConfig":
        return cls(
            conv_channels=(8, 8),
            conv_kernels=(10, 8),
            conv_strides=(5, 4),
            pool_hidden=8,
            encoder=EncoderConfig.tiny(),
        )

    def downsample_factor(self) -> int:
        f = 1
        for s in self.conv_strides:
            f *= s
        return f


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    pos = np.arange(t)[:, None]
    dim = np.arange(d // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * dim / d)
    out = np.zeros((t, d), np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out


class ConvFeatureExtractor(nn.Module):
    cfg: AudioModelConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] → [B, T', C]; GroupNorm after the first conv, GELU after
        each (wav2vec2 convention). Convs run in the encoder compute dtype
        (bf16 in production — they are ~1.6 TFLOP per 64-segment batch and
        MXU-bound); GroupNorm stays f32."""
        dtype = jnp.dtype(self.cfg.encoder.compute_dtype)
        x = wav[..., None].astype(dtype)  # [B, T, 1]
        c = self.cfg
        for i, (ch, k, s) in enumerate(
            zip(c.conv_channels, c.conv_kernels, c.conv_strides)
        ):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", dtype=dtype, name=f"conv_{i}"
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=min(ch, 8), name="gn")(
                    x.astype(jnp.float32)
                ).astype(dtype)
            x = nn.gelu(x, approximate=False)
        return x


class AudioEmotionModel(nn.Module):
    cfg: AudioModelConfig

    @nn.compact
    def __call__(
        self, wav: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(wav)
        feats = nn.LayerNorm(name="post_extract_ln")(feats)
        x = nn.Dense(c.encoder.d_model, name="proj")(feats)
        pos = jnp.asarray(sinusoidal_positions(x.shape[1], c.encoder.d_model))
        x = x + pos[None]
        hidden = TransformerEncoder(c.encoder, name="encoder")(
            x, None, deterministic
        )
        pooled = AttentiveStatsPool(c.pool_hidden, name="pool")(hidden)
        logits = nn.Dense(c.num_classes, name="emotion_head")(
            pooled.astype(jnp.float32)
        )
        probs4 = nn.softmax(logits, axis=-1)
        return {
            "hidden": hidden,
            "logits": logits,
            "probs4": probs4,
            # 8-dim contract (D7): duplicated + renormalized
            "emotion_probs": duplicate_4_to_8(probs4),
        }


def init_params(model: AudioEmotionModel, seed: int = 0, samples: int = 8000) -> Any:
    wav = jnp.zeros((1, samples), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), wav)["params"]
