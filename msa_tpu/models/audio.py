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
- the default architecture is wav2vec2-base-compatible (grouped conv
  positional embedding, instance-norm extractor, post-LN encoder):
  :func:`params_from_hf_wav2vec2` imports pretrained trunks bit-compatibly
  (equivalence-tested against transformers.Wav2Vec2Model).
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
    # "conv" = wav2vec2's grouped conv positional embedding (kernel 128,
    # 16 groups, weight import compatible); "sinusoidal" = fixed table
    positional: str = "conv"
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # "conv" = lax convolutions (XLA's TPU conv runs the stride-2 layers at
    # ~70 TFLOPS); "matmul" = same math as explicit MXU matmuls on a
    # pair-reshaped input (~170 TFLOPS on the same shapes) — requires every
    # layer after the first to have kernel ∈ {2, 3} and stride 2 (the
    # wav2vec2-base recipe). Identical params and outputs either way.
    extractor_impl: str = "conv"
    # trained 4-class emotion head asset (training.train_audio_emotion,
    # prosody-supervised over the default deterministic trunk — the repo
    # ships one, same pattern as the face checkpoints; resolved via
    # utils.assets, skipped with a warning when absent/mismatched). Only
    # applied to default-initialized trunks: an IMPORTED trunk produces
    # different pooled features, so the shipped head wouldn't be meaningful.
    head_weights: "str | None" = "checkpoints/audio_emotion_head.msgpack"
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)

    @classmethod
    def tiny(cls) -> "AudioModelConfig":
        # head_weights=None: the shipped full-size head must not load into
        # the tiny trunk (shape mismatch)
        return cls(
            conv_channels=(8, 8),
            conv_kernels=(10, 8),
            conv_strides=(5, 4),
            pool_hidden=8,
            positional="sinusoidal",
            head_weights=None,
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


def _strided_conv_as_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """VALID stride-2 conv1d (kernel 2 or 3) as MXU matmuls.

    x: [B, L, C_in]; w: [k, C_in, C_out] (nn.Conv's kernel layout). The input
    reshapes to non-overlapping PAIRS [B, L//2, 2·C_in] — a free bitcast —
    so taps 0 and 1 become ONE full-width matmul against the stacked
    [2·C_in, C_out] weight; kernel-3's third tap multiplies the next pair's
    first half. XLA's own TPU conv runs these layers at ~70 TFLOPS; this
    form reaches the plain-matmul rate (~170 measured on the same shapes)."""
    k, cin, cout = w.shape
    b, length, _ = x.shape
    out_len = (length - k) // 2 + 1
    w01 = w[:2].reshape(2 * cin, cout)  # [2C, C'] — taps 0,1 stacked
    # pad x so pair rows 0..out_len exist even for odd L (padded rows only
    # ever multiply into discarded outputs / the zero tail of kernel-3)
    need = 2 * (out_len + 1)
    if need > length:
        x = jnp.pad(x, [(0, 0), (0, need - length), (0, 0)])
    pairs = x[:, : 2 * (out_len + 1)].reshape(b, out_len + 1, 2 * cin)
    out = jax.lax.dot_general(
        pairs[:, :out_len], w01, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if k == 3:
        out = out + jax.lax.dot_general(
            pairs[:, 1 : out_len + 1, :cin], w[2], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out.astype(x.dtype)


class _ConvKernelParams(nn.Module):
    """Declares an nn.Conv-compatible kernel param ([k, in, out], lecun
    normal over fan_in = k·in, no bias) without running the conv, so the
    matmul formulation consumes the identical param tree."""

    shape: Tuple[int, int, int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class ConvFeatureExtractor(nn.Module):
    cfg: AudioModelConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] → [B, T', C]; GroupNorm after the first conv, GELU after
        each (wav2vec2 convention). Convs run in the encoder compute dtype
        (bf16 in production — they are ~1.6 TFLOP per 64-segment batch and
        MXU-bound); GroupNorm stays f32. With ``extractor_impl="matmul"``
        the stride-2 layers run as pair-reshaped matmuls (same params,
        same outputs, ~2× faster on TPU — see _strided_conv_as_matmul)."""
        dtype = jnp.dtype(self.cfg.encoder.compute_dtype)
        x = wav[..., None].astype(dtype)  # [B, T, 1]
        c = self.cfg
        for i, (ch, k, s) in enumerate(
            zip(c.conv_channels, c.conv_kernels, c.conv_strides)
        ):
            # NOTE: an int8 (W8A8) conv path was measured and REJECTED here:
            # the raw int8 conv is 1.47× faster than bf16 at these shapes,
            # but per-tensor activation quant breaks the GN/GELU→conv
            # epilogue fusion and adds passes over the (huge) early
            # activations — net extractor time was unchanged (BASELINE.md).
            # The encoders' matmul kernels keep int8 (EncoderConfig.quantize);
            # the extractor stays bf16 conv.
            as_matmul = c.extractor_impl == "matmul" and i > 0 and s == 2 and k in (2, 3)
            if as_matmul:
                # declares the SAME conv_{i}/kernel param path (and default
                # init) as nn.Conv, so checkpoints/HF import are unchanged
                w = _ConvKernelParams((k, x.shape[-1], ch), name=f"conv_{i}")()
                x = _strided_conv_as_matmul(x, w.astype(dtype))
            else:
                x = nn.Conv(
                    ch,
                    (k,),
                    strides=(s,),
                    padding="VALID",
                    use_bias=False,  # wav2vec2 extractor convs have no bias
                    dtype=dtype,
                    name=f"conv_{i}",
                )(x)
            if i == 0:
                # wav2vec2 uses GroupNorm with num_groups == channels
                # (per-channel instance norm)
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, use_fast_variance=False, name="gn")(
                    x.astype(jnp.float32)
                ).astype(dtype)
            x = nn.gelu(x, approximate=False)
        return x


class ConvPositionalEmbedding(nn.Module):
    """wav2vec2's grouped convolutional positional embedding: Conv1d over
    time (kernel 128, 16 groups, SAME-ish padding trimmed by one) + GELU,
    added to the hidden states."""

    d_model: int
    kernel: int = 128
    groups: int = 16
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2
        h = nn.Conv(
            self.d_model,
            (self.kernel,),
            padding=[(pad, pad)],
            feature_group_count=self.groups,
            dtype=jnp.dtype(self.compute_dtype),
            name="conv",
        )(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1, :]  # torch pad=k/2 with even k → one extra frame
        return nn.gelu(h, approximate=False)


class AudioEmotionModel(nn.Module):
    cfg: AudioModelConfig

    @nn.compact
    def __call__(
        self, wav: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(wav)
        feats = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="post_extract_ln")(feats)
        x = nn.Dense(c.encoder.d_model, name="proj")(feats)
        if c.positional == "conv":
            # wav2vec2 encoder prologue: x += pos_conv(x); LayerNorm
            x = x + ConvPositionalEmbedding(
                c.encoder.d_model,
                c.pos_conv_kernel,
                c.pos_conv_groups,
                c.encoder.compute_dtype,
                name="pos_conv",
            )(x)
            x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="encoder_pre_ln")(x.astype(jnp.float32))
        else:
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
            "pooled": pooled,  # [B, 2·d_model] attentive stats (head input)
            "logits": logits,
            "probs4": probs4,
            # 8-dim contract (D7): duplicated + renormalized
            "emotion_probs": duplicate_4_to_8(probs4),
        }


def _init_host(model: AudioEmotionModel, seed: int, samples: int) -> Any:
    wav = jnp.zeros((1, samples), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), wav)["params"]


def init_params(model: AudioEmotionModel, seed: int = 0, samples: int = 8000) -> Any:
    """Init on the host CPU backend, then ONE transfer to the accelerator —
    eager flax init over the axon tunnel measured 70 s for this trunk
    (see msa_tpu.utils.host_init)."""
    from msa_tpu.utils.host_init import host_init

    return host_init(_init_host, model, seed, samples)


# --- HF weight import ---------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Reconstruct torch weight-norm: w = g · v/‖v‖, norm over the axes where
    g is singleton (wav2vec2 uses dim=2)."""
    axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / norm


def params_from_hf_wav2vec2(state_dict, cfg: AudioModelConfig):
    """Convert a ``transformers`` Wav2Vec2Model state dict into this
    encoder's trunk params (extractor + projection + conv positional
    embedding + transformer). Pooling/classifier heads are task-specific and
    stay randomly initialized, exactly like the reference's SpeechBrain
    classifier head over a pretrained wav2vec2 trunk
    (audio_analyzer.py:33-39)."""
    sd = state_dict
    p = {"feature_extractor": {}, "encoder": {}}
    for i in range(len(cfg.conv_channels)):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        # torch conv1d [out, in, k] → flax [k, in, out]
        p["feature_extractor"][f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
    p["feature_extractor"]["gn"] = {
        "scale": _t(sd["feature_extractor.conv_layers.0.layer_norm.weight"]),
        "bias": _t(sd["feature_extractor.conv_layers.0.layer_norm.bias"]),
    }
    p["post_extract_ln"] = {
        "scale": _t(sd["feature_projection.layer_norm.weight"]),
        "bias": _t(sd["feature_projection.layer_norm.bias"]),
    }
    p["proj"] = {
        "kernel": _t(sd["feature_projection.projection.weight"]).T,
        "bias": _t(sd["feature_projection.projection.bias"]),
    }
    # conv positional embedding (weight-normed in torch)
    pc = "encoder.pos_conv_embed.conv."
    if pc + "weight_g" in sd:
        w = _weight_norm(_t(sd[pc + "weight_g"]), _t(sd[pc + "weight_v"]))
    elif pc + "parametrizations.weight.original0" in sd:
        w = _weight_norm(
            _t(sd[pc + "parametrizations.weight.original0"]),
            _t(sd[pc + "parametrizations.weight.original1"]),
        )
    else:
        w = _t(sd[pc + "weight"])
    p["pos_conv"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd[pc + "bias"])}
    }
    p["encoder_pre_ln"] = {
        "scale": _t(sd["encoder.layer_norm.weight"]),
        "bias": _t(sd["encoder.layer_norm.bias"]),
    }
    for i in range(cfg.encoder.num_layers):
        hf = f"encoder.layers.{i}."
        p["encoder"][f"layer_{i}"] = {
            "attention": {
                # q/k/v concatenated into the trunk's fused [d, 3d] projection
                "qkv": {
                    "kernel": np.concatenate(
                        [
                            _t(sd[hf + f"attention.{n}_proj.weight"]).T
                            for n in ("q", "k", "v")
                        ],
                        axis=1,
                    ),
                    "bias": np.concatenate(
                        [
                            _t(sd[hf + f"attention.{n}_proj.bias"])
                            for n in ("q", "k", "v")
                        ]
                    ),
                },
                "attn_out": {
                    "kernel": _t(sd[hf + "attention.out_proj.weight"]).T,
                    "bias": _t(sd[hf + "attention.out_proj.bias"]),
                },
            },
            "attn_ln": {
                "scale": _t(sd[hf + "layer_norm.weight"]),
                "bias": _t(sd[hf + "layer_norm.bias"]),
            },
            "fc_in": {
                "kernel": _t(sd[hf + "feed_forward.intermediate_dense.weight"]).T,
                "bias": _t(sd[hf + "feed_forward.intermediate_dense.bias"]),
            },
            "fc_out": {
                "kernel": _t(sd[hf + "feed_forward.output_dense.weight"]).T,
                "bias": _t(sd[hf + "feed_forward.output_dense.bias"]),
            },
            "ffn_ln": {
                "scale": _t(sd[hf + "final_layer_norm.weight"]),
                "bias": _t(sd[hf + "final_layer_norm.bias"]),
            },
        }
    return p
