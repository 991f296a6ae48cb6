"""Shared transformer encoder building blocks (Flax).

One encoder implementation backs both the text trunk (BERT-style, replacing
the reference's five HF BERT instances — reference
``src/analyzers/text_analyzer.py:28-60``) and the audio emotion encoder
(wav2vec2-style, replacing SpeechBrain — ``src/analyzers/audio_analyzer.py:
33-39``).

TPU-first choices:
- matmuls run in a configurable ``compute_dtype`` (bfloat16 by default on
  TPU) with float32 params and float32 LayerNorm/softmax — the standard
  mixed-precision recipe for the MXU.
- attention projection layers are named ``qkv/attn_out`` (Q/K/V fused into
  one [d, 3d] matmul — one MXU launch instead of three) and the
  MLP layers ``fc_in/fc_out`` so :func:`msa_tpu.parallel.mesh.encoder_param_spec`
  can apply Megatron-style tensor-parallel PartitionSpecs by name.
- static shapes everywhere; padding is handled by an additive attention mask.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from msa_tpu.utils.host_init import execution_platform as _execution_platform
import numpy as np


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    num_layers: int = 12
    d_model: int = 768
    num_heads: int = 12
    d_ff: int = 3072
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12  # BERT default
    compute_dtype: str = "float32"
    # "einsum" = plain XLA path (training-capable, attn-probs dropout);
    # "pallas" = fused VMEM attention kernel (inference hot path on TPU,
    # interpret-mode on CPU). See msa_tpu.ops.pallas.attention.
    attention_impl: str = "einsum"
    # "dense" = two nn.Dense matmuls (hidden tensor round-trips HBM);
    # "pallas" = fused fc_in→GELU→fc_out kernel with weights resident in
    # VMEM (inference only; training always takes the dense path). Same
    # param paths either way. See msa_tpu.ops.pallas.ffn.
    ffn_impl: str = "dense"
    # rematerialize each layer in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(layers) → O(1) activation memory when
    # training the encoders at scale
    remat: bool = False
    # "none" | "int8": W8A8 serving mode for the fused kernels — int8×int8
    # MXU dots (~1.8× the bf16 rate on v5e, measured) with per-output-channel
    # weight scales (computed on the fly from the ordinary f32 params) and
    # per-row dynamic activation scales. Inference-only, like the fused
    # kernels themselves; training and the einsum/dense paths ignore it.
    # Accuracy: median ~1% relative error on encoder outputs vs the f32
    # path (tests/test_pallas_*); attention's own score/PV dots stay bf16.
    quantize: str = "none"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @classmethod
    def tiny(cls) -> "EncoderConfig":
        """Small config for tests — same code path, fast compile."""
        return cls(num_layers=2, d_model=32, num_heads=2, d_ff=64)


def _dt(cfg: EncoderConfig):
    return jnp.dtype(cfg.compute_dtype)


class SelfAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, deterministic: bool = True):
        cfg = self.cfg
        dtype = _dt(cfg)
        b, t, _ = x.shape

        if (
            cfg.attention_impl == "pallas"
            and deterministic  # inference-only (not differentiable)
            and cfg.d_model % 128 == 0
        ):
            import jax

            from msa_tpu.ops.pallas.attention import (
                _SINGLE_PASS_MAX_T,
                attention_block,
            )

            if t <= _SINGLE_PASS_MAX_T:
                # ONE kernel for the whole block: fused QKV projection →
                # per-head attention → output projection. Same "qkv"/
                # "attn_out" param paths (DenseParams) as the dense path, so
                # HF import / TP rules / checkpoints are unchanged.
                wqkv, bqkv = DenseParams(cfg.d_model, 3 * cfg.d_model, name="qkv")()
                wout, bout = DenseParams(cfg.d_model, cfg.d_model, name="attn_out")()
                key_mask = (mask_bias[:, 0, 0, :] >= -0.5).astype(jnp.float32)
                interpret = _execution_platform() != "tpu"
                return attention_block(
                    x.astype(dtype),
                    wqkv,
                    bqkv,
                    wout,
                    bout,
                    key_mask,
                    cfg.num_heads,
                    interpret,
                    int8=cfg.quantize == "int8",
                )

        # Q, K, V as ONE [d, 3d] matmul: one MXU launch instead of three
        # (identical math and init distribution — lecun_normal depends only on
        # fan_in; HF q/k/v weights are concatenated by the import converters).
        # Sharding: "qkv" is column-parallel in parallel.mesh.encoder_param_spec.
        qkv = nn.Dense(3 * cfg.d_model, dtype=dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.d_model, dtype=dtype, name=name
        )

        if cfg.attention_impl == "pallas" and (deterministic or cfg.dropout == 0.0):
            # fused VMEM attention kernels with a flash-style Pallas backward
            # (msa_tpu.ops.pallas.attention) — differentiable, so training
            # uses them too unless attn-probs dropout is on (einsum path)
            import jax

            from msa_tpu.ops.pallas.attention import (
                _SINGLE_PASS_MAX_T,
                attention_with_vjp,
                packed_qkv_attention,
            )

            key_mask = (mask_bias[:, 0, 0, :] >= -0.5).astype(jnp.float32)
            interpret = _execution_platform() != "tpu"
            if t <= _SINGLE_PASS_MAX_T:
                # packed-layout kernel: consumes the [b, t, 3, h, dh] QKV
                # projection output directly (only K is re-laid-out in HBM)
                # and emits [b, t, d_model] ready for attn_out
                out = packed_qkv_attention(qkv, key_mask, interpret)
            else:  # blockwise online-softmax kernel for long sequences
                out = attention_with_vjp(
                    q.transpose(0, 2, 1, 3),
                    k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3),
                    key_mask,
                    interpret,
                ).transpose(0, 2, 1, 3)
            out = out.reshape(b, t, cfg.d_model).astype(dtype)
            return dense("attn_out")(out)

        scale = 1.0 / np.sqrt(cfg.head_dim)
        # [b, h, t, t] — softmax in f32 for stability
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        logits = logits + mask_bias  # [b, 1, 1, t] additive bias
        probs = nn.softmax(logits, axis=-1).astype(dtype)
        probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, cfg.d_model)
        return dense("attn_out")(out)


class DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel [in, out], bias [out])
    WITHOUT running the matmul, so a fused kernel can consume them while HF
    import, tensor-parallel rules and checkpoints see the usual
    ``fc_in``/``fc_out`` paths. Initializers match nn.Dense defaults."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features_out,))
        return k, b


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (BERT convention)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask_bias, deterministic: bool = True):
        cfg = self.cfg
        dtype = _dt(cfg)
        attn = SelfAttention(cfg, name="attention")(x, mask_bias, deterministic)
        attn = nn.Dropout(cfg.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(
            (x + attn).astype(jnp.float32)
        ).astype(dtype)
        if (
            cfg.ffn_impl == "pallas"
            and deterministic  # training takes the autodiff-able dense path
            and cfg.d_model % 128 == 0
            and cfg.d_ff % 128 == 0
        ):
            import jax

            from msa_tpu.ops.pallas.ffn import ffn_fused, ffn_fused_int8

            w1, b1 = DenseParams(cfg.d_model, cfg.d_ff, name="fc_in")()
            w2, b2 = DenseParams(cfg.d_ff, cfg.d_model, name="fc_out")()
            interpret = _execution_platform() != "tpu"
            b_, t_, _ = x.shape
            if cfg.quantize == "int8":
                h = ffn_fused_int8(
                    x.reshape(b_ * t_, cfg.d_model),
                    w1,
                    b1,
                    w2,
                    b2,
                    interpret=interpret,
                ).reshape(b_, t_, cfg.d_model)
            else:
                h = ffn_fused(
                    x.reshape(b_ * t_, cfg.d_model),
                    w1.astype(dtype),
                    b1.astype(dtype),
                    w2.astype(dtype),
                    b2.astype(dtype),
                    interpret=interpret,
                ).reshape(b_, t_, cfg.d_model)
        else:
            h = nn.Dense(cfg.d_ff, dtype=dtype, name="fc_in")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.d_model, dtype=dtype, name="fc_out")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(
            (x + h).astype(jnp.float32)
        ).astype(dtype)


class TransformerEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        """x: [b, t, d_model]; attention_mask: [b, t] with 1 = attend."""
        if attention_mask is None:
            mask_bias = jnp.zeros((x.shape[0], 1, 1, x.shape[1]), jnp.float32)
        else:
            mask_bias = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, -1e9
            ).astype(jnp.float32)
        layer_cls = (
            # static_argnums counts self: (self, x, mask_bias, deterministic)
            nn.remat(EncoderLayer, static_argnums=(3,))
            if self.cfg.remat
            else EncoderLayer
        )
        for i in range(self.cfg.num_layers):
            x = layer_cls(self.cfg, name=f"layer_{i}")(
                x, mask_bias, deterministic
            )
        return x


def mean_pool(x: jnp.ndarray, attention_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Masked mean over time: [b, t, d] → [b, d]."""
    if attention_mask is None:
        return jnp.mean(x, axis=1)
    m = attention_mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class AttentiveStatsPool(nn.Module):
    """Attentive statistics pooling (mean + std weighted by a learned
    attention) — the pooling family SpeechBrain's emotion classifier uses.
    [b, t, d] → [b, 2d]."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x, attention_mask=None):
        scores = nn.Dense(1, name="attn_score")(
            nn.tanh(nn.Dense(self.hidden, name="attn_hidden")(x))
        )  # [b, t, 1]
        if attention_mask is not None:
            scores = jnp.where(attention_mask[..., None] > 0, scores, -1e9)
        w = nn.softmax(scores.astype(jnp.float32), axis=1).astype(x.dtype)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * jnp.square(x - mean[:, None, :]), axis=1)
        std = jnp.sqrt(jnp.clip(var, 1e-6))
        return jnp.concatenate([mean, std], axis=-1)
