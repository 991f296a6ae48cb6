"""Equivalence tests for the experimental Pallas pair-matmul strided conv.

The kernel is a recorded NEGATIVE result for performance (BASELINE.md #4) but
stays correctness-tested: same weight layout as ``nn.Conv`` (kernel
[k, C_in, C_out]), VALID stride-2 semantics matching
``jax.lax.conv_general_dilated`` — the op the wav2vec2 extractor's stride-2
layers (reference capability: /root/reference/src/analyzers/audio_analyzer.py
feature extractor) actually run in production via XLA.

Runs in Pallas interpret mode on the CPU mesh (tests/conftest.py forces CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msa_tpu.ops.pallas.conv import conv_stride2_fused, conv_stride2_reference


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("length", [1023, 1999, 2048])
@pytest.mark.parametrize("gelu", [True, False])
def test_conv_stride2_matches_xla(k, length, gelu):
    rng = np.random.default_rng(k * 10_000 + length)
    x = jnp.asarray(
        rng.standard_normal((2, length, 128), dtype=np.float32), jnp.float32
    )
    w = jnp.asarray(
        0.05 * rng.standard_normal((k, 128, 128), dtype=np.float32), jnp.float32
    )
    got = conv_stride2_fused(x, w, apply_gelu=gelu, block_l=256, interpret=True)
    want = conv_stride2_reference(x, w, apply_gelu=gelu)
    assert got.shape == want.shape == (2, (length - k) // 2 + 1, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_conv_stride2_bf16_tolerance():
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.standard_normal((1, 999, 128), dtype=np.float32), jnp.bfloat16
    )
    w = jnp.asarray(0.05 * rng.standard_normal((3, 128, 128), dtype=np.float32))
    got = np.asarray(
        conv_stride2_fused(x, w, block_l=128, interpret=True), np.float32
    )
    want = np.asarray(conv_stride2_reference(x, w), np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel  # bf16 accumulation noise only
