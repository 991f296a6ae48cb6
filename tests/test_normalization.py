"""Golden tests for the pad+LayerNorm feature normalizers.

Reference formulas: src/utils/normalization.py:26-44 (pad with zeros /
truncate to target dim, then LayerNorm whose statistics INCLUDE the zero
padding). Golden values computed with an independent numpy implementation
and cross-checked against torch.nn.LayerNorm.
"""

import numpy as np
import pytest

from msa_tpu.ops import normalization as N

from conftest import np_layer_norm


@pytest.mark.parametrize(
    "raw_dim,target_dim,fn",
    [
        (N.FACE_RAW_DIM, N.FACE_TARGET_DIM, N.normalize_face),  # 25 → 27
        (N.AUDIO_RAW_DIM, N.AUDIO_TARGET_DIM, N.normalize_audio),  # 27 → 31
        (N.TEXT_RAW_DIM, N.TEXT_TARGET_DIM, N.normalize_text),  # 779 → 783
    ],
)
def test_pad_then_layernorm_matches_numpy_golden(rng, raw_dim, target_dim, fn):
    x = rng.normal(size=(3, raw_dim)).astype(np.float32)
    padded = np.concatenate(
        [x, np.zeros((3, target_dim - raw_dim), np.float32)], axis=1
    )
    golden = np_layer_norm(padded)
    got = np.asarray(fn(x))
    assert got.shape == (3, target_dim)
    np.testing.assert_allclose(got, golden, atol=1e-5)


def test_truncation_keeps_leading_features(rng):
    x = rng.normal(size=(2, 40)).astype(np.float32)
    got = np.asarray(N.normalize_features(x, 31))
    golden = np_layer_norm(x[:, :31])
    np.testing.assert_allclose(got, golden, atol=1e-5)


def test_exact_dim_passthrough(rng):
    x = rng.normal(size=(2, 27)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(N.normalize_features(x, 27)), np_layer_norm(x), atol=1e-5
    )


def test_matches_torch_layernorm(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(4, N.AUDIO_RAW_DIM)).astype(np.float32)
    got = np.asarray(N.normalize_audio(x))
    ln = torch.nn.LayerNorm(N.AUDIO_TARGET_DIM)
    with torch.no_grad():
        padded = torch.cat(
            [torch.from_numpy(x), torch.zeros(4, N.AUDIO_TARGET_DIM - N.AUDIO_RAW_DIM)],
            dim=1,
        )
        want = ln(padded).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zero_input_is_finite():
    x = np.zeros((1, N.FACE_RAW_DIM), np.float32)
    out = np.asarray(N.normalize_face(x))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
