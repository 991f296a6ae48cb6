"""Golden tests for the audio DSP feature ops.

Reference formulas: src/analyzers/audio_analyzer.py (citations per test).
Goldens are independent numpy/scipy implementations written from the
reference formulas, not from msa_tpu's code.
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from msa_tpu.ops import audio_features as A

SR = 16_000


@pytest.fixture(scope="module")
def speech_like():
    """1 s synthetic 'speech': AM tone + noise bursts."""
    rng = np.random.default_rng(7)
    t = np.arange(SR) / SR
    x = 0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    x += 0.05 * rng.normal(size=SR)
    return x.astype(np.float32)


def test_frame_signal_matches_stride_trick(speech_like):
    got = np.asarray(A.frame_signal(speech_like, 400, 160))
    n = 1 + (SR - 400) // 160
    want = np.stack([speech_like[i * 160 : i * 160 + 400] for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_power_spectrogram_matches_scipy(speech_like):
    got = np.asarray(A.power_spectrogram(speech_like, n_fft=400, hop=200))
    # independent golden: reflect-pad + hann (periodic) + rfft, power
    pad = 200
    xp = np.pad(speech_like, pad, mode="reflect")
    win = np.hanning(401)[:-1]
    frames = np.stack(
        [xp[i * 200 : i * 200 + 400] * win for i in range(1 + (len(xp) - 400) // 200)]
    )
    want = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [frames, freq]
    np.testing.assert_allclose(got, want.T, rtol=1e-4, atol=1e-5)


def test_mel_filterbank_properties():
    fb = A.mel_filterbank(201, 128, SR, 0.0, SR / 2)
    assert fb.shape == (201, 128)
    assert (fb >= 0).all()
    # triangles cover the interior of the band
    assert fb[1:-1].sum(axis=1).min() >= 0
    assert fb.sum() > 0


def test_dct_matrix_is_orthonormal_slice():
    d = A.dct_matrix_ortho(13, 128)
    # columns of the full ortho DCT-II are orthonormal; our 13-col slice too
    gram = d.T @ d
    np.testing.assert_allclose(gram, np.eye(13), atol=1e-5)
    # matches scipy's ortho DCT-II applied to a basis
    x = np.eye(128)
    want = scipy.fft.dct(x, type=2, norm="ortho", axis=0)[:13].T  # [128, 13]
    np.testing.assert_allclose(d, want, atol=1e-5)


def test_mfcc_tone_has_energy(speech_like):
    m = np.asarray(A.mfcc(speech_like))
    assert m.shape == (13, 81)  # 1 s @ hop 200, center-padded
    assert np.isfinite(m).all()
    assert np.abs(m).sum() > 0


def test_zscore_matches_torch_semantics(speech_like):
    torch = pytest.importorskip("torch")
    x = speech_like[:1000]
    got = np.asarray(A.zscore(x))
    t = torch.from_numpy(x)
    want = ((t - t.mean()) / (t.std() + 1e-6)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rhythm_golden(speech_like):
    """audio_analyzer.py:235-263: 25 ms/10 ms window energies Σx²,
    [mean, std(unbiased), frames/sr]."""
    got = np.asarray(A.rhythm(speech_like))
    frame_len, hop = 400, 160
    n = 1 + (SR - frame_len) // hop
    energies = np.array(
        [np.sum(speech_like[i * hop : i * hop + frame_len] ** 2) for i in range(n)]
    )
    want = np.array([energies.mean(), energies.std(ddof=1), n / SR])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_snr_golden(speech_like):
    """audio_analyzer.py:278-293."""
    got = float(A.signal_noise_ratio(speech_like))
    k = int(0.05 * SR)
    noise = np.concatenate([speech_like[:k], speech_like[-k:]])
    snr = 10 * np.log10((speech_like**2).mean() / ((noise**2).mean() + 1e-6))
    want = min(max(snr / 30, 0), 1)
    assert got == pytest.approx(want, abs=1e-4)


def test_consistency_golden(speech_like):
    """audio_analyzer.py:313-329: CV of 100 ms segment mean energies."""
    got = float(A.consistency(speech_like))
    seg = 1600
    n = SR // seg
    energies = np.array(
        [(speech_like[i * seg : (i + 1) * seg] ** 2).mean() for i in range(n)]
    )
    cv = energies.std(ddof=1) / (energies.mean() + 1e-6)
    want = 1.0 - min(cv, 1.0)
    assert got == pytest.approx(want, abs=1e-4)


def test_clarity_bounds(speech_like):
    c = float(A.clarity(speech_like))
    assert 0.0 <= c <= 1.0


def test_reference_mode_slots(speech_like):
    """D8/D11 reference-mode contracts: pitch and intensity slots are exactly
    0.0, speech_rate is 1.0 for any nonzero clip and 0.0 for silence."""
    assert float(A.pitch_reference(speech_like)) == 0.0
    assert float(A.intensity_reference(speech_like)) == 0.0
    assert float(A.speech_rate_reference(speech_like)) == 1.0
    assert float(A.speech_rate_reference(np.zeros(SR, np.float32))) == 0.0


def test_pitch_acf_finds_tone():
    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    f0 = float(A.pitch_acf(x)) * 400.0
    assert f0 == pytest.approx(200.0, rel=0.05)


def test_audio_feature_stack_shapes(speech_like):
    dsp, quality = A.audio_feature_stack(speech_like)
    assert dsp.shape == (19,)
    assert quality.shape == (4,)
    assert np.isfinite(np.asarray(dsp)).all()
    assert np.isfinite(np.asarray(quality)).all()
    # quality[0] is the 0.4/0.3/0.3 blend (audio_analyzer.py:265-276)
    q = np.asarray(quality)
    assert q[0] == pytest.approx(0.4 * q[1] + 0.3 * q[2] + 0.3 * q[3], abs=1e-5)


def test_stack_vmaps():
    import jax

    rng = np.random.default_rng(0)
    batch = rng.normal(size=(3, SR)).astype(np.float32)
    dsp, quality = jax.vmap(A.audio_feature_stack)(batch)
    assert dsp.shape == (3, 19)
    assert quality.shape == (3, 4)
