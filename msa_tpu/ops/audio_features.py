"""Audio DSP feature ops — pure jnp, static shapes, jit/vmap friendly.

TPU-first rebuild of the reference audio feature stack
(reference ``src/analyzers/audio_analyzer.py``). The reference called into
torchaudio C++ kernels per clip; here every op is a fixed-shape jnp function
over a [num_samples] (or batched [B, num_samples]) waveform so the whole
per-segment stack fuses into one XLA graph and vmaps across segments.

Feature contract (widths feeding the 31-dim audio vector, SURVEY §2):
  emotion 8 (from the audio encoder, not here) + pitch 1 + intensity 1 +
  timbre 13 (MFCC) + speech_rate 1 + rhythm 3.

Defect decisions (SURVEY §2.11):
- D8: the reference "pitch" is PitchShift(n_steps=0) — a no-op whose
  |x − shift(x)| z-score means to ~0. ``pitch_mode="reference"`` keeps the
  slot at exactly 0.0; ``pitch_mode="acf"`` computes a real autocorrelation
  F0 behind the same 1-dim slot.
- D11 (new, found during the rebuild): the reference z-scores the per-channel
  energy over a SINGLE mono channel (audio_analyzer.py:190-198); torch's
  unbiased std of one element is NaN, which poisons the whole LayerNormed
  31-vector until nan_to_num zeroes it. The working intent — "0 under a
  guarded z-score of one value" — is implemented: intensity = 0.0 in
  reference mode. A real windowed-RMS intensity is available via
  ``intensity_windowed``.
- speech_rate: the reference thresholds the [channels]-shaped total energy
  against 0.1× its own mean (audio_analyzer.py:219-233) which is a constant
  1.0 for any nonzero mono clip; reproduced exactly, with a real framed
  voice-activity ratio available via ``speech_rate_framed``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000


# --- framing -----------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[..., T] → [..., num_frames, frame_len] sliding windows (static
    shapes). Equivalent to the reference's unfold framing
    (audio_analyzer.py:245-249). Gather-based: only used where the actual
    frame contents are needed (FFT); pure energy windows use
    :func:`windowed_energy`, which never materializes frames.
    (Measured: ``conv_general_dilated_patches`` lowers to a dense
    frame_len-channel conv and is ~4.6× slower here.)"""
    t = x.shape[-1]
    num_frames = 1 + (t - frame_len) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[..., idx]


def windowed_energy(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Σ x² per sliding window without materializing frames: a 1-channel
    ones-kernel conv over x² ([..., T] → [..., num_frames]). Exactly the
    per-window energies the reference computes via unfold+sum
    (audio_analyzer.py:245-250), at O(T·frame_len/hop) conv cost instead of
    an O(T·frame_len) gather."""
    if hop == frame_len:
        # non-overlapping: a plain reshape+sum (consistency's 100 ms case)
        t = x.shape[-1]
        n = t // frame_len
        return jnp.sum(
            x[..., : n * frame_len].reshape(*x.shape[:-1], n, frame_len) ** 2,
            axis=-1,
        )
    lead = x.shape[:-1]
    t = x.shape[-1]
    sq = (x * x).reshape(-1, t, 1)
    ones = jnp.ones((frame_len, 1, 1), x.dtype)
    e = jax.lax.conv_general_dilated(
        sq,
        ones,
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return e.reshape(*lead, -1)


# --- mel / MFCC --------------------------------------------------------------


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float, f_max: float
) -> np.ndarray:
    """HTK-scale triangular mel filterbank [n_freqs, n_mels], matching the
    torchaudio melscale_fbanks defaults the reference relied on
    (audio_analyzer.py:207-210 → torchaudio.transforms.MFCC defaults)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def dct_matrix_ortho(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II with 'ortho' norm, [n_mels, n_mfcc] — torchaudio
    create_dct equivalent (used by MFCC with norm='ortho')."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(math.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) * 2.0
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(1.0 / (2.0 * n_mels))
    return dct.astype(np.float32)


def power_spectrogram(
    x: jnp.ndarray, n_fft: int = 400, hop: int = 200
) -> jnp.ndarray:
    """Power STFT |X|² with hann window, center padding (reflect) —
    torchaudio.Spectrogram defaults. [T] → [n_fft//2+1, frames]."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop)  # [..., frames, n_fft]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)  # [..., frames, n_fft//2+1]
    power = jnp.abs(spec) ** 2
    return jnp.swapaxes(power, -1, -2)  # [..., freq, frames]


def amplitude_to_db(power: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    """torchaudio AmplitudeToDB(stype='power', top_db=80): 10·log10 with
    1e-10 floor then a global (per-tensor) top_db clamp."""
    db = 10.0 * jnp.log10(jnp.maximum(power, 1e-10))
    return jnp.maximum(db, jnp.max(db) - top_db)


def mfcc(
    x: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_mfcc: int = 13,
    n_fft: int = 400,
    hop: int = 200,
    n_mels: int = 128,
) -> jnp.ndarray:
    """MFCC matching torchaudio.transforms.MFCC defaults (the reference's
    timbre/clarity transform, audio_analyzer.py:207-210, :299-302):
    power mel spectrogram → AmplitudeToDB(top_db=80) → ortho DCT-II.
    [T] → [n_mfcc, frames]."""
    power = power_spectrogram(x, n_fft, hop)  # [freq, frames]
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, 0.0, sample_rate / 2)
    )
    mel = jnp.einsum("...ft,fm->...mt", power, fb)  # [n_mels, frames]
    mel_db = amplitude_to_db(mel)
    dct = jnp.asarray(dct_matrix_ortho(n_mfcc, n_mels))
    return jnp.einsum("...mt,mk->...kt", mel_db, dct)


# --- reference feature slots ---------------------------------------------------


def zscore(x: jnp.ndarray, ddof: int = 1, eps: float = 1e-6) -> jnp.ndarray:
    """torch-style z-score over ALL elements: (x − mean)/(std + eps) with
    unbiased std (torch .std() default), used throughout the reference's
    feature normalizations."""
    mean = jnp.mean(x)
    n = x.size
    var = jnp.sum(jnp.square(x - mean)) / jnp.maximum(n - ddof, 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


def pitch_reference(x: jnp.ndarray) -> jnp.ndarray:
    """D8 reference mode: PitchShift(n_steps=0) makes |x − shift(x)| ≈ 0 and
    the z-scored mean is exactly 0 (audio_analyzer.py:175-188)."""
    return jnp.zeros((), jnp.float32)


def pitch_acf(
    x: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = 60.0,
    f_max: float = 400.0,
) -> jnp.ndarray:
    """Real F0 estimate (D8 repair mode): normalized autocorrelation peak over
    the speech F0 lag range, returned in [0, 1] as f0/f_max (scalar)."""
    x = x - jnp.mean(x)
    n = x.shape[-1]
    fft_len = int(2 ** math.ceil(math.log2(2 * n - 1)))
    spec = jnp.fft.rfft(x, fft_len)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), fft_len)[:n]
    acf = acf / jnp.maximum(acf[0], 1e-9)
    lag_min = int(sample_rate / f_max)
    lag_max = min(int(sample_rate / f_min), n - 1)
    window = acf[lag_min:lag_max]
    best = jnp.argmax(window) + lag_min
    f0 = sample_rate / best.astype(jnp.float32)
    voiced = jnp.max(window) > 0.3
    return jnp.where(voiced, f0 / f_max, 0.0)


def intensity_reference(x: jnp.ndarray) -> jnp.ndarray:
    """D11 reference mode: guarded z-score of the single mono-channel total
    energy ≡ 0.0 (the intent behind audio_analyzer.py:190-198; the literal
    reference NaN-poisons and is zeroed by nan_to_num downstream)."""
    return jnp.zeros((), jnp.float32)


def intensity_windowed(
    x: jnp.ndarray, frame_len: int = 400, hop: int = 160
) -> jnp.ndarray:
    """Repair mode: z-scored mean frame energy — a real loudness scalar."""
    energy = windowed_energy(x, frame_len, hop)
    return jnp.mean(zscore(energy))


def timbre_mfcc(x: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """13 MFCCs, z-scored over the whole [13, frames] tensor then
    time-averaged (audio_analyzer.py:203-217). → [13]."""
    m = mfcc(x, sample_rate)  # [13, frames]
    return jnp.mean(zscore(m), axis=-1)


def speech_rate_reference(x: jnp.ndarray) -> jnp.ndarray:
    """Reference formula: energy per channel (mono → one value) thresholded
    at 0.1× its own mean → 1.0 for any nonzero clip, 0.0 for silence
    (audio_analyzer.py:219-233)."""
    energy = jnp.sum(jnp.square(x))
    # e > 0.1·e holds iff e > 0, so the formula collapses to a silence gate.
    return (energy > 0).astype(jnp.float32)


def speech_rate_framed(
    x: jnp.ndarray, frame_len: int = 400, hop: int = 160
) -> jnp.ndarray:
    """Repair mode: fraction of frames whose energy exceeds 0.1× the mean
    frame energy — the formula the reference intended."""
    energy = windowed_energy(x, frame_len, hop)
    return jnp.mean((energy > 0.1 * jnp.mean(energy)).astype(jnp.float32))


def rhythm(
    x: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    window_size: float = 0.025,
    hop_length: float = 0.010,
) -> jnp.ndarray:
    """[mean, std, frames/sr] of windowed energies — exact reference formula
    (audio_analyzer.py:235-263): 25 ms windows / 10 ms hop; the reference
    unfolds the RAW samples and sums their squares per window, i.e. plain
    window energy Σx². std is torch-unbiased. The third slot is
    num_frames / sample_rate (the reference's mislabeled "duration";
    formula kept for parity)."""
    frame_len = int(window_size * sample_rate)
    hop = int(hop_length * sample_rate)
    energy = windowed_energy(x, frame_len, hop)  # [frames]
    n = energy.shape[0]
    mean = jnp.mean(energy)
    std = jnp.sqrt(jnp.sum(jnp.square(energy - mean)) / jnp.maximum(n - 1, 1))
    dur = jnp.asarray(n / sample_rate, jnp.float32)
    return jnp.stack([mean, std, dur])


# --- quality metrics (audio_analyzer.py:265-329) -------------------------------


def signal_noise_ratio(x: jnp.ndarray) -> jnp.ndarray:
    """SNR estimate: noise from the first+last 5% of samples, snr_db/30
    clipped to [0,1] (audio_analyzer.py:278-293)."""
    t = x.shape[-1]
    k = int(0.05 * t)
    noise = jnp.concatenate([x[..., :k], x[..., -k:]], axis=-1)
    noise_power = jnp.mean(jnp.square(noise))
    signal_power = jnp.mean(jnp.square(x))
    snr = 10.0 * jnp.log10(signal_power / (noise_power + 1e-6))
    return jnp.clip(snr / 30.0, 0.0, 1.0)


def clarity(x: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """High/low MFCC band energy ratio clipped to [0,1]
    (audio_analyzer.py:295-311): mean |mfcc[6:]| / mean |mfcc[:6]|."""
    m = mfcc(x, sample_rate)  # [13, frames]
    high = jnp.mean(jnp.abs(m[6:]))
    low = jnp.mean(jnp.abs(m[:6]))
    return jnp.clip(high / (low + 1e-6), 0.0, 1.0)


def consistency(x: jnp.ndarray, sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """1 − min(CV, 1) of 100 ms non-overlapping segment energies
    (audio_analyzer.py:313-329); CV uses torch-unbiased std."""
    seg = int(0.1 * sample_rate)
    energy = windowed_energy(x, seg, seg) / seg  # mean energy per segment
    n = energy.shape[0]
    mean = jnp.mean(energy)
    std = jnp.sqrt(jnp.sum(jnp.square(energy - mean)) / jnp.maximum(n - 1, 1))
    cv = std / (mean + 1e-6)
    return 1.0 - jnp.minimum(cv, 1.0)


def audio_quality(snr, clr, cons) -> jnp.ndarray:
    """0.4·SNR + 0.3·clarity + 0.3·consistency (audio_analyzer.py:265-276)."""
    return 0.4 * snr + 0.3 * clr + 0.3 * cons


# --- assembled stack -----------------------------------------------------------


def audio_feature_stack(
    x: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    pitch_mode: str = "reference",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All DSP slots for one waveform.

    Returns (dsp_features[19], quality[4]) where dsp_features is the
    [pitch 1, intensity 1, timbre 13, speech_rate 1, rhythm 3] tail that the
    audio encoder's 8 emotion probs are prepended to before the 31-dim
    normalizer (audio_analyzer.py:113-124)."""
    x = x.astype(jnp.float32)
    if pitch_mode == "acf":
        pitch = pitch_acf(x, sample_rate)
        intens = intensity_windowed(x)
        rate = speech_rate_framed(x)
    else:
        pitch = pitch_reference(x)
        intens = intensity_reference(x)
        rate = speech_rate_reference(x)
    timbre = timbre_mfcc(x, sample_rate)
    rhy = rhythm(x, sample_rate)
    snr = signal_noise_ratio(x)
    clr = clarity(x, sample_rate)
    cons = consistency(x, sample_rate)
    dsp = jnp.concatenate(
        [pitch[None], intens[None], timbre, rate[None], rhy]
    )  # [19]
    quality = jnp.stack([audio_quality(snr, clr, cons), snr, clr, cons])  # [4]
    return dsp, quality
