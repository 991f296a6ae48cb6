"""Phonetic Portuguese speech synthesis — spoken-word training data for ASR.

The reference intended ``openai/whisper-medium`` for transcription
(reference ``src/config/config.py:75-79``) but its ASR path was broken
(defect D3) and no pretrained Whisper weights are downloadable in this
environment. The rebuild's answer, following the face/audio/text/fusion
pattern, is an in-repo supervision recipe: this module renders Portuguese
words as audio whose PHONETIC content is recoverable, so
:mod:`msa_tpu.training.train_whisper_asr` can train the TPU-native Whisper
model (:mod:`msa_tpu.models.whisper`) to transcribe them.

Same synthesis family as :func:`msa_tpu.models.speaker.synth_voice` (glottal
harmonic stack shaped by Lorentzian formant resonances + noise), extended
from a static per-voice envelope to TIME-VARYING per-phone targets:

- graphemes map to phones by deterministic Portuguese rules (digraphs
  nh/lh/ch/rr/ss/qu/gu, soft c/g before e,i, ç, x→ʃ, j→ʒ, silent h);
- vowels are formant targets (standard F1/F2/F3 values, scaled per speaker
  by a vocal-tract-length factor so identity varies but phone class holds);
- stops are closure gaps + noise bursts at class-specific spectral bands
  (labial low, velar mid, alveolar high), voiced stops keep a voice bar;
- fricatives are sustained band noise (s/z high, ʃ/ʒ mid, f/v flat);
- nasals/liquids are reduced-amplitude voiced segments with their own
  formant targets; formant tracks interpolate linearly between phones
  (coarticulation ramps), which is the cue that makes unseen-word
  generalization possible for a phonetically compositional model.

Prosody composes orthogonally: :class:`msa_tpu.training.train_audio_emotion.
Prosody` modulates pitch contour/level, rate, energy, tilt and attack, so
:mod:`msa_tpu.training.synth_av` meetings can SPEAK emotion words with the
matching emotional prosody — audio that exercises the full default pipeline
(diarizer → ASR → text heads → fusion) end to end.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from msa_tpu.models.speaker import VoiceSpec

SR = 16_000

# --- phone inventory ----------------------------------------------------------

# vowel formant targets (F1, F2, F3) in Hz — Brazilian Portuguese monophthongs
_VOWELS = {
    "a": (780.0, 1300.0, 2600.0),
    "e": (450.0, 1950.0, 2600.0),
    "E": (580.0, 1800.0, 2550.0),  # open e (é)
    "i": (300.0, 2250.0, 2900.0),
    "o": (450.0, 850.0, 2600.0),
    "O": (560.0, 950.0, 2550.0),  # open o (ó)
    "u": (330.0, 750.0, 2450.0),
}
# nasal vowels: same targets + a low nasal murmur resonance, slight damping
_NASAL_VOWELS = {"ã": "a", "õ": "o"}

# noise bands for frication/bursts: (low_hz, high_hz)
_BANDS = {
    "low": (400.0, 1600.0),  # labial bursts, rr frication
    "mid": (1800.0, 4200.0),  # ʃ/ʒ, velar bursts
    "high": (4000.0, 7600.0),  # s/z, alveolar bursts
    "flat": (800.0, 7000.0),  # f/v
}


@dataclasses.dataclass(frozen=True)
class Phone:
    kind: str  # vowel | stop | fric | nasal | liquid | tap | sil
    dur: float  # seconds (pre-prosody)
    formants: Tuple[float, float, float] = (500.0, 1500.0, 2500.0)
    voiced: bool = True
    band: str = "mid"  # noise band for stops/fricatives
    nasal: bool = False
    amp: float = 1.0


def _vowel(sym: str, stressed: bool = False, nasal: bool = False) -> Phone:
    return Phone(
        "vowel",
        0.14 if stressed else 0.10,
        _VOWELS[sym],
        nasal=nasal,
        amp=1.0,
    )


_CONSONANTS = {
    # stops: band = burst spectrum
    "p": Phone("stop", 0.075, voiced=False, band="low"),
    "b": Phone("stop", 0.070, voiced=True, band="low"),
    "t": Phone("stop", 0.075, voiced=False, band="high"),
    "d": Phone("stop", 0.070, voiced=True, band="high"),
    "k": Phone("stop", 0.080, voiced=False, band="mid"),
    "g": Phone("stop", 0.075, voiced=True, band="mid"),
    # fricatives
    "f": Phone("fric", 0.095, voiced=False, band="flat", amp=0.5),
    "v": Phone("fric", 0.085, voiced=True, band="flat", amp=0.5),
    "s": Phone("fric", 0.100, voiced=False, band="high", amp=0.7),
    "z": Phone("fric", 0.090, voiced=True, band="high", amp=0.6),
    "S": Phone("fric", 0.100, voiced=False, band="mid", amp=0.7),  # ʃ (x, ch)
    "Z": Phone("fric", 0.090, voiced=True, band="mid", amp=0.6),  # ʒ (j, soft g)
    # nasals
    "m": Phone("nasal", 0.075, (250.0, 1000.0, 2200.0), amp=0.55),
    "n": Phone("nasal", 0.075, (250.0, 1400.0, 2300.0), amp=0.55),
    "N": Phone("nasal", 0.080, (250.0, 2000.0, 2500.0), amp=0.55),  # ɲ (nh)
    # liquids
    "l": Phone("liquid", 0.060, (350.0, 1400.0, 2600.0), amp=0.7),
    "L": Phone("liquid", 0.065, (350.0, 2000.0, 2600.0), amp=0.7),  # ʎ (lh)
    "r": Phone("tap", 0.030, (400.0, 1500.0, 2500.0), amp=0.45),
    "R": Phone("fric", 0.090, voiced=True, band="low", amp=0.5),  # rr/initial r
}

_ACCENT_MAP = {
    "á": ("a", True), "â": ("a", True), "à": ("a", True),
    "é": ("E", True), "ê": ("e", True),
    "í": ("i", True), "ó": ("O", True), "ô": ("o", True),
    "ú": ("u", True), "ü": ("u", False),
}


def word_to_phones(word: str) -> List[Phone]:
    """Deterministic grapheme → phone mapping for one lowercase word."""
    w = word.lower()
    out: List[Phone] = []
    # mark the stressed vowel: explicit accent wins, else penultimate vowel
    accent_pos = [i for i, ch in enumerate(w) if ch in _ACCENT_MAP]
    vowel_pos = [
        i
        for i, ch in enumerate(w)
        if ch in "aeiouáâàéêíóôúü" or ch in _NASAL_VOWELS
    ]
    if accent_pos:
        stressed_at = accent_pos[0]
    elif len(vowel_pos) >= 2:
        stressed_at = vowel_pos[-2]
    elif vowel_pos:
        stressed_at = vowel_pos[0]
    else:
        stressed_at = -1

    i = 0
    while i < len(w):
        ch = w[i]
        nxt = w[i + 1] if i + 1 < len(w) else ""
        stressed = i == stressed_at
        # digraphs
        if ch == "n" and nxt == "h":
            out.append(_CONSONANTS["N"]); i += 2; continue
        if ch == "l" and nxt == "h":
            out.append(_CONSONANTS["L"]); i += 2; continue
        if ch == "c" and nxt == "h":
            out.append(_CONSONANTS["S"]); i += 2; continue
        if ch == "r" and nxt == "r":
            out.append(_CONSONANTS["R"]); i += 2; continue
        if ch == "s" and nxt == "s":
            out.append(_CONSONANTS["s"]); i += 2; continue
        if ch == "q":  # qu + e/i: u is silent; qu + a/o: k + u
            out.append(_CONSONANTS["k"])
            if nxt == "u" and i + 2 < len(w) and w[i + 2] in "ei":
                i += 2
            else:
                i += 1
            continue
        if ch == "g" and nxt == "u" and i + 2 < len(w) and w[i + 2] in "ei":
            out.append(_CONSONANTS["g"]); i += 2; continue
        # single graphemes
        if ch in _ACCENT_MAP:
            sym, _ = _ACCENT_MAP[ch]
            out.append(_vowel(sym, stressed=True)); i += 1; continue
        if ch in _NASAL_VOWELS:
            out.append(_vowel(_NASAL_VOWELS[ch], stressed, nasal=True))
            i += 1; continue
        if ch in _VOWELS:
            out.append(_vowel(ch, stressed)); i += 1; continue
        if ch == "c":
            out.append(_CONSONANTS["s" if nxt in "ei" else "k"]); i += 1; continue
        if ch == "ç":
            out.append(_CONSONANTS["s"]); i += 1; continue
        if ch == "g":
            out.append(_CONSONANTS["Z" if nxt in "ei" else "g"]); i += 1; continue
        if ch == "j":
            out.append(_CONSONANTS["Z"]); i += 1; continue
        if ch == "x":
            out.append(_CONSONANTS["S"]); i += 1; continue
        if ch == "r":
            out.append(_CONSONANTS["R" if i == 0 else "r"]); i += 1; continue
        if ch == "h":
            i += 1; continue  # silent
        if ch in _CONSONANTS:
            out.append(_CONSONANTS[ch]); i += 1; continue
        i += 1  # unknown symbol: skip
    return out


# --- track building -----------------------------------------------------------

_RAMP_S = 0.016  # coarticulation ramp between phones


def _phone_tracks(
    rng: np.random.Generator,
    phones: Sequence[Phone],
    rate_scale: float,
    sample_rate: int,
):
    """Piecewise per-phone targets → per-sample tracks.

    Returns (formants [n,3], voice_amp [n], fric_amp [n], band_gain [n,4],
    nasal_amp [n]) — all linearly interpolated between phone centers so
    formant transitions carry coarticulation cues."""
    band_names = list(_BANDS)
    # knot times/values at each phone's center + hard edges for silence
    times: List[float] = [0.0]
    knots: List[np.ndarray] = []
    edge = np.zeros(8, np.float32)  # silence knot

    def knot(p: Phone) -> np.ndarray:
        # layout: [F1, F2, F3, voice_amp, fric_amp] (+3 spare slots)
        v = np.zeros(8, np.float32)
        v[0:3] = p.formants
        v[3] = p.amp if p.voiced else 0.0
        v[4] = p.amp if p.kind == "fric" else 0.0
        return v

    band_knots: List[np.ndarray] = []
    t = 0.0
    knots.append(edge)
    band_knots.append(np.zeros(len(band_names), np.float32))
    for p in phones:
        dur = p.dur * rate_scale * float(rng.uniform(0.85, 1.15))
        if p.kind == "sil":
            t += dur
            times.append(t)
            knots.append(edge)
            band_knots.append(np.zeros(len(band_names), np.float32))
            continue
        # stops: closure (near-silence, voice bar if voiced) then burst
        if p.kind == "stop":
            t_clo = t + 0.6 * dur
            v_clo = np.zeros(8, np.float32)
            v_clo[0:3] = p.formants
            v_clo[3] = 0.18 if p.voiced else 0.0  # voice bar
            times.append(t_clo)
            knots.append(v_clo)
            band_knots.append(np.zeros(len(band_names), np.float32))
            t_burst = t + 0.8 * dur
            v_b = np.zeros(8, np.float32)
            v_b[0:3] = p.formants
            v_b[3] = 0.2 if p.voiced else 0.0
            v_b[4] = 0.9
            bg = np.zeros(len(band_names), np.float32)
            bg[band_names.index(p.band)] = 1.0
            times.append(t_burst)
            knots.append(v_b)
            band_knots.append(bg)
            t += dur
            continue
        center = t + 0.5 * dur
        v = knot(p)
        bg = np.zeros(len(band_names), np.float32)
        if p.kind == "fric":
            bg[band_names.index(p.band)] = 1.0
        times.append(center)
        knots.append(v)
        band_knots.append(bg)
        t += dur
    times.append(t + _RAMP_S)
    knots.append(edge)
    band_knots.append(np.zeros(len(band_names), np.float32))

    n = max(1, int(round(t * sample_rate)))
    ts = np.arange(n) / sample_rate
    K = np.stack(knots)  # [k, 8]
    BG = np.stack(band_knots)  # [k, 4]
    tk = np.asarray(times)
    tracks = np.stack([np.interp(ts, tk, K[:, j]) for j in range(8)], axis=1)
    bands = np.stack(
        [np.interp(ts, tk, BG[:, j]) for j in range(len(band_names))], axis=1
    )
    formants = tracks[:, 0:3]
    voice_amp = tracks[:, 3]
    fric_amp = tracks[:, 4]
    # nasal amplitude uses the same knot layout as `knots` (stops add 2 knots)
    nas = [0.0]
    for p in phones:
        val = 0.6 if (p.nasal or p.kind == "nasal") else 0.0
        if p.kind == "stop":
            nas.extend([0.0, 0.0])
        elif p.kind == "sil":
            nas.append(0.0)
        else:
            nas.append(val)
    nas.append(0.0)
    nasal_amp = np.interp(ts, tk, np.asarray(nas))
    return formants, voice_amp, fric_amp, bands, nasal_amp


def _noise_bands(rng: np.random.Generator, n: int, sample_rate: int) -> np.ndarray:
    """[n, 4] — one white-noise draw FFT-filtered into the fixed bands."""
    noise = rng.standard_normal(n).astype(np.float32)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1.0 / sample_rate)
    out = np.empty((n, len(_BANDS)), np.float32)
    for j, (lo, hi) in enumerate(_BANDS.values()):
        mask = (freqs >= lo) & (freqs < hi)
        band = np.fft.irfft(spec * mask, n)
        out[:, j] = band / (np.std(band) + 1e-8)
    return out


def synth_utterance(
    rng: np.random.Generator,
    voice: VoiceSpec,
    text: str,
    sample_rate: int = SR,
    prosody=None,
    word_gap: float = 0.11,
) -> np.ndarray:
    """Render ``text`` (space-separated Portuguese words) as speech.

    ``voice`` supplies identity (f0 level, vocal-tract scale from its first
    formant, tilt, breathiness); ``prosody`` (optional
    :class:`msa_tpu.training.train_audio_emotion.Prosody`) supplies the
    emotional modulation — pitch contour/level, rate, energy, tilt, attack.
    """
    phones: List[Phone] = []
    for w, word in enumerate(text.strip().split()):
        if w:
            phones.append(Phone("sil", word_gap, voiced=False))
        phones.extend(word_to_phones(word))
    if not phones:
        return np.zeros(int(0.2 * sample_rate), np.float32)

    f0_scale = 1.0
    f0_var = 0.04
    f0_slope = 0.0
    rate_scale = 1.0
    energy = 1.0
    tilt_mul = 1.0
    attack = 1.0
    if prosody is not None:
        f0_scale = prosody.f0_scale
        f0_var = max(prosody.f0_var, 0.02)
        f0_slope = prosody.f0_slope
        rate_scale = 3.5 / max(prosody.rate, 0.5)
        energy = prosody.energy
        tilt_mul = prosody.tilt
        attack = prosody.attack

    # speaker vocal-tract scale from the voice's (random) first formant
    vt_scale = float(np.clip(voice.formants[0] / 600.0, 0.82, 1.22))

    formants, voice_amp, fric_amp, bands, nasal_amp = _phone_tracks(
        rng, phones, rate_scale, sample_rate
    )
    formants = formants * vt_scale
    n = formants.shape[0]
    ts = np.arange(n) / sample_rate
    dur_s = n / sample_rate

    # pitch: level × slow modulation × contour slope × vibrato
    vibrato = 1.0 + 0.015 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * ts)
    wobble = 1.0 + f0_var * np.sin(
        2 * np.pi * rng.uniform(0.6, 1.4) * ts + rng.uniform(0, 2 * np.pi)
    )
    contour = 1.0 + f0_slope * (ts / max(dur_s, 1e-3) - 0.5)
    f0 = voice.f0 * f0_scale * vibrato * wobble * np.clip(contour, 0.5, 2.0)
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate

    tilt = float(np.clip(voice.tilt * tilt_mul, 0.4, 2.2))
    bw = voice.bandwidth
    f0_mean = float(np.mean(f0))
    n_harm = int(min(40, max(3, (sample_rate / 2 - 200) / f0_mean)))
    voiced = np.zeros(n, np.float32)
    for h in range(1, n_harm + 1):
        fh = h * f0  # [n]
        env = (
            1.0 / (1.0 + ((fh - formants[:, 0]) / bw) ** 2)
            + 1.0 / (1.0 + ((fh - formants[:, 1]) / bw) ** 2)
            + 0.5 / (1.0 + ((fh - formants[:, 2]) / (1.4 * bw)) ** 2)
            + nasal_amp * 0.8 / (1.0 + ((fh - 250.0) / 100.0) ** 2)
        )
        voiced += (env / h**tilt).astype(np.float32) * np.sin(
            h * phase + rng.uniform(0, 2 * np.pi)
        ).astype(np.float32)
    # sharper (attack>1) or softer syllable onsets
    vamp = np.power(np.clip(voice_amp, 0.0, None), attack)
    sig = voiced * vamp

    nb = _noise_bands(rng, n, sample_rate)
    sig = sig + 0.6 * fric_amp * np.sum(nb * bands, axis=1)
    sig = sig + voice.breathiness * rng.standard_normal(n).astype(np.float32) * (
        np.max(np.abs(sig)) + 1e-8
    )
    peak = np.max(np.abs(sig)) + 1e-8
    return (0.3 * energy * sig / peak).astype(np.float32)


# --- spoken sentences ----------------------------------------------------------

# sentence templates built ONLY from the ASR training vocabulary
# (train_whisper_asr.FILLERS + the emotion lexicon), so the shipped
# transcriber is maximally reliable on synth_av meeting speech
SPOKEN_TEMPLATES: Tuple[str, ...] = (
    "estou muito {w} hoje",
    "me sinto {w}",
    "que dia {w}",
    "ele foi tão {w}",
    "ela foi tão {w}",
    "isso foi {w}",
    "estou um pouco {w}",
    "hoje me sinto {w}",
)


def spoken_sentence(rng: np.random.Generator, word: str) -> str:
    """One template sentence around an emotion word."""
    return str(rng.choice(SPOKEN_TEMPLATES)).format(w=word)


def synth_spoken_clip(
    rng: np.random.Generator,
    voice: VoiceSpec,
    texts: Sequence[str],
    seconds: float,
    sample_rate: int = SR,
    prosody=None,
) -> np.ndarray:
    """Fill a fixed window with spoken sentences (cycled, separated by
    0.2–0.4 s pauses) — segment-shaped speech for synth_av meetings and the
    mixed-speech audio-emotion recipe."""
    n = int(seconds * sample_rate)
    out = np.zeros(n, np.float32)
    pos = int(rng.integers(0, int(0.15 * sample_rate) + 1))
    i = 0
    while pos < n - int(0.3 * sample_rate):
        text = texts[i % len(texts)]
        wav = synth_utterance(rng, voice, text, sample_rate, prosody=prosody)
        take = min(len(wav), n - pos)
        out[pos : pos + take] = wav[:take]
        pos += take + int(rng.uniform(0.2, 0.4) * sample_rate)
        i += 1
    return out
