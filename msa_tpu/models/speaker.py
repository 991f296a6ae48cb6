"""Speaker-embedding model — the learned half of multi-speaker diarization.

The reference delegates speaker separation to pyannote.audio's pretrained
segmentation + embedding pipeline (reference
``src/processors/offline_processor.py:62-66``, up to 4 speakers per
DIARIZATION_CONFIG, config.py:67-72). No pretrained speaker checkpoint is
downloadable in this environment, so the rebuild ships the model + a
self-contained training recipe instead (VERDICT r1 item #7):

- :class:`SpeakerEmbeddingNet` — a small Flax encoder mapping a fixed log-mel
  window to an L2-normalized embedding (conv frontend over time +
  attentive-statistics pooling, the x-vector/ECAPA family shape). Static
  input shapes → one jitted graph batched over ALL windows of ALL spans.
- :func:`ge2e_loss` — generalized end-to-end softmax loss (Wan et al. 2018):
  each utterance is pulled to its speaker centroid and pushed from the other
  centroids in one [N·M, N] cross-entropy.
- :func:`synth_voice` / :func:`random_voice` — procedural voice generator
  (glottal-pulse harmonic stack shaped by per-voice formant resonances +
  aspiration noise). Two voices can share F0 and differ only in timbre,
  which is exactly the case mean-MFCC k-means clustering cannot separate.
- :func:`train_speaker_embedder` — trains on freshly synthesized random
  voices per step, so the embedder never sees the evaluation voices.

The host-side :class:`msa_tpu.host.diarization.NeuralDiarizer` runs this
model batched on device and clusters span embeddings agglomeratively.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.models.transformer import AttentiveStatsPool


@dataclasses.dataclass(frozen=True)
class SpeakerConfig:
    sample_rate: int = 16_000
    window_seconds: float = 1.2  # embedding window (static shape)
    n_fft: int = 400
    hop: int = 200
    n_mels: int = 40
    conv_channels: Tuple[int, ...] = (64, 64, 64)
    kernel: int = 5
    embed_dim: int = 64
    pool_hidden: int = 64

    @property
    def window_samples(self) -> int:
        return int(self.window_seconds * self.sample_rate)

    @property
    def frames(self) -> int:
        # matches power_spectrogram's center-padded framing
        return self.window_samples // self.hop + 1

    @classmethod
    def tiny(cls) -> "SpeakerConfig":
        return cls(
            window_seconds=0.8, n_mels=24, conv_channels=(16, 16), embed_dim=16,
            pool_hidden=16,
        )


def log_mel(wav: jnp.ndarray, cfg: SpeakerConfig) -> jnp.ndarray:
    """[..., T] waveform → [..., frames, n_mels] log-mel (jit-safe)."""
    from msa_tpu.ops.audio_features import mel_filterbank, power_spectrogram

    power = power_spectrogram(wav, cfg.n_fft, cfg.hop)  # [..., freq, frames]
    fb = jnp.asarray(
        mel_filterbank(
            cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate, 0.0, cfg.sample_rate / 2
        )
    )
    mel = jnp.einsum("...ft,fm->...tm", power, fb)  # [..., frames, n_mels]
    logm = jnp.log(jnp.maximum(mel, 1e-8))
    # per-window mean/variance normalization (cepstral-mean style)
    mu = jnp.mean(logm, axis=(-2, -1), keepdims=True)
    sd = jnp.std(logm, axis=(-2, -1), keepdims=True)
    return (logm - mu) / (sd + 1e-5)


class SpeakerEmbeddingNet(nn.Module):
    """log-mel window [B, frames, n_mels] → L2-normalized [B, embed_dim]."""

    cfg: SpeakerConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = feats
        for i, ch in enumerate(self.cfg.conv_channels):
            x = nn.Conv(ch, (self.cfg.kernel,), name=f"conv_{i}")(x)
            x = nn.gelu(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
        x = AttentiveStatsPool(hidden=self.cfg.pool_hidden, name="pool")(x)
        emb = nn.Dense(self.cfg.embed_dim, name="proj")(x)
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)

    def embed_windows(self, params: Any, wav_windows: jnp.ndarray) -> jnp.ndarray:
        """[B, window_samples] raw audio → [B, embed_dim] (one jitted graph:
        log-mel + encoder)."""
        feats = log_mel(wav_windows, self.cfg)
        return self.apply({"params": params}, feats)


def _init_host(model: SpeakerEmbeddingNet, seed: int) -> Any:
    c = model.cfg
    feats = jnp.zeros((1, c.frames, c.n_mels), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), feats)["params"]


def init_params(model: SpeakerEmbeddingNet, seed: int = 0) -> Any:
    """Init on the host CPU backend, then ONE transfer to the accelerator
    (see msa_tpu.utils.host_init)."""
    from msa_tpu.utils.host_init import host_init

    return host_init(_init_host, model, seed)


def save_params(params: Any, path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(
        flax.serialization.msgpack_serialize(
            {"params": flax.serialization.to_state_dict(params)}
        )
    )


def load_params(model: SpeakerEmbeddingNet, path: str) -> Any:
    # restore needs only the param tree STRUCTURE (eval_shape = zero
    # compute); ONE device transfer pins the leaves on the accelerator
    # (numpy leaves re-upload per jitted call; see msa_tpu.utils.host_init)
    from msa_tpu.utils.host_init import to_accelerator

    payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
    template = jax.eval_shape(lambda: _init_host(model, 0))
    return to_accelerator(
        flax.serialization.from_state_dict(template, payload["params"])
    )


# --- GE2E contrastive objective ------------------------------------------------


def ge2e_loss(
    emb: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Generalized end-to-end softmax loss.

    emb: [N_speakers, M_utts, D] L2-normalized. Own-speaker centroids exclude
    the utterance itself (the Wan et al. trick that stops the trivial
    solution); the [N·M, N] scaled-cosine matrix feeds a cross-entropy to the
    true speaker.
    """
    n, m, d = emb.shape
    centroids = jnp.mean(emb, axis=1)  # [N, D]
    # leave-one-out centroid for the own column
    sums = jnp.sum(emb, axis=1, keepdims=True)  # [N, 1, D]
    loo = (sums - emb) / (m - 1)  # [N, M, D]
    loo = loo / (jnp.linalg.norm(loo, axis=-1, keepdims=True) + 1e-8)
    cents = centroids / (jnp.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-8)

    sim = jnp.einsum("nmd,kd->nmk", emb, cents)  # [N, M, N]
    own = jnp.sum(emb * loo, axis=-1)  # [N, M]
    eye = jnp.eye(n)[:, None, :]  # replace own column with the LOO similarity
    sim = sim * (1 - eye) + own[..., None] * eye
    sim = jnp.abs(w) * sim + b  # learnable scale (kept positive) + bias

    labels = jnp.broadcast_to(jnp.arange(n)[:, None], (n, m))
    logp = jax.nn.log_softmax(sim, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
    return jnp.mean(nll)


# --- procedural voice synthesis -------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VoiceSpec:
    """A synthetic speaker identity: pitch + vocal-tract resonances."""

    f0: float  # fundamental, Hz
    formants: Tuple[float, ...]  # resonance centers, Hz
    bandwidth: float = 120.0  # resonance width, Hz
    tilt: float = 1.0  # spectral tilt exponent (harmonic rolloff)
    breathiness: float = 0.02  # aspiration-noise level


def random_voice(rng: np.random.Generator) -> VoiceSpec:
    return VoiceSpec(
        f0=float(rng.uniform(85, 300)),
        formants=(
            float(rng.uniform(300, 900)),
            float(rng.uniform(900, 2400)),
            float(rng.uniform(2400, 3500)),
        ),
        bandwidth=float(rng.uniform(80, 180)),
        tilt=float(rng.uniform(0.6, 1.4)),
        breathiness=float(rng.uniform(0.01, 0.05)),
    )


def synth_voice(
    rng: np.random.Generator,
    spec: VoiceSpec,
    seconds: float,
    sample_rate: int = 16_000,
) -> np.ndarray:
    """Speech-like signal: harmonic stack at f0 (with vibrato/jitter) whose
    per-harmonic amplitudes follow the voice's formant envelope, syllabic
    amplitude modulation, plus aspiration noise. Distinct formant sets give
    distinct timbre at identical pitch."""
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    # slow vibrato + per-utterance pitch drift
    vibrato = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t)
    drift = 1.0 + 0.03 * rng.standard_normal() * np.sin(
        2 * np.pi * rng.uniform(0.3, 0.8) * t + rng.uniform(0, 2 * np.pi)
    )
    f0 = spec.f0 * vibrato * drift
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate

    sig = np.zeros(n)
    n_harm = max(3, int((sample_rate / 2 - 200) / spec.f0))
    for h in range(1, min(n_harm, 40) + 1):
        fh = spec.f0 * h
        # formant envelope: sum of lorentzian resonances
        env = sum(
            1.0 / (1.0 + ((fh - fc) / spec.bandwidth) ** 2) for fc in spec.formants
        )
        amp = env / (h ** spec.tilt)
        sig += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))

    # syllabic amplitude modulation (~3-5 Hz) so energy features look like speech
    syll = 0.55 + 0.45 * np.clip(
        np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t + rng.uniform(0, 2 * np.pi)),
        0.0,
        None,
    )
    sig = sig * syll
    sig += spec.breathiness * rng.standard_normal(n) * np.max(np.abs(sig))
    peak = np.max(np.abs(sig)) + 1e-8
    return (0.3 * sig / peak).astype(np.float32)


# --- training recipe ------------------------------------------------------------


def train_speaker_embedder(
    cfg: Optional[SpeakerConfig] = None,
    steps: int = 300,
    n_speakers: int = 8,
    n_utts: int = 4,
    lr: float = 2e-3,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[SpeakerEmbeddingNet, Any, Dict[str, list]]:
    """Train on freshly sampled synthetic voices (new identities every step,
    so the net learns voice characteristics, not specific speakers). Returns
    (model, params, history)."""
    import optax

    cfg = cfg or SpeakerConfig()
    model = SpeakerEmbeddingNet(cfg)
    params = init_params(model, seed)
    state = {"params": params, "w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)}
    tx = optax.adam(lr)
    opt_state = tx.init(state)

    @jax.jit
    def step_fn(state, opt_state, windows):
        def loss_fn(st):
            feats = log_mel(windows, cfg)  # [N, M, frames, mels]
            emb = model.apply(
                {"params": st["params"]},
                feats.reshape((-1,) + feats.shape[2:]),
            ).reshape(windows.shape[0], windows.shape[1], -1)
            return ge2e_loss(emb, st["w"], st["b"])

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    history: Dict[str, list] = {"loss": []}
    ws = cfg.window_samples
    for i in range(steps):
        voices = [random_voice(rng) for _ in range(n_speakers)]
        windows = np.stack(
            [
                np.stack(
                    [
                        synth_voice(rng, v, cfg.window_seconds, cfg.sample_rate)[:ws]
                        for _ in range(n_utts)
                    ]
                )
                for v in voices
            ]
        )  # [N, M, ws]
        state, opt_state, loss = step_fn(state, opt_state, jnp.asarray(windows))
        history["loss"].append(float(loss))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps} ge2e_loss={float(loss):.4f}")
    return model, state["params"], history
