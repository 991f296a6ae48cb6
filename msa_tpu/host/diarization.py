"""Speaker diarization interface + built-in implementations.

The reference hard-wires pyannote.audio's GPU pipeline (reference
``src/processors/offline_processor.py:62-66``, ``:96-116``), which needs an
HF token and network access. Here diarization is a pluggable host-side
interface with two deterministic built-ins; a pyannote adapter can be
registered when the dependency is available.

Output contract is the reference's segment list
(offline_processor.py:108-116): ``[{"start": s, "end": e, "speaker": id}]``.
"""

from __future__ import annotations

from typing import Dict, List, Protocol

import numpy as np


class Diarizer(Protocol):
    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        """→ [{"start", "end", "speaker"}] sorted by start."""
        ...


class FixedWindowDiarizer:
    """Single speaker, fixed windows of ``segment_duration`` seconds — the
    deterministic fallback (SURVEY §2.9: 'at minimum a pluggable Diarizer
    interface with a deterministic fixed-window fallback')."""

    def __init__(self, segment_duration: float = 5.0, speaker: str = "SPEAKER_00"):
        self.segment_duration = segment_duration
        self.speaker = speaker

    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        total = len(waveform) / sample_rate
        out = []
        t = 0.0
        while t < total:
            end = min(t + self.segment_duration, total)
            if end - t > 1e-3:
                out.append({"start": t, "end": end, "speaker": self.speaker})
            t = end
        return out


class EnergyVADDiarizer:
    """Energy-threshold voice activity detection with speech/pause hysteresis.

    Honors the reference's processing knobs: min_speech_duration and
    min_pause_duration (config.py:42-48) and caps segments at
    ``segment_duration``. Single-speaker labeling (speaker separation proper
    needs an embedding model — pluggable via the same interface)."""

    def __init__(
        self,
        segment_duration: float = 5.0,
        min_speech_duration: float = 0.5,
        min_pause_duration: float = 0.5,
        frame_ms: float = 30.0,
        threshold_ratio: float = 0.5,
        speaker: str = "SPEAKER_00",
    ):
        self.segment_duration = segment_duration
        self.min_speech = min_speech_duration
        self.min_pause = min_pause_duration
        self.frame_ms = frame_ms
        self.threshold_ratio = threshold_ratio
        self.speaker = speaker

    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        x = np.asarray(waveform, np.float32)
        frame = max(1, int(sample_rate * self.frame_ms / 1000))
        n = len(x) // frame
        if n == 0:
            return []
        energies = (x[: n * frame].reshape(n, frame) ** 2).mean(axis=1)
        # adaptive threshold between the noise floor and mean energy
        floor = np.percentile(energies, 10)
        spread = energies.mean() - floor
        if spread <= 1e-9 * max(energies.mean(), 1.0):
            # flat-energy signal (e.g. constant tone): no floor/speech
            # contrast to threshold on — treat everything above a tiny
            # absolute floor as speech
            active = energies > 1e-8
        else:
            thresh = floor + self.threshold_ratio * spread
            active = energies > thresh

        # merge gaps shorter than min_pause, drop bursts shorter than min_speech
        sec_per_frame = frame / sample_rate
        spans: List[List[float]] = []
        start = None
        gap = 0.0
        for i, a in enumerate(active):
            t = i * sec_per_frame
            if a:
                if start is None:
                    start = t
                gap = 0.0
            elif start is not None:
                gap += sec_per_frame
                if gap >= self.min_pause:
                    spans.append([start, t - gap + sec_per_frame])
                    start = None
        if start is not None:
            spans.append([start, n * sec_per_frame])
        spans = [s for s in spans if s[1] - s[0] >= self.min_speech]

        # split long spans to the fixed segment duration (static device shapes)
        out: List[Dict] = []
        for s, e in spans:
            t = s
            while t < e:
                end = min(t + self.segment_duration, e)
                out.append({"start": t, "end": end, "speaker": self.speaker})
                t = end
        return out


class ClusteringDiarizer:
    """Multi-speaker diarization: energy VAD spans + MFCC-embedding
    clustering.

    The reference's pyannote pipeline distinguishes up to 4 speakers
    (DIARIZATION_CONFIG, config.py:67-72); this deterministic host-side
    equivalent clusters VAD spans by their mean-MFCC voice signature with
    k-means, picking k ∈ [min_speakers, max_speakers] by silhouette-style
    separation. Labels follow pyannote's SPEAKER_NN convention.
    """

    def __init__(
        self,
        segment_duration: float = 5.0,
        min_speech_duration: float = 0.5,
        min_pause_duration: float = 0.5,
        min_speakers: int = 1,
        max_speakers: int = 4,
    ):
        self._vad = EnergyVADDiarizer(
            segment_duration, min_speech_duration, min_pause_duration
        )
        self.min_speakers = min_speakers
        self.max_speakers = max_speakers

    def _embedding(self, clip: np.ndarray, sample_rate: int) -> np.ndarray:
        """Cheap voice signature: time-mean + std of 13 MFCCs (host numpy,
        scipy FFT — runs before any device work)."""
        import scipy.fft

        from msa_tpu.ops.audio_features import dct_matrix_ortho, mel_filterbank

        n_fft, hop, n_mels = 400, 200, 64
        if len(clip) < n_fft:
            clip = np.pad(clip, (0, n_fft - len(clip)))
        n = 1 + (len(clip) - n_fft) // hop
        idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
        frames = clip[idx] * np.hanning(n_fft + 1)[:-1]
        power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [n, freq]
        fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, 0.0, sample_rate / 2)
        mel = np.log10(np.maximum(power @ fb, 1e-10))
        mfcc = mel @ dct_matrix_ortho(13, n_mels)  # [n, 13]
        emb = np.concatenate([mfcc.mean(0), mfcc.std(0)])
        norm = np.linalg.norm(emb)
        return emb / (norm + 1e-8)

    @staticmethod
    def _kmeans(x: np.ndarray, k: int, iters: int = 25, seed: int = 0):
        rng = np.random.default_rng(seed)
        centers = x[rng.choice(len(x), size=k, replace=False)]
        labels = np.zeros(len(x), np.int64)
        for _ in range(iters):
            d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
            labels = d.argmin(1)
            for j in range(k):
                sel = labels == j
                if sel.any():
                    centers[j] = x[sel].mean(0)
        inertia = float(((x - centers[labels]) ** 2).sum())
        return labels, inertia

    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        segments = self._vad.diarize(waveform, sample_rate)
        if not segments:
            return segments
        if self.max_speakers <= 1 or len(segments) < 2:
            return segments

        embs = np.stack(
            [
                self._embedding(
                    waveform[int(s["start"] * sample_rate) : int(s["end"] * sample_rate)],
                    sample_rate,
                )
                for s in segments
            ]
        )
        k_max = min(self.max_speakers, len(segments))
        _, base_inertia = self._kmeans(embs, 1)
        best_labels = None
        # embeddings are L2-normalized: require real voice diversity before
        # clustering (same-voice spans have ~0 spread → single speaker)
        if base_inertia / len(segments) > 1e-3:
            # smallest k whose clusters explain ≥90% of the embedding
            # variance (single speaker: no k achieves it → stays 1)
            for k in range(max(self.min_speakers, 2), k_max + 1):
                labels, inertia = self._kmeans(embs, k)
                if inertia <= 0.1 * base_inertia and len(set(labels.tolist())) == k:
                    best_labels = labels
                    break
        if best_labels is None:
            return segments
        # stable label order: first-appearance gets SPEAKER_00, etc.
        remap: Dict[int, str] = {}
        for lbl in best_labels:
            if int(lbl) not in remap:
                remap[int(lbl)] = f"SPEAKER_{len(remap):02d}"
        for seg, lbl in zip(segments, best_labels):
            seg["speaker"] = remap[int(lbl)]
        return segments


class NeuralDiarizer:
    """Learned multi-speaker diarization: energy-VAD spans → batched
    on-device speaker embeddings → agglomerative clustering.

    The learned replacement for the reference's pyannote pipeline
    (offline_processor.py:62-66): a trained
    :class:`msa_tpu.models.speaker.SpeakerEmbeddingNet` maps fixed log-mel
    windows to L2-normalized embeddings (ALL windows of ALL spans in ONE
    jitted device call — static shapes), each span is the mean of its window
    embeddings, and spans merge by average-linkage cosine similarity until
    the best merge falls below ``threshold`` (bounded to
    [min_speakers, max_speakers]). Unlike ClusteringDiarizer's mean-MFCC
    k-means it separates same-pitch voices that differ only in timbre
    (tested in tests/test_diarization.py)."""

    def __init__(
        self,
        model,
        params,
        segment_duration: float = 5.0,
        min_speech_duration: float = 0.5,
        min_pause_duration: float = 0.5,
        min_speakers: int = 1,
        max_speakers: int = 4,
        threshold: float = 0.6,
    ):
        self._vad = EnergyVADDiarizer(
            segment_duration, min_speech_duration, min_pause_duration
        )
        self.model = model
        self.params = params
        self.min_speakers = min_speakers
        self.max_speakers = max_speakers
        self.threshold = threshold
        import jax

        # params are an ARGUMENT, never a closure: a closed-over device
        # array is embedded as an HLO constant at lowering, which FETCHES
        # it from the device mid-lowering — doing that on a worker thread
        # while the main thread drives the axon tunnel deadlocked the
        # overlapped labeling path (round-5 watchdog stack dump)
        self._embed = jax.jit(
            lambda p, w: self.model.embed_windows(p, w)
        )

    def _span_windows(
        self, waveform: np.ndarray, segments: List[Dict], sample_rate: int
    ) -> tuple:
        """Host-side window slicing → ([n_windows, window_samples] f32,
        owner span index per window)."""
        cfg = self.model.cfg
        ws = cfg.window_samples
        hop = ws // 2
        windows: List[np.ndarray] = []
        owners: List[int] = []
        for i, seg in enumerate(segments):
            lo = int(seg["start"] * sample_rate)
            hi = int(seg["end"] * sample_rate)
            clip = waveform[lo:hi]
            if len(clip) < ws:
                clip = np.pad(clip, (0, ws - len(clip)))
            for off in range(0, max(len(clip) - ws, 0) + 1, hop):
                windows.append(clip[off : off + ws])
                owners.append(i)
        return np.stack(windows).astype(np.float32), owners

    @staticmethod
    def _reduce_spans(
        embs: np.ndarray, owners: List[int], n_spans: int
    ) -> np.ndarray:
        """Window embeddings → per-span mean, L2-normalized [n_spans, D]."""
        out = np.zeros((n_spans, embs.shape[1]), np.float32)
        counts = np.zeros(n_spans, np.int64)
        for e, i in zip(embs, owners):
            out[i] += e
            counts[i] += 1
        out /= np.maximum(counts[:, None], 1)
        out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-8
        return out

    def _span_embeddings(
        self, waveform: np.ndarray, segments: List[Dict], sample_rate: int
    ) -> np.ndarray:
        """→ [n_spans, D] L2-normalized. Windows are sliced host-side into
        one [n_windows, window_samples] batch, embedded in one device call."""
        batch, owners = self._span_windows(waveform, segments, sample_rate)
        from msa_tpu.utils.device_sync import device_call

        # ONE lock hold across dispatch (may compile) + fetch
        embs = device_call(
            lambda: np.asarray(self._embed(self.params, batch))
        )  # [n_windows, D]
        return self._reduce_spans(embs, owners, len(segments))

    @staticmethod
    def _agglomerate(
        embs: np.ndarray, threshold: float, min_k: int, max_k: int
    ) -> np.ndarray:
        """Average-linkage agglomerative clustering on cosine similarity.
        Merges the most similar cluster pair while similarity ≥ threshold
        (or while over max_k); stops at min_k clusters."""
        n = len(embs)
        labels = np.arange(n)
        active = np.ones(n, bool)
        sizes = np.ones(n, np.float64)
        cent = embs.astype(np.float64).copy()

        def _unit(v: np.ndarray) -> np.ndarray:
            return v / (np.linalg.norm(v) + 1e-8)

        # full cosine-similarity matrix once, then one row/col update per
        # merge — O(n²) numpy per merge instead of Python-loop pair scans
        # (hour-long recordings produce hundreds of VAD spans)
        normed = cent / (np.linalg.norm(cent, axis=1, keepdims=True) + 1e-8)
        sim_m = normed @ normed.T
        np.fill_diagonal(sim_m, -2.0)
        k = n
        while k > max(min_k, 1):
            masked = np.where(np.outer(active, active), sim_m, -2.0)
            a, b = divmod(int(np.argmax(masked)), n)
            sim = float(masked[a, b])
            if sim <= -2.0:
                break
            if sim < threshold and k <= max_k:
                break
            a, b = min(a, b), max(a, b)
            total = sizes[a] + sizes[b]
            cent[a] = (cent[a] * sizes[a] + cent[b] * sizes[b]) / total
            sizes[a] = total
            active[b] = False
            labels[labels == b] = a
            normed[a] = _unit(cent[a])
            sim_m[a, :] = normed @ normed[a]
            sim_m[:, a] = sim_m[a, :]
            sim_m[a, a] = -2.0
            sim_m[b, :] = -2.0
            sim_m[:, b] = -2.0
            k -= 1
        # compact to 0..k-1 by first appearance
        remap: Dict[int, int] = {}
        out = np.empty(n, np.int64)
        for i, lbl in enumerate(labels):
            out[i] = remap.setdefault(int(lbl), len(remap))
        return out

    def segment_boundaries(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        """Phase 1 (host-only, cheap): VAD speech spans with placeholder
        speaker labels. Everything downstream of diarization EXCEPT the
        final per-speaker grouping needs only these boundaries (mid-frame
        times, audio windows, ASR clips) — so the offline processor runs
        phase 2 concurrently with video decode (VERDICT r4 #1: the embed
        round trip + clustering sat on the e2e critical path)."""
        return self._vad.diarize(waveform, sample_rate)

    def label_segments(
        self, waveform: np.ndarray, segments: List[Dict], sample_rate: int
    ) -> List[Dict]:
        """Phase 2 (device embed + clustering): assign speaker labels
        in-place. ``diarize`` = phase 1 + phase 2."""
        if len(segments) < 2 or self.max_speakers <= 1:
            return segments
        embs = self._span_embeddings(waveform, segments, sample_rate)
        labels = self._agglomerate(
            embs, self.threshold, self.min_speakers, self.max_speakers
        )
        for seg, lbl in zip(segments, labels):
            seg["speaker"] = f"SPEAKER_{int(lbl):02d}"
        return segments

    def label_segments_async(
        self, waveform: np.ndarray, segments: List[Dict], sample_rate: int
    ):
        """Phase 2 split for overlap: DISPATCH the embed graph now (with a
        non-blocking D2H copy of the result), return a ``finalize()`` the
        caller invokes later ON THE SAME THREAD (fast fetch + clustering +
        in-place label assignment, returns ``segments``).

        No worker thread anywhere: a fresh thread's first tunnel contact
        intermittently stalls ~5 min (device_sync wedge finding #3 — the
        original worker-thread labeling produced two watchdog dumps).
        The overlap comes from ``copy_async``: the embeddings stream back
        to the host while the caller decodes video."""
        if len(segments) < 2 or self.max_speakers <= 1:
            return lambda: segments
        batch, owners = self._span_windows(waveform, segments, sample_rate)
        from msa_tpu.utils.device_sync import copy_async, device_call, fetch

        embs_dev = device_call(self._embed, self.params, batch)
        copy_async(embs_dev)  # D2H streams back while the caller overlaps

        def finalize() -> List[Dict]:
            embs = self._reduce_spans(fetch(embs_dev), owners, len(segments))
            labels = self._agglomerate(
                embs, self.threshold, self.min_speakers, self.max_speakers
            )
            for seg, lbl in zip(segments, labels):
                seg["speaker"] = f"SPEAKER_{int(lbl):02d}"
            return segments

        return finalize

    def diarize_async(self, waveform: np.ndarray, sample_rate: int):
        """``diarize`` split for overlap: VAD + embed dispatch (plus a
        non-blocking D2H copy) happen NOW; the returned ``finalize()``
        (fast fetch + clustering) yields the labeled segments. Used by the
        streaming speaker match so its device round trip drains under the
        window's main dispatch+fetch instead of serializing before it —
        same thread, no worker (device_sync wedge finding #3)."""
        segments = self.segment_boundaries(waveform, sample_rate)
        return self.label_segments_async(waveform, segments, sample_rate)

    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        return self.label_segments(
            waveform, self.segment_boundaries(waveform, sample_rate), sample_rate
        )


class PyannoteDiarizer:
    """Adapter over pyannote.audio's pretrained pipeline — the reference's
    actual diarizer (reference ``offline_processor.py:62-66``, ``:96-116``),
    behind the same :class:`Diarizer` protocol as the in-repo
    implementations. Requires the ``pyannote.audio`` dependency and
    downloadable weights; :func:`make_diarizer` degrades to the shipped
    :class:`NeuralDiarizer` when either is missing, mirroring
    ``make_transcriber``'s HF-adapter symmetry.

    ``pipeline`` may be a prebuilt pyannote Pipeline object (used by tests
    to exercise the output-contract conversion without the dependency)."""

    def __init__(self, model: str = "pyannote/speaker-diarization",
                 hf_token: str | None = None, pipeline=None):
        if pipeline is None:
            from pyannote.audio import Pipeline  # type: ignore

            if hf_token is None:
                import os

                hf_token = os.environ.get("HF_TOKEN") or None
            pipeline = Pipeline.from_pretrained(model, use_auth_token=hf_token)
        self._pipe = pipeline

    def diarize(self, waveform: np.ndarray, sample_rate: int) -> List[Dict]:
        import torch

        annotation = self._pipe(
            {
                "waveform": torch.from_numpy(
                    np.asarray(waveform, np.float32)[None]
                ),
                "sample_rate": sample_rate,
            }
        )
        # exact reference conversion (offline_processor.py:108-116)
        return sorted(
            (
                {"start": float(t.start), "end": float(t.end), "speaker": spk}
                for t, _, spk in annotation.itertracks(yield_label=True)
            ),
            key=lambda s: s["start"],
        )


def make_diarizer(name: str, processing_config, diarization_config=None) -> Diarizer:
    """Factory keyed by DiarizationConfig.model."""
    if name in ("neural", "speaker-embedding"):
        import os

        from msa_tpu.utils.assets import resolve_asset

        weights = resolve_asset(
            diarization_config.speaker_weights if diarization_config else None
        )
        if weights and os.path.exists(weights):
            from msa_tpu.models.speaker import (
                SpeakerConfig,
                SpeakerEmbeddingNet,
                load_params,
            )

            model = SpeakerEmbeddingNet(SpeakerConfig())
            return NeuralDiarizer(
                model,
                load_params(model, weights),
                segment_duration=processing_config.segment_duration,
                min_speech_duration=processing_config.min_speech_duration,
                min_pause_duration=processing_config.min_pause_duration,
                min_speakers=diarization_config.min_speakers,
                max_speakers=diarization_config.max_speakers,
                threshold=getattr(diarization_config, "clustering_threshold", 0.6),
            )
        # no trained checkpoint on disk → deterministic clustering fallback
        # (keeps multi-speaker labeling, unlike the single-speaker VAD)
        name = "clustering"
    if name in ("fixed-window", "fixed"):
        return FixedWindowDiarizer(processing_config.segment_duration)
    if name in ("energy-vad", "vad"):
        return EnergyVADDiarizer(
            segment_duration=processing_config.segment_duration,
            min_speech_duration=processing_config.min_speech_duration,
            min_pause_duration=processing_config.min_pause_duration,
        )
    if name in ("clustering", "cluster", "multi-speaker"):
        kwargs = {}
        if diarization_config is not None:
            # the configured speaker bounds apply to the fallback too — a
            # max_speakers=2 config must never emit SPEAKER_03 labels
            kwargs = dict(
                min_speakers=diarization_config.min_speakers,
                max_speakers=diarization_config.max_speakers,
            )
        return ClusteringDiarizer(
            segment_duration=processing_config.segment_duration,
            min_speech_duration=processing_config.min_speech_duration,
            min_pause_duration=processing_config.min_pause_duration,
            **kwargs,
        )
    if name.startswith("pyannote"):
        try:
            return PyannoteDiarizer(name)
        except Exception:
            # dependency or weights unavailable → the shipped neural
            # diarizer (same drop-in symmetry as make_transcriber: the
            # in-repo model serves when the reference's pretrained one
            # can't) — it re-enters the factory under its own name so the
            # checkpoint-or-clustering resolution above applies unchanged
            return make_diarizer("neural", processing_config, diarization_config)
    return EnergyVADDiarizer(
        segment_duration=processing_config.segment_duration,
        min_speech_duration=processing_config.min_speech_duration,
        min_pause_duration=processing_config.min_pause_duration,
    )
