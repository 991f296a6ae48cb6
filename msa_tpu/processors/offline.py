"""Offline video processor — public API parity with the reference.

``OfflineProcessor(model_config, processing_config, hf_token).process_video
(video_path)`` returns the reference's per-speaker result list (reference
``src/processors/offline_processor.py:29-303``): grouping by speaker,
dominant emotion = mode, 3-consecutive-emotion patterns, per-segment raw
analysis dicts.

TPU-native execution model (the whole point of the rebuild):
- audio is extracted ONCE and segment windows are sliced from the in-memory
  waveform (the reference forks one ffmpeg subprocess per segment,
  offline_processor.py:140-147)
- mid-segment frames are decoded in ONE ordered pass (the reference reopens
  the video per segment, :161-168)
- ALL segments execute as batched jitted pipeline calls sharded over the
  device mesh's data axis; the reference runs a sequential Python loop
  (:254-257)

Reference defect D2 (its offline process_segment crashes on analyzer
signatures and dict misuse) is repaired by using the canonical streaming
feature-assembly path, as SURVEY §2.11 directs.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from msa_tpu.core import emotions
from msa_tpu.core.config import SystemConfig
from msa_tpu.host.diarization import make_diarizer
from msa_tpu.host.transcription import make_transcriber
from msa_tpu.host.video import VideoReader, extract_audio_track, preprocess_frame
from msa_tpu.models.text import completeness as text_completeness
from msa_tpu.models.text import relevance as text_relevance
from msa_tpu.parallel import mesh as mesh_lib
from msa_tpu.pipeline.graph import (
    PipelineModels,
    SegmentInputs,
    SegmentPipeline,
    pad_segment_inputs,
    unpack_hostpack,
)

logger = logging.getLogger(__name__)


class OfflineProcessor:
    def __init__(
        self,
        config: Optional[SystemConfig] = None,
        models: Optional[PipelineModels] = None,
        mesh=None,
        diarizer=None,
        transcriber=None,
        batch_size: Optional[int] = None,
    ):
        self.config = config or SystemConfig.from_env()
        self.config.ensure_directories()
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
        self.mesh = mesh if mesh is not None else mesh_lib.data_parallel_mesh()
        self.diarizer = diarizer or make_diarizer(
            self.config.diarization.model,
            self.config.processing,
            self.config.diarization,
        )
        self.transcriber = transcriber or make_transcriber(
            self.config.transcription.model,
            self.config.transcription.language,
            scale=self.config.pipeline.model_scale,
        )
        self.batch_size = batch_size or self.config.pipeline.batch_size
        # static token-length buckets — each compiles once, shortest
        # sufficient bucket wins per batch
        self.token_buckets = (32, 128, 512)
        # every dispatched batch is padded to ONE static shape (a multiple of
        # the data-mesh axis), so the final short batch reuses the compiled
        # graph instead of triggering a fresh compile
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS] if self.mesh else 1
        self._padded_batch = mesh_lib.pad_to_multiple(self.batch_size, n_data)
        self._n_data = n_data
        self._pipeline: Optional[SegmentPipeline] = None
        self._frame_hw = (480, 640)
        from msa_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()  # per-stage observability (SURVEY §5)

    def _pipeline_for(self, frame_hw) -> SegmentPipeline:
        if self._pipeline is None or self._frame_hw != frame_hw:
            self._frame_hw = frame_hw
            self._pipeline = SegmentPipeline(
                self.models, self.config, original_frame_hw=frame_hw, mesh=self.mesh
            )
            if self.config.pipeline.should_precompile():
                # compile every token bucket up front (VERDICT r1 #5): after
                # this, zero retraces — any batch hits a cached graph
                from msa_tpu.utils.device_sync import DEVICE_LOCK

                with self.timer.stage("precompile"), DEVICE_LOCK:
                    self._pipeline.warmup(
                        # the current video's (possibly auto-shrunk) static
                        # batch — set by _process before requesting the
                        # pipeline, so precompile warms the shapes that will
                        # actually dispatch
                        batch_sizes=(
                            getattr(self, "_warm_batch", None)
                            or self._padded_batch,
                        ),
                        token_buckets=self.token_buckets,
                        samples=self.config.pipeline.segment_samples,
                    )
        return self._pipeline

    def _video_padded_batch(self, n_segments: int) -> int:
        """Static padded batch for ONE video: the next power of two covering
        its segment count (floor 8), capped at the configured batch. A
        12-segment 60 s video runs a B=16 graph instead of paying the full
        B=64 compute + upload (5.3× waste measured on the bench e2e
        protocol); long videos keep the configured size. One video = one
        shape, so the jit cache still sees a handful of shapes total."""
        p = 8
        while p < n_segments:
            p *= 2
        return mesh_lib.pad_to_multiple(min(self._padded_batch, p), self._n_data)

    # ------------------------------------------------------------------

    def process_video(
        self,
        video_path: str,
        on_result: Optional[Callable[[Dict], None]] = None,
        on_error: Optional[Callable[[Exception], None]] = None,
        on_progress: Optional[Callable[[float], None]] = None,
    ) -> List[Dict]:
        """Analyze a whole video → per-speaker result list (reference
        offline_processor.py:235-303 schema: person/segments/dominant_emotion/
        emotion_segments/patterns/raw_analysis)."""
        t0 = time.perf_counter()
        try:
            results = self._process(video_path, on_progress)
        except Exception as e:  # degradation contract: surface, don't crash
            logger.error("process_video failed: %s", e, exc_info=True)
            if on_error:
                on_error(e)
                return []
            raise
        if on_result:
            for seg in results:
                on_result(seg)
        grouped = group_by_speaker(results)
        logger.info(
            "processed %s: %d segments, %d speakers in %.2fs",
            video_path,
            len(results),
            len(grouped),
            time.perf_counter() - t0,
        )
        self.timer.log_summary()
        return grouped

    # ------------------------------------------------------------------

    def _process(self, video_path: str, on_progress) -> List[Dict]:
        cfg = self.config
        sr = cfg.audio.sample_rate
        samples = cfg.pipeline.segment_samples

        with VideoReader(video_path) as video:
            frame_hw = (video.height, video.width)

            with self.timer.stage("audio_extract"):
                audio = extract_audio_track(video_path, cfg.dirs.temp_dir, sr)
            audio_avail = audio is not None
            waveform = audio[0] if audio_avail else np.zeros(0, np.float32)

            label_finalize = None
            if audio_avail and len(waveform) > 0:
                if hasattr(self.diarizer, "segment_boundaries") and hasattr(
                    self.diarizer, "label_segments"
                ):
                    # two-phase diarization: boundaries (host VAD) now —
                    # they are all the batch loop needs — speaker LABELING
                    # dispatches its device embed here (async, with a
                    # non-blocking D2H copy) and finalizes (fast fetch +
                    # clustering) before the results phase, taking its
                    # round trip off the e2e critical path WITHOUT a worker
                    # thread (device_sync: a fresh thread's first tunnel
                    # contact can wedge ~5 min)
                    with self.timer.stage("diarize"):
                        segments = self.diarizer.segment_boundaries(waveform, sr)
                    if segments:
                        if hasattr(self.diarizer, "label_segments_async"):
                            label_finalize = self.diarizer.label_segments_async(
                                waveform, segments, sr
                            )
                        else:
                            import functools

                            label_finalize = functools.partial(
                                self.diarizer.label_segments,
                                waveform,
                                segments,
                                sr,
                            )
                else:
                    with self.timer.stage("diarize"):
                        segments = self.diarizer.diarize(waveform, sr)
                if not segments:
                    # diarizer found no speech turns; still analyze the video
                    # in fixed windows (degradation contract — never return
                    # nothing for non-empty media)
                    from msa_tpu.host.diarization import FixedWindowDiarizer

                    segments = FixedWindowDiarizer(
                        cfg.processing.segment_duration
                    ).diarize(waveform, sr)
            else:
                # no audio track → fixed windows over the video timeline
                from msa_tpu.host.diarization import FixedWindowDiarizer

                segments = FixedWindowDiarizer(
                    cfg.processing.segment_duration
                ).diarize(np.zeros(int(video.duration * sr), np.float32), sr)
            if not segments:
                return []

            mid_times = [(s["start"] + s["end"]) / 2 for s in segments]

            self._warm_batch = self._video_padded_batch(len(segments))
            pipeline = self._pipeline_for(frame_hw)
            size = self.models.landmark.cfg.frame_size
            token_cap = min(cfg.text.max_length, self.models.text.cfg.max_positions)

            import jax

            n = len(segments)
            seg_results: List[Dict] = []
            pending: List[tuple] = []  # (batch, transcripts, fetch future)
            # previous batch's (batch, transcripts, device hostpack) whose
            # fetch submission is deferred past the next dispatches (step 3)
            deferred = None
            prev_landmarks = np.zeros(
                (self.models.landmark.cfg.landmark_count, 3), np.float32
            )
            has_prev = np.asarray(False)

            # one-batch-ahead frame decode: cv2 releases the GIL, so decoding
            # batch k+1 overlaps the device dispatch/wait of batch k (decode
            # was 70% of steady-state wall time before this)
            import concurrent.futures

            decode_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
            batch_ranges = list(range(0, n, self.batch_size))

            def _decode(lo: int):
                hi = min(lo + self.batch_size, n)
                return video.frames_at(mid_times[lo:hi])

            # EVERY batch's decode is queued upfront (they are independent
            # sequential passes over ascending timestamps): the decode
            # worker fills the core during the main thread's tunnel waits
            # (whisper collect, dispatch round trips) instead of idling
            # until the next batch's wait begins
            decode_futures = [decode_pool.submit(_decode, lo) for lo in batch_ranges]
            video_padded = self._video_padded_batch(n)

            for bi, lo in enumerate(batch_ranges):
                batch = segments[lo : lo + self.batch_size]
                b = len(batch)
                # frames are awaited in the MIDDLE of host prep: whisper and
                # the audio upload are dispatched first (both asynchronous on
                # the device/tunnel), so their device time hides under the
                # cv2 decode wait; transcripts are collected after.

                # 1) audio windows → ONE int16 upload (async) shared by the
                # main pipeline AND whisper: ship as int16 PCM (the WAV's
                # native precision): half the transfer, converted back on
                # device. Padded to the video's static batch and device_put
                # HERE — the upload (the largest host→device transfer,
                # ~160 KB/segment) runs under the frame-decode wait below
                audio_dev = None
                if audio_avail:
                    # native batched windower (C++ runtime): all segment windows
                    # in one call instead of a Python slicing loop
                    from msa_tpu.runtime import slice_windows

                    with self.timer.stage("audio_window"):
                        starts = np.asarray(
                            [int(s["start"] * sr) for s in batch], np.int64
                        )
                        ends = np.asarray(
                            [int(s["end"] * sr) for s in batch], np.int64
                        )
                        windows = slice_windows(waveform, starts, ends, samples)
                        pcm = np.clip(windows * 32768.0, -32768, 32767).astype(
                            np.int16
                        )
                        if pcm.shape[0] < video_padded:
                            pcm = np.pad(
                                pcm, [(0, video_padded - pcm.shape[0]), (0, 0)]
                            )
                        from msa_tpu.utils.device_sync import device_call

                        audio_dev = device_call(jax.device_put, pcm)

                # 2) DISPATCH transcription (async): the whisper mel+decode
                # graph starts on the device now; its results are fetched
                # only after the frame-decode wait below (VERDICT r4 weak
                # #1: this used to run serially while the decode thread
                # idled). The resident path feeds whisper the device array
                # just uploaded — zero extra host bytes/prep — and starts a
                # non-blocking D2H copy of the result, so the tunnel round
                # trip ALSO drains under the decode wait (no worker thread:
                # device_sync wedge finding #3).
                asr_handles = None
                clips: List = []
                if audio_avail and hasattr(self.transcriber, "dispatch_resident"):
                    with self.timer.stage("transcribe_dispatch"):
                        asr_handles = self.transcriber.dispatch_resident(
                            audio_dev, b
                        )
                elif audio_avail:
                    clips = [
                        waveform[int(s["start"] * sr) : int(s["end"] * sr)]
                        for s in batch
                    ]
                    if hasattr(self.transcriber, "dispatch_batch"):
                        try:
                            with self.timer.stage("transcribe_dispatch"):
                                asr_handles = self.transcriber.dispatch_batch(
                                    clips, sr
                                )
                        except Exception as e:
                            logger.warning("ASR dispatch failed: %s", e)
                            asr_handles = None

                # 3) frame-decode wait — whisper decode + audio upload are
                # in flight while cv2 finishes; the whisper result's D2H
                # copy (started at dispatch) drains here too
                with self.timer.stage("decode_wait"):
                    frames = decode_futures[bi].result()
                # preprocess frames BEFORE collecting transcripts: host
                # resize/convert time gives the whisper decode a little more
                # room to finish before its fetch blocks
                with self.timer.stage("frame_preprocess"):
                    pre_frames = [preprocess_frame(f, size) for f in frames]

                # 4) collect transcripts — the resident path's packed result
                # streamed back during the decode wait (copy_async), so the
                # fetch inside collect_batch is ~instant
                transcripts: List[str] = []
                if audio_avail and asr_handles is not None:
                    try:
                        with self.timer.stage("transcribe"):
                            transcripts = list(
                                self.transcriber.collect_batch(asr_handles)
                            )
                    except Exception as e:
                        logger.warning("batched transcription failed: %s", e)
                        transcripts = [""] * b
                elif audio_avail and hasattr(self.transcriber, "transcribe_batch"):
                    try:
                        with self.timer.stage("transcribe"):
                            transcripts = list(
                                self.transcriber.transcribe_batch(clips, sr)
                            )
                    except Exception as e:
                        logger.warning("batched transcription failed: %s", e)
                        transcripts = [""] * b
                elif audio_avail:
                    for clip in clips:
                        try:
                            with self.timer.stage("transcribe"):
                                transcripts.append(
                                    self.transcriber.transcribe(clip, sr)
                                )
                        except Exception as e:
                            # degradation contract: transcription failure →
                            # empty transcript → default text analysis
                            # (reference offline_processor.py:204-208)
                            logger.warning("transcription failed: %s", e)
                            transcripts.append("")
                else:
                    transcripts = [""] * b
                encodings = [
                    self.models.tokenizer.encode(text, token_cap)
                    if text and text.strip()
                    else None
                    for text in transcripts
                ]
                # sequence-length bucketing: transcripts of 5 s segments are
                # short; paying the full 512-token attention for them wastes
                # ~4× text FLOPs. Pads beyond the bucket carry no information
                # (padding-invariance is tested), so one extra compiled shape
                # per bucket buys the savings.
                needed = max((int(m.sum()) for _, m in filter(None, encodings)), default=1)
                tokens = next(
                    (t for t in self.token_buckets if needed <= t <= token_cap), token_cap
                )

                inp = SegmentInputs.zeros(self.models, b, samples=samples, tokens=tokens)
                if audio_dev is not None:
                    inp.audio = audio_dev
                for i, seg in enumerate(batch):
                    if not audio_avail:
                        inp.audio_avail[i] = False
                    text = transcripts[i]
                    if encodings[i] is not None:
                        ids, mask = encodings[i]
                        inp.token_ids[i] = ids[:tokens]
                        inp.token_mask[i] = mask[:tokens]
                        inp.completeness[i] = text_completeness(text)
                        inp.relevance[i] = text_relevance(text)
                    else:
                        # empty transcript → default text analysis participates in
                        # fusion (reference offline path: analyze("") → default →
                        # still fused 3-way, text_analyzer.py:66-68)
                        inp.text_avail[i] = False
                for i in range(b):
                    inp.frames[i] = pre_frames[i]
                inp.prev_landmarks = prev_landmarks
                inp.has_prev = has_prev

                n_data = self.mesh.shape[mesh_lib.DATA_AXIS] if self.mesh else 1
                inp_padded, real = pad_segment_inputs(
                    inp, n_data, to=video_padded
                )
                from msa_tpu.utils.device_sync import device_call

                with self.timer.stage("dispatch"):
                    out, _carry = device_call(pipeline.run_host, inp_padded)
                # The movement carry stays ON DEVICE: the next batch's dispatch
                # chains on these values without a host round trip, so host prep
                # of batch k+1 (decode/tokenize/windows) overlaps device compute
                # of batch k. Padded dummy rows must not feed the history, hence
                # the slice at the last REAL row.
                prev_landmarks = out["landmarks"][real - 1]
                has_prev = out["detected"][real - 1]
                # ONE array per batch: the graph concatenates every column
                # the host reads into out["hostpack"] (pipeline/graph.py
                # _PACK_FIELDS) — an 8-leaf device_get measured 248 ms on
                # the axon tunnel (~30 ms/leaf round trip) for ~56 KB of
                # actual data; one leaf is ~30 ms total. A non-blocking D2H
                # copy starts NOW; the results-phase fetch finds the bytes
                # already on the host (device_sync.copy_async).
                from msa_tpu.utils.device_sync import copy_async

                copy_async(out["hostpack"])
                pending.append((batch, transcripts, out["hostpack"]))
                if on_progress:
                    on_progress(0.5 * min((lo + b) / n, 1.0))
            decode_pool.shutdown(wait=True)

        # finalize the overlapped speaker labeling BEFORE results are read:
        # the embed result streamed back via copy_async during the batch
        # loop, so this is a fast fetch + clustering, in-place assignment
        if label_finalize is not None:
            with self.timer.stage("diarize_label_wait"):
                try:
                    label_finalize()
                except Exception as e:
                    # labels stay at the VAD placeholder — same degradation
                    # as a failing clustering pass
                    logger.warning("speaker labeling failed: %s", e)

        # fetch phase: collect the async-copied hostpacks in dispatch order
        from msa_tpu.utils.device_sync import fetch

        for batch, transcripts, hostpack_dev in pending:
            b = len(batch)
            with self.timer.stage("fetch"):
                cols = unpack_hostpack(fetch(hostpack_dev)[:b])
            fused, f27 = cols["fused"], cols["face27"]
            a31, t783 = cols["audio31"], cols["text783"]
            fp, ap = cols["face_probs_raw"], cols["audio_probs_raw"]
            tp, combo = cols["text_probs_raw"], cols["combo"][:, 0]
            for i, seg in enumerate(batch):
                fused_vec = fused[i]
                if int(combo[i]) == 0:
                    # nothing available at all (padded row or every modality
                    # failed): 'neutro', matching the evaluator's unknown
                    # default — argmax over a uniform vector would
                    # deterministically claim PT_UI[0]='feliz'
                    label = "neutro"
                elif int(combo[i]) in (0b100, 0b010, 0b001):
                    # <2 modalities: fuse_combo passes the single modality's
                    # post-LN slice through — its entries are NOT in the fused
                    # head's taxonomy, so argmax-as-PT_UI would mislabel
                    # (round-1 advisor finding). Label from the modality's
                    # true probability vector instead, reordered into the
                    # UI convention.
                    single = {0b100: fp, 0b010: ap, 0b001: tp}[int(combo[i])]
                    probs_pt = emotions.reorder_np(
                        single[i], emotions.CANONICAL_TO_PT_UI
                    )
                    label = emotions.PT_UI[int(np.argmax(probs_pt))]
                else:
                    # argmax label in the reference's UI convention
                    # (examples/streaming_example.py:23-25)
                    label = emotions.PT_UI[int(np.argmax(fused_vec))]
                seg_results.append(
                    {
                        # reference process_segment dict schema
                        # (offline_processor.py:223-233)
                        "start": seg["start"],
                        "end": seg["end"],
                        "speaker": seg["speaker"],
                        "face_vec": f27[i].tolist(),
                        "audio_vec": a31[i].tolist(),
                        "text_vec": t783[i].tolist(),
                        # true per-modality probability vectors (CANONICAL
                        # order) — valid distributions for pseudo-labeling
                        # (training/preprocess_ami.py), unlike the post-LN
                        # slices in *_vec
                        "face_probs": fp[i].tolist(),
                        "audio_probs": ap[i].tolist(),
                        "text_probs": tp[i].tolist(),
                        "transcript": transcripts[i],
                        "fused_vec": fused_vec.tolist(),
                        "fused_emotion": label,
                        # rebuild addition: the modality-availability bitmask
                        # (face=4, audio=2, text=1) — lets consumers (e.g.
                        # the evaluator's score-based AUC) know when
                        # fused_vec is a raw single-modality slice rather
                        # than fused-head logits
                        "modalities": int(combo[i]),
                    }
                )
            if on_progress:
                on_progress(0.5 + 0.5 * min(len(seg_results) / n, 1.0))
        return seg_results


def export_speaker_analysis(speaker: Dict, weights: Optional[Dict] = None) -> Dict:
    """Export one grouped speaker result in the JSON schema the reference's
    README documents (reference README.md:127-180) but its code never
    actually produces: segments with per-modality analysis dicts, a fused
    analysis with confidence + modality weights, average_confidence and an
    emotion_timeline."""
    weights = weights or {"face": 0.4, "audio": 0.3, "text": 0.3}

    def _softmax(v):
        v = np.asarray(v, np.float64)
        e = np.exp(v - v.max())
        return e / e.sum()

    segments = []
    confidences = []
    timeline = []
    for r in speaker["raw_analysis"]:
        face = np.asarray(r["face_vec"])
        audio = np.asarray(r["audio_vec"])
        text = np.asarray(r["text_vec"])
        fused_probs = _softmax(r["fused_vec"])
        conf = float(fused_probs.max())
        confidences.append(conf)
        timeline.append(
            {"time": r["start"], "emotion": r["fused_emotion"], "confidence": conf}
        )
        segments.append(
            {
                "start_time": r["start"],
                "end_time": r["end"],
                "face_analysis": {
                    "emotion_probs": face[:7].tolist(),
                    "micro_expressions": face[7:12].tolist(),
                    "gaze_direction": face[12:15].tolist(),
                    "muscle_tension": face[15:19].tolist(),
                    "movement_patterns": face[19:23].tolist(),
                },
                "audio_analysis": {
                    "emotion_probs": audio[:8].tolist(),
                    "pitch": float(audio[8]),
                    "intensity": float(audio[9]),
                    "timbre": audio[10:23].tolist(),
                    "speech_rate": float(audio[23]),
                    "rhythm": audio[24:27].tolist(),
                },
                "text_analysis": {
                    "emotion_probs": text[:7].tolist(),
                    "sarcasm_score": float(text[7]),
                    "humor_score": float(text[8]),
                    "polarity": float(text[9]),
                    "intensity": float(text[10]),
                    "context_embedding": text[11:779].tolist(),
                },
                "fused_analysis": {
                    "emotion_probs": fused_probs.tolist(),
                    "confidence": conf,
                    "face_weight": weights["face"],
                    "audio_weight": weights["audio"],
                    "text_weight": weights["text"],
                },
                "transcript": r["transcript"],
                "confidence": conf,
                "dominant_emotion": r["fused_emotion"],
            }
        )
    return {
        "speaker_id": speaker["person"],
        "segments": segments,
        "dominant_emotion": speaker["dominant_emotion"],
        "emotion_patterns": speaker["patterns"],
        "average_confidence": float(np.mean(confidences)) if confidences else 0.0,
        "emotion_timeline": timeline,
    }


def group_by_speaker(results: List[Dict]) -> List[Dict]:
    """Group per-segment results by speaker — exact reference aggregation
    (offline_processor.py:259-303): dominant = modal emotion, patterns = 3
    identical consecutive emotions with the reference's Portuguese string."""
    speakers: Dict[str, Dict] = {}
    for r in results:
        s = speakers.setdefault(
            r["speaker"],
            {
                "person": r["speaker"],
                "segments": [],
                "dominant_emotion": None,
                "emotion_segments": [],
                "patterns": [],
                "raw_analysis": [],
            },
        )
        s["segments"].append({"start": r["start"], "end": r["end"]})
        s["emotion_segments"].append(
            {
                "time": [r["start"], r["end"]],
                "emotion": r["fused_emotion"],
                "vector": r["fused_vec"],
            }
        )
        s["raw_analysis"].append(r)

    for s in speakers.values():
        emos = [e["emotion"] for e in s["emotion_segments"]]
        s["dominant_emotion"] = max(set(emos), key=emos.count)
        for i in range(len(emos) - 2):
            if emos[i] == emos[i + 1] == emos[i + 2]:
                s["patterns"].append(
                    f"Emoção consistente '{emos[i]}' nos segmentos {i + 1}-{i + 3}"
                )
    return list(speakers.values())
