"""The end-to-end segment graph — ONE jitted XLA program per batch.

This is the TPU-native replacement for the reference's per-segment Python
orchestration (reference ``src/processors/offline_processor.py:171-233`` and
``src/processors/streaming_processor.py:170-377``), which pays per segment:
5 FaceMesh passes, 1 DeepFace CNN, 1 wav2vec2 forward, 2 MFCC transforms,
5 BERT forwards and 1 fusion forward, each a separate host↔device round trip
(SURVEY §6). Here a whole batch of segments executes as one compiled graph:

    frames[B,S,S,3] ─ landmark net ─ geometry ops ─ crop ─ emotion CNN ┐
    audio[B,80000] ── DSP stack ──── audio encoder ────────────────────┤→ 27/31/783
    tokens[B,512] ─── BERT trunk ─── 4 heads + CLS + coherence ────────┘     │
                                                             fusion MLP ← combo
                                                                 │
                       face27/audio31/text783 slices + fused7 logits out

Feature assembly follows the canonical streaming path exactly
(streaming_processor.py:230-300): per-modality raw concat → pad+LayerNorm
normalizer → slice back → append raw quality/position scalars → nan_to_num →
fusion. Missing modalities take the reference's *default analysis* vectors
(face_analyzer.py:476-490, audio_analyzer.py:331-345, text_analyzer.py:
305-319 — raw, NOT LayerNormed) and the fusion combo index drops them from
the fused path, reproducing the 1/2/3-modality dispatch without retracing.

Movement state: landmarks are computed for the whole batch, then shifted by
one segment along the batch axis (equivalent to the reference's cross-segment
frame history, face_analyzer.py:352-383) with an explicit carry for the
first row, so streaming (B=1) and offline (B=n) share the graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.core import emotions
from msa_tpu.core.config import SystemConfig
from msa_tpu.models.audio import AudioEmotionModel, AudioModelConfig
from msa_tpu.models.face import (
    FaceEmotionCNN,
    FaceLandmarkNet,
    FaceModelConfig,
    bilinear_crop_resize,
    rgb_to_gray,
)
from msa_tpu.models.fusion import FusionMLP
from msa_tpu.models.text import TextModel, TextModelConfig, WordPieceTokenizer
from msa_tpu.ops import audio_features as AF
from msa_tpu.ops import face_features as FF
from msa_tpu.ops.normalization import normalize_audio, normalize_face, normalize_text
from msa_tpu.models import fusion as fusion_lib
from msa_tpu.models import face as face_lib
from msa_tpu.models import audio as audio_lib
from msa_tpu.models import text as text_lib


@dataclasses.dataclass
class PipelineModels:
    """All model modules + params of the flagship multimodal pipeline."""

    landmark: FaceLandmarkNet
    landmark_params: Any
    face_cnn: FaceEmotionCNN
    face_cnn_params: Any
    audio: AudioEmotionModel
    audio_params: Any
    text: TextModel
    text_params: Any
    fusion: FusionMLP
    fusion_params: Any
    tokenizer: WordPieceTokenizer

    @classmethod
    def initialize(
        cls,
        seed: int = 0,
        face_cfg: Optional[FaceModelConfig] = None,
        audio_cfg: Optional[AudioModelConfig] = None,
        text_cfg: Optional[TextModelConfig] = None,
        fusion: Optional[FusionMLP] = None,
        fusion_params: Any = None,
        quantize: Optional[str] = None,
        text_params: Any = None,
        audio_params: Any = None,
        fusion_checkpoint: Optional[str] = None,
    ) -> "PipelineModels":
        """``text_params``/``audio_params`` drop in pretrained encoder weights
        (e.g. from :func:`msa_tpu.models.text.params_from_hf_bert` /
        :func:`msa_tpu.models.audio.params_from_hf_wav2vec2`). Passing either
        flips the default serving precision to the PARITY mode — float32
        matmuls, ``quantize="none"`` — because imported weights carry the
        drop-in numerics contract (outputs ≤1e-3 of the source model,
        PARITY.md strategy #3, established by the f32 ≤1e-4 HF-equivalence
        tests), which int8's ~1% and bf16's ~1e-2 relative error would break.
        An explicit ``quantize=``/``MSA_QUANTIZE`` still wins and keeps the
        bf16 serving recipe.
        """
        from msa_tpu.models.transformer import EncoderConfig

        # Production encoder recipe: bfloat16 matmuls on the MXU, the fused
        # Pallas attention-block + FFN kernels, and the W8A8 int8 serving
        # mode for the projection/FFN matmuls (~1.8× MXU rate; median ~1%
        # relative output error vs f32, tests/test_pallas_*). Feature math
        # and the fusion MLP stay f32 (they carry the 1e-3 parity contract);
        # random-init encoders are our own models, so precision is a serving
        # choice — pass quantize="none" (or MSA_QUANTIZE=none) for full bf16.
        import logging
        import os

        logger = logging.getLogger(__name__)
        imported = text_params is not None or audio_params is not None
        explicit = quantize or os.environ.get("MSA_QUANTIZE")
        quantize = explicit or ("none" if imported else "int8")
        parity_mode = imported and not explicit
        logger.info(
            "encoder serving precision: %s, quantize=%s%s",
            "float32" if parity_mode else "bfloat16",
            quantize,
            " (imported weights → parity mode; pass quantize=/MSA_QUANTIZE "
            "to keep the bf16/int8 serving recipe)" if parity_mode else "",
        )
        prod_enc = EncoderConfig(
            compute_dtype="float32" if parity_mode else "bfloat16",
            attention_impl="pallas",
            ffn_impl="pallas",
            quantize=quantize,
        )
        face_cfg = face_cfg or FaceModelConfig()
        audio_cfg = audio_cfg or AudioModelConfig(encoder=prod_enc)
        text_cfg = text_cfg or TextModelConfig(encoder=prod_enc)
        landmark = FaceLandmarkNet(face_cfg)
        face_cnn = face_lib.make_emotion_cnn(face_cfg)
        audio = AudioEmotionModel(audio_cfg)
        text = TextModel(text_cfg)
        from msa_tpu.utils.assets import resolve_asset

        if fusion is None and fusion_params is None:
            # Trained fusion weights: the configured checkpoint (reference
            # ModelConfig.fusion_checkpoint, a user-trained
            # ``checkpoints/best_model.msgpack`` from training/train_fusion.py)
            # wins when it exists; else the SHIPPED checkpoint (trained on
            # real-pipeline extractions of synthetic AV meetings — VERDICT r2
            # missing #4). Explicit fusion=/fusion_params= args take
            # precedence over both.
            for rel in (fusion_checkpoint, "checkpoints/fusion.msgpack"):
                if not rel:
                    continue
                fck = resolve_asset(rel, warn=rel != fusion_checkpoint)
                if not (fck and os.path.exists(fck)):
                    continue
                try:
                    fusion, fusion_params, _ = fusion_lib.load_checkpoint(
                        fck, create_if_missing=False
                    )
                    fusion_params = jax.device_put(fusion_params)
                    break
                except Exception as e:
                    logger.warning(
                        "fusion checkpoint %s failed to load (%s); trying next",
                        fck,
                        e,
                    )
                    fusion = None
        fusion = fusion or FusionMLP()
        if fusion_params is None:
            fusion_params = fusion_lib.init_params(fusion, seed)
        # pretrained face assets drop in when configured (the reference's
        # face path was pretrained MediaPipe + DeepFace; see
        # face_lib.params_from_keras_fer / training.train_landmarks)

        from msa_tpu.utils.assets import resolve_asset

        landmark_params = None
        lm_w = resolve_asset(face_cfg.landmark_weights)
        if lm_w and os.path.exists(lm_w):
            try:
                landmark_params = face_lib.load_landmark_weights(landmark, lm_w)
            except Exception as e:
                # the default points at the repo-shipped full-size
                # checkpoint; a CUSTOM architecture (different backbone /
                # frame size) must degrade to random init, not crash
                logger.warning(
                    "landmark weights %s don't fit this config (%s); "
                    "random init",
                    lm_w,
                    e,
                )
        if landmark_params is None:
            landmark_params = face_lib.init_landmark_params(landmark, seed)
        face_cnn_params = None
        emo_w = resolve_asset(face_cfg.emotion_weights)
        if emo_w and os.path.exists(emo_w):
            try:
                face_cnn_params = face_lib.load_emotion_weights(face_cnn, emo_w)
            except Exception as e:
                logger.warning(
                    "emotion weights %s don't fit this config (%s); "
                    "random init",
                    emo_w,
                    e,
                )
        if face_cnn_params is None:
            face_cnn_params = face_lib.init_emotion_params(face_cnn, seed + 1)
        if audio_params is None:
            audio_params = audio_lib.init_params(audio, seed + 2, samples=8000)
            head_w = resolve_asset(audio_cfg.head_weights)
            if head_w and os.path.exists(head_w):
                # prosody-trained 4-class head over this exact deterministic
                # trunk (training.train_audio_emotion) — the audio analogue
                # of the shipped face/landmark checkpoints
                try:
                    from msa_tpu.training.train_audio_emotion import load_head

                    head = load_head(head_w)
                    if "pool" not in head:  # bare linear head format
                        head = {"emotion_head": head}
                    audio_params = dict(audio_params)
                    for sub, tree in head.items():
                        want = jax.tree_util.tree_map(
                            lambda x: tuple(x.shape), audio_params[sub]
                        )
                        got = jax.tree_util.tree_map(
                            lambda x: tuple(x.shape), tree
                        )
                        if want != got:
                            raise ValueError(
                                f"{sub} shapes {got} != model {want}"
                            )
                        audio_params[sub] = jax.device_put(tree)
                except Exception as e:
                    logger.warning(
                        "audio emotion head %s doesn't fit this config "
                        "(%s); random init",
                        head_w,
                        e,
                    )
        if text_params is None:
            text_params = text_lib.init_params(text, seed + 3)
            th_w = resolve_asset(text_cfg.head_weights)
            if th_w and os.path.exists(th_w):
                # lexicon-trained classification heads over this exact
                # deterministic trunk (training.train_text_heads) — the text
                # analogue of the shipped audio head
                try:
                    from msa_tpu.training.train_text_heads import load_heads

                    heads = load_heads(th_w)
                    text_params = dict(text_params)
                    for name, tree in heads.items():
                        want = jax.tree_util.tree_map(
                            lambda x: tuple(x.shape), text_params[name]
                        )
                        got = jax.tree_util.tree_map(
                            lambda x: tuple(x.shape), tree
                        )
                        if want != got:
                            raise ValueError(
                                f"{name} shapes {got} != model {want}"
                            )
                        text_params[name] = jax.device_put(tree)
                except Exception as e:
                    logger.warning(
                        "text heads %s don't fit this config (%s); "
                        "random init",
                        th_w,
                        e,
                    )
        return cls(
            landmark=landmark,
            landmark_params=landmark_params,
            face_cnn=face_cnn,
            face_cnn_params=face_cnn_params,
            audio=audio,
            audio_params=audio_params,
            text=text,
            text_params=text_params,
            fusion=fusion,
            fusion_params=fusion_params,
            tokenizer=WordPieceTokenizer(vocab_size=text_cfg.vocab_size),
        )

    @classmethod
    def tiny(cls, seed: int = 0) -> "PipelineModels":
        """Test-scale models — same graph, fast compile."""
        return cls.initialize(
            seed,
            face_cfg=FaceModelConfig.tiny(),
            audio_cfg=AudioModelConfig.tiny(),
            text_cfg=TextModelConfig.tiny(),
            fusion=FusionMLP(hidden_dim=64),
        )

    def params_tree(self) -> Dict[str, Any]:
        return {
            "landmark": self.landmark_params,
            "face_cnn": self.face_cnn_params,
            "audio": self.audio_params,
            "text": self.text_params,
            "fusion": self.fusion_params,
        }


@dataclasses.dataclass
class SegmentInputs:
    """One batch of segments, static shapes (all numpy/jax arrays)."""

    frames: Any  # [B, S, S, 3] f32 in [0,1] (resized on host)
    audio: Any  # [B, T] f32 waveform (fixed 5 s window, zero-padded)
    token_ids: Any  # [B, L] i32
    token_mask: Any  # [B, L] i32
    face_avail: Any  # [B] bool — host-level availability (exception → False)
    audio_avail: Any  # [B] bool
    text_avail: Any  # [B] bool (empty transcript → False, text default used)
    completeness: Any  # [B] f32 host text heuristic (text_analyzer.py:275-287)
    relevance: Any  # [B] f32 host text heuristic (text_analyzer.py:289-303)
    prev_landmarks: Any  # [478, 3] carry for the first row
    has_prev: Any  # [] bool carry

    @staticmethod
    def zeros(models: "PipelineModels", batch: int, samples: int = 80_000, tokens: int = 512):
        s = models.landmark.cfg.frame_size
        lc = models.landmark.cfg.landmark_count
        return SegmentInputs(
            # uint8 RGB: 4× less host→device transfer; the graph converts
            frames=np.zeros((batch, s, s, 3), np.uint8),
            audio=np.zeros((batch, samples), np.float32),
            token_ids=np.zeros((batch, tokens), np.int32),
            token_mask=np.zeros((batch, tokens), np.int32),
            face_avail=np.ones((batch,), bool),
            audio_avail=np.ones((batch,), bool),
            text_avail=np.ones((batch,), bool),
            completeness=np.zeros((batch,), np.float32),
            relevance=np.zeros((batch,), np.float32),
            prev_landmarks=np.zeros((lc, 3), np.float32),
            has_prev=np.asarray(False),
        )


_BATCH_FIELDS = (
    "frames",
    "audio",
    "token_ids",
    "token_mask",
    "face_avail",
    "audio_avail",
    "text_avail",
    "completeness",
    "relevance",
)
_CARRY_FIELDS = ("prev_landmarks", "has_prev")

# --- host-fetch packing ------------------------------------------------------
# Under the axon tunnel every fetched array is its own ~30 ms round trip
# (measured round 4: an 8-leaf device_get cost 248 ms on a 60 s video where
# the data itself is ~56 KB). The graph therefore concatenates EVERYTHING any
# host consumer reads into ONE [B, 1715] f32 row per segment — offline's
# result-dict columns (nan_to_num'd, matching the fusion inputs) AND the
# streaming output-dict columns (the raw branch dicts) — so both processors
# fetch exactly one array per batch. 841 duplicated f32 per row cost ~3 KB of
# extra fetch bytes, i.e. microseconds, vs ~7 round trips saved.
_PACK_FIELDS = (
    ("fused", 7),
    ("face27", 27),  # nan_to_num'd (offline *_vec / streaming fallback)
    ("audio31", 31),
    ("text783", 783),
    ("face_probs_raw", 7),  # CANONICAL-order true probabilities
    ("audio_probs_raw", 7),
    ("text_probs_raw", 7),
    ("combo", 1),  # modality bitmask as f32
    ("s_face27", 27),  # pre-nan branch outputs (streaming dict contract)
    ("s_face_quality", 4),
    ("s_audio31", 31),
    ("s_text783", 783),
)
PACK_WIDTH = sum(d for _, d in _PACK_FIELDS)
_PACK_SLICES = {}
_off = 0
for _name, _d in _PACK_FIELDS:
    _PACK_SLICES[_name] = slice(_off, _off + _d)
    _off += _d


def unpack_hostpack(pack: np.ndarray) -> Dict[str, np.ndarray]:
    """Fetched ``out["hostpack"]`` [B, 1715] → named column views (no copy)."""
    return {name: pack[:, sl] for name, sl in _PACK_SLICES.items()}


def pack_stream_inputs(
    frames_u8: np.ndarray,
    audio_i16: np.ndarray,
    token_ids: np.ndarray,
    token_mask: np.ndarray,
    face_avail: bool,
    audio_avail: bool,
    text_avail: bool,
    completeness: float,
    relevance: float,
) -> np.ndarray:
    """One uint8 host→device buffer for a B=1 streaming window — the inverse
    of ``SegmentPipeline._stream_forward``'s bitcast unpacking. Layout:
    frames u8 [S,S,3] | audio i16 [samples] | ids i32 [L] | mask i32 [L] |
    f32 scalars (face_avail, audio_avail, text_avail, completeness,
    relevance)."""
    scalars = np.asarray(
        [face_avail, audio_avail, text_avail, completeness, relevance],
        np.float32,
    )
    return np.concatenate(
        [
            np.ascontiguousarray(frames_u8, np.uint8).reshape(-1),
            np.ascontiguousarray(audio_i16, np.int16).view(np.uint8).reshape(-1),
            np.ascontiguousarray(token_ids, np.int32).view(np.uint8).reshape(-1),
            np.ascontiguousarray(token_mask, np.int32).view(np.uint8).reshape(-1),
            scalars.view(np.uint8),
        ]
    )

jax.tree_util.register_pytree_node(
    SegmentInputs,
    lambda s: (
        tuple(getattr(s, f) for f in _BATCH_FIELDS + _CARRY_FIELDS),
        None,
    ),
    lambda _, c: SegmentInputs(*c),
)


def pad_segment_inputs(
    inp: SegmentInputs, multiple: int, to: int = 0
) -> Tuple[SegmentInputs, int]:
    """Pad the batch axis to a multiple of the data-mesh size — or, with
    ``to`` set, to exactly that size (one static batch shape for the whole
    run, so the final short batch never triggers a fresh compile). Padded
    rows have every modality unavailable, so they cost the default-vector
    path and are sliced away by the caller. Returns (padded, real_count)."""
    real = inp.frames.shape[0]
    padded = ((max(real, to) + multiple - 1) // multiple) * multiple
    if padded == real:
        return inp, real
    extra = padded - real
    kwargs = {}
    for f in _BATCH_FIELDS:
        x = getattr(inp, f)
        if x.shape[0] == padded:
            # already padded by the caller (e.g. the audio window batch is
            # padded + device_put EARLY so its upload overlaps frame decode);
            # np.asarray here would drag a device array back through the
            # tunnel just to re-upload it
            kwargs[f] = x
            continue
        x = np.asarray(x)
        pad = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        kwargs[f] = np.pad(x, pad)
    for f in _CARRY_FIELDS:
        kwargs[f] = getattr(inp, f)
    return SegmentInputs(**kwargs), real


class SegmentPipeline:
    """Builds and owns the jitted end-to-end graph.

    With ``mesh`` set, inputs are declared sharded over the mesh's ``data``
    axis and params replicated, so XLA executes one SPMD program across chips
    (segments are the data-parallel axis — SURVEY §2.10). Callers pad the
    batch with :func:`pad_segment_inputs` first.
    """

    def __init__(
        self,
        models: PipelineModels,
        config: Optional[SystemConfig] = None,
        original_frame_hw: Tuple[int, int] = (480, 640),
        mesh=None,
    ):
        from msa_tpu.utils.jit_cache import enable_persistent_cache

        enable_persistent_cache()  # no-op if the process configured its own
        self.models = models
        self.config = config or SystemConfig()
        self.original_frame_hw = original_frame_hw
        self.mesh = mesh
        self._weights_cache: Optional[Dict[str, float]] = None
        if mesh is None:
            self._jitted = jax.jit(self._forward)
            self._jitted_host = jax.jit(self._forward_host)
            self._jitted_stream = jax.jit(self._stream_forward)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from msa_tpu.parallel.mesh import encoder_param_spec

            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            # encoder weights follow the Megatron-style tensor-parallel rules
            # (a no-op P() on a 1-wide model axis); everything else replicates
            params_sh = jax.tree_util.tree_map_with_path(
                lambda path, leaf: NamedSharding(
                    mesh,
                    encoder_param_spec(tuple(str(k.key) for k in path), leaf),
                ),
                models.params_tree(),
            )
            inputs_sh = SegmentInputs(
                **{f: data for f in _BATCH_FIELDS},
                **{f: rep for f in _CARRY_FIELDS},
            )
            self._jitted = jax.jit(
                self._forward, in_shardings=(params_sh, inputs_sh)
            )
            self._jitted_host = jax.jit(
                self._forward_host, in_shardings=(params_sh, inputs_sh)
            )

    # --- modality branches -------------------------------------------------

    def _face_branch(self, params, frames, face_avail, prev_landmarks, has_prev):
        m = self.models
        s = m.landmark.cfg.frame_size
        oh, ow = self.original_frame_hw
        # frames arrive as uint8 RGB; normalize on device (cheap VPU op,
        # saves 4× host→device bandwidth)
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        lout = m.landmark.apply({"params": params["landmark"]}, frames)
        landmarks = lout["landmarks"]  # [B, 478, 3]
        presence = lout["presence"]  # [B]
        detected = jnp.logical_and(
            presence >= m.landmark.cfg.min_detection_confidence, face_avail
        )

        # previous-frame landmarks: explicit carry + shift along the batch
        prev = jnp.concatenate([prev_landmarks[None], landmarks[:-1]], axis=0)
        prev_ok = jnp.concatenate([has_prev[None], detected[:-1]], axis=0)

        geometry, position, quality = jax.vmap(
            lambda lm, pl, fp, hp: FF.face_feature_stack(lm, pl, fp, hp, oh, ow)
        )(landmarks, prev, detected, prev_ok)

        # emotion CNN on the landmark-bbox crop of the (resized) frame; falls
        # back to the whole frame when no face (enforce_detection=False)
        crop_bbox = jax.vmap(lambda lm: FF.bbox(lm, s, s))(landmarks)
        crop_bbox = crop_bbox * detected[:, None].astype(jnp.float32)
        gray = rgb_to_gray(frames)
        crops = jax.vmap(
            lambda img, bb: bilinear_crop_resize(img, bb, m.face_cnn.cfg.crop_size)
        )(gray, crop_bbox)
        emo_deepface = m.face_cnn.apply({"params": params["face_cnn"]}, crops)

        # raw concat (7+5+3+4+6=25) → pad+LN to 27 → slice back
        raw = jnp.concatenate([emo_deepface, geometry], axis=-1)
        normed = normalize_face(raw)  # [B, 27]
        face27 = jnp.concatenate([normed[:, :23], position], axis=-1)

        # host-exception fallback: raw default analysis (face_analyzer.py:476-490)
        default27 = jnp.concatenate(
            [jnp.full((7,), 1.0 / 7.0), jnp.zeros(20)]
        ).astype(jnp.float32)
        avail = face_avail[:, None].astype(jnp.float32)
        face27 = face27 * avail + default27[None] * (1 - avail)
        fields = normed[:, :23] * avail + default27[None, :23] * (1 - avail)
        quality = quality * face_avail[:, None].astype(quality.dtype)
        position = position * face_avail[:, None].astype(position.dtype)

        # true pre-LayerNorm probabilities in CANONICAL order — the valid
        # distribution for pseudo-labeling and single-modality labeling
        # (the sliced-back `emotion_probs` below are post-LN, reference
        # streaming contract, NOT probabilities)
        probs_raw = emotions.reorder(emo_deepface, emotions.DEEPFACE_TO_CANONICAL)
        probs_raw = probs_raw * avail + (1.0 / 7.0) * (1 - avail)

        return {
            "face27": face27,
            "emotion_probs_raw": probs_raw,
            "emotion_probs": fields[:, :7],
            "micro_expressions": fields[:, 7:12],
            "gaze_direction": fields[:, 12:15],
            "muscle_tension": fields[:, 15:19],
            "movement_patterns": fields[:, 19:23],
            "face_position": position,  # [B, 4] pixels in original frame
            "face_quality": quality,  # [B, 4]
            "landmarks": landmarks,
            "detected": detected,
        }

    def _audio_branch(self, params, audio, audio_avail):
        m = self.models
        sr = self.config.audio.sample_rate
        # audio may arrive as int16 PCM (native WAV precision, 2× less
        # host→device transfer); normalize on device
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) / 32768.0
        audio_out = m.audio.apply({"params": params["audio"]}, audio)
        emo8 = audio_out["emotion_probs"]
        dsp, quality = jax.vmap(
            lambda w: AF.audio_feature_stack(w, sr, self.config.audio.pitch_mode)
        )(audio)
        raw = jnp.concatenate([emo8, dsp], axis=-1)  # [B, 27]
        normed = normalize_audio(raw)  # [B, 31]
        audio31 = jnp.concatenate([normed[:, :27], quality], axis=-1)

        # default analysis (audio_analyzer.py:331-345): uniform/zero, raw
        default31 = jnp.concatenate(
            [jnp.full((8,), 1.0 / 8.0), jnp.zeros(23)]
        ).astype(jnp.float32)
        avail = audio_avail[:, None].astype(jnp.float32)
        audio31 = audio31 * avail + default31[None] * (1 - avail)
        fields = normed[:, :27] * avail + default31[None, :27] * (1 - avail)
        quality = quality * avail

        probs_raw = emotions.iemocap4_to_canonical7(audio_out["probs4"])
        probs_raw = probs_raw * avail + (1.0 / 7.0) * (1 - avail)

        return {
            "audio31": audio31,
            "emotion_probs_raw": probs_raw,
            "emotion_probs": fields[:, :8],
            "pitch": fields[:, 8:9],
            "intensity": fields[:, 9:10],
            "timbre": fields[:, 10:23],
            "speech_rate": fields[:, 23:24],
            "rhythm": fields[:, 24:27],
            "audio_quality": quality,  # [B, 4]
        }

    def _text_branch(self, params, token_ids, token_mask, text_avail, completeness, relevance):
        m = self.models
        tout = m.text.apply({"params": params["text"]}, token_ids, token_mask)
        quality_scalar = (
            0.4 * tout["coherence"] + 0.3 * completeness + 0.3 * relevance
        )  # text_analyzer.py:230-241
        quality = jnp.stack(
            [quality_scalar, tout["coherence"], completeness, relevance], axis=-1
        )
        raw = jnp.concatenate(
            [
                tout["emotion_probs"],
                tout["sarcasm_score"],
                tout["humor_score"],
                tout["polarity"],
                tout["intensity"],
                tout["context_embedding"],
            ],
            axis=-1,
        )  # [B, 779]
        normed = normalize_text(raw)  # [B, 783]
        text783 = jnp.concatenate([normed[:, :779], quality], axis=-1)

        # default analysis (text_analyzer.py:305-319): uniform/zero, raw
        default783 = jnp.concatenate(
            [jnp.full((7,), 1.0 / 7.0), jnp.zeros(776)]
        ).astype(jnp.float32)
        avail = text_avail[:, None].astype(jnp.float32)
        text783 = text783 * avail + default783[None] * (1 - avail)
        fields = normed[:, :779] * avail + default783[None, :779] * (1 - avail)
        quality = quality * avail

        probs_raw = tout["emotion_probs"] * avail + (1.0 / 7.0) * (1 - avail)

        return {
            "text783": text783,
            "emotion_probs_raw": probs_raw,
            "emotion_probs": fields[:, :7],
            "sarcasm_score": fields[:, 7:8],
            "humor_score": fields[:, 8:9],
            "polarity": fields[:, 9:10],
            "intensity": fields[:, 10:11],
            "context_embedding": fields[:, 11:779],
            "text_quality": quality,  # [B, 4]
        }

    # --- full graph ---------------------------------------------------------

    def _forward(self, params, inputs: SegmentInputs):
        face = self._face_branch(
            params,
            inputs.frames,
            inputs.face_avail,
            inputs.prev_landmarks,
            inputs.has_prev,
        )
        audio = self._audio_branch(params, inputs.audio, inputs.audio_avail)
        text = self._text_branch(
            params,
            inputs.token_ids,
            inputs.token_mask,
            inputs.text_avail,
            inputs.completeness,
            inputs.relevance,
        )

        # nan_to_num before fusion (streaming_processor.py:294-300)
        f27 = jnp.nan_to_num(face["face27"])
        a31 = jnp.nan_to_num(audio["audio31"])
        t783 = jnp.nan_to_num(text["text783"])

        combo = (
            inputs.face_avail.astype(jnp.int32) * 4
            + inputs.audio_avail.astype(jnp.int32) * 2
            + inputs.text_avail.astype(jnp.int32)
        )
        fuse = lambda f, a, t, c: self.models.fusion.apply(  # noqa: E731
            {"params": params["fusion"]},
            f[None],
            a[None],
            t[None],
            c,
            method=FusionMLP.fuse_combo,
        )[0]
        fused = jax.vmap(fuse)(f27, a31, t783, combo)

        new_carry = (face["landmarks"][-1], face["detected"][-1])
        # the ONE-round-trip host fetch row (see _PACK_FIELDS): every column
        # either processor reads, concatenated in layout order
        hostpack = jnp.concatenate(
            [
                fused,
                f27,
                a31,
                t783,
                face["emotion_probs_raw"],
                audio["emotion_probs_raw"],
                text["emotion_probs_raw"],
                combo[:, None].astype(jnp.float32),
                face["face27"],
                face["face_quality"].astype(jnp.float32),
                audio["audio31"],
                text["text783"],
            ],
            axis=-1,
        )
        return {
            "face": face,
            "audio": audio,
            "text": text,
            "face27": f27,
            "audio31": a31,
            "text783": t783,
            "combo": combo,
            "fused": fused,
            "hostpack": hostpack,
        }, new_carry

    def run(self, inputs: SegmentInputs) -> Tuple[Dict[str, Any], Tuple[Any, Any]]:
        """Execute the jitted graph. Returns (outputs, (last_landmarks,
        last_detected)) — the carry for the next streaming window."""
        return self._jitted(self.models.params_tree(), inputs)

    def _forward_host(self, params, inputs: SegmentInputs):
        """The production serving graph: identical compute to
        :meth:`_forward`, but only the leaves a host consumer reads —
        ``hostpack`` plus the landmark/detected rows the offline carry
        slices. The full ~39-leaf output dict costs real per-dispatch time
        under the axon tunnel (every output leaf mints a buffer handle);
        5 leaves keep dispatch overhead off the latency path."""
        out, carry = self._forward(params, inputs)
        slim = {
            "hostpack": out["hostpack"],
            "landmarks": out["face"]["landmarks"],
            "detected": out["face"]["detected"],
        }
        return slim, carry

    def run_host(
        self, inputs: SegmentInputs
    ) -> Tuple[Dict[str, Any], Tuple[Any, Any]]:
        """Slim serving dispatch (see :meth:`_forward_host`)."""
        return self._jitted_host(self.models.params_tree(), inputs)

    # --- packed B=1 streaming dispatch --------------------------------------
    # Under the axon tunnel every uploaded array is its own ~10-25 ms round
    # trip; a B=1 SegmentInputs pytree is 9 host leaves per window. The
    # streaming path therefore ships the whole window as ONE uint8 buffer
    # (frames u8 | audio i16 | ids i32 | mask i32 | 5 f32 scalars) and the
    # graph bitcasts the regions back — one upload instead of nine. The
    # landmark carry stays device-resident (zero upload after window 1).

    def _stream_forward(self, params, packed, prev_landmarks, has_prev):
        from jax import lax

        s = self.models.landmark.cfg.frame_size
        F = s * s * 3
        samples = self.config.pipeline.segment_samples
        A = 2 * samples
        L = (packed.shape[0] - F - A - 20) // 8
        frames = packed[:F].reshape(1, s, s, 3)
        off = F
        audio = lax.bitcast_convert_type(
            packed[off : off + A].reshape(samples, 2), jnp.int16
        ).reshape(1, samples)
        off += A
        ids = lax.bitcast_convert_type(
            packed[off : off + 4 * L].reshape(L, 4), jnp.int32
        ).reshape(1, L)
        off += 4 * L
        mask = lax.bitcast_convert_type(
            packed[off : off + 4 * L].reshape(L, 4), jnp.int32
        ).reshape(1, L)
        off += 4 * L
        sc = lax.bitcast_convert_type(
            packed[off : off + 20].reshape(5, 4), jnp.float32
        )
        inp = SegmentInputs(
            frames=frames,
            audio=audio,
            token_ids=ids,
            token_mask=mask,
            face_avail=sc[0:1] > 0.5,
            audio_avail=sc[1:2] > 0.5,
            text_avail=sc[2:3] > 0.5,
            completeness=sc[3:4],
            relevance=sc[4:5],
            prev_landmarks=prev_landmarks,
            has_prev=has_prev,
        )
        return self._forward_host(params, inp)

    def run_stream(
        self, packed: np.ndarray, prev_landmarks, has_prev
    ) -> Tuple[Dict[str, Any], Tuple[Any, Any]]:
        """Packed single-window dispatch (see :func:`pack_stream_inputs`).
        The token bucket is inferred from the buffer length, so each bucket
        is its own compiled shape exactly as with :meth:`run`."""
        if self.mesh is not None:  # packed layout is a single-device path
            raise RuntimeError("run_stream is single-device; use run()")
        return self._jitted_stream(
            self.models.params_tree(), packed, prev_landmarks, has_prev
        )

    def warmup(
        self,
        batch_sizes: Tuple[int, ...] = (1,),
        token_buckets: Tuple[int, ...] = (32, 128, 512),
        samples: int = 80_000,
        stream: bool = False,
    ) -> int:
        """Pre-compile the graph for every (batch, token-bucket) static shape
        so no live call hits a mid-stream compile stall (VERDICT r1 #5). Runs
        the jitted graph on zeros per shape — the call path (not AOT
        ``lower().compile()``) so the compilations land in the SAME jit cache
        subsequent ``run()`` calls hit. A host fetch forces completion under
        the axon tunnel. Returns the number of shapes compiled."""
        params = self.models.params_tree()
        # the SAME cap the processors' bucketing applies (min of the config
        # text limit and the model's positions): they dispatch shapes from
        # {buckets ≤ cap} ∪ {cap}, so warm exactly that set — a config with
        # text.max_length=256 must precompile 256, not an unreachable 512
        token_cap = min(
            self.config.text.max_length, self.models.text.cfg.max_positions
        )
        buckets = tuple(
            dict.fromkeys(
                [t for t in token_buckets if t <= token_cap] + [token_cap]
            )
        )
        n = 0
        lc = self.models.landmark.cfg.landmark_count
        s = self.models.landmark.cfg.frame_size
        for b in batch_sizes:
            for t in buckets:
                if stream and b == 1 and self.mesh is None:
                    # warm the packed B=1 graph — the shape process_segment
                    # actually dispatches
                    packed = pack_stream_inputs(
                        np.zeros((s, s, 3), np.uint8),
                        np.zeros(samples, np.int16),
                        np.zeros(t, np.int32),
                        np.zeros(t, np.int32),
                        True,
                        True,
                        True,
                        0.0,
                        0.0,
                    )
                    out, _ = self.run_stream(
                        packed, np.zeros((lc, 3), np.float32), np.asarray(False)
                    )
                else:
                    # with a mesh, jit's declared in_shardings place these
                    # numpy inputs on the data axis automatically; the slim
                    # host graph is the one the processors dispatch
                    inp = SegmentInputs.zeros(
                        self.models, b, samples=samples, tokens=t
                    )
                    out, _ = self._jitted_host(params, inp)
                np.asarray(out["hostpack"])
                n += 1
        return n

    def cache_size(self) -> int:
        """Number of compiled shapes across ALL jit caches (full graph +
        slim host graph + packed-stream dispatch) — lets tests assert zero
        retraces after :meth:`warmup`."""
        n = self._jitted._cache_size() + self._jitted_host._cache_size()
        if self.mesh is None:
            n += self._jitted_stream._cache_size()
        return n

    def weights(self) -> Dict[str, float]:
        # cached: inference params are frozen, and get_weights costs device
        # round trips (softmax + float() fetches) — streaming used to pay
        # them on EVERY window's output build
        if self._weights_cache is None:
            self._weights_cache = fusion_lib.get_weights(
                self.models.fusion, self.models.fusion_params
            )
        return self._weights_cache
