"""Whole-pipeline checkpointing.

The reference persists only the fusion MLP (reference fusion_model.py:
239-294); its encoders come from HF/SpeechBrain download caches. A standalone
framework owns all of its weights, so this module serializes the complete
:class:`PipelineModels` param tree + the model-shape metadata needed to
rebuild it, with the same create-if-missing contract as the fusion
checkpoint.

Format: one msgpack file (flax.serialization) holding
``{"meta_json": ..., "params": {...}}`` — identical mechanics to the fusion
checkpoint so tooling stays uniform.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path

import flax.serialization

logger = logging.getLogger(__name__)


def _encoder_meta(enc) -> dict:
    return dataclasses.asdict(enc)


def save_pipeline(path: str, models) -> None:
    from msa_tpu.pipeline.graph import PipelineModels  # noqa: F401

    meta = {
        "face": dataclasses.asdict(models.landmark.cfg),
        "audio": dataclasses.asdict(models.audio.cfg),
        "text": dataclasses.asdict(models.text.cfg),
        "fusion": {
            "face_dim": models.fusion.face_dim,
            "audio_dim": models.fusion.audio_dim,
            "text_dim": models.fusion.text_dim,
            "hidden_dim": models.fusion.hidden_dim,
            "output_dim": models.fusion.output_dim,
            "dropout": models.fusion.dropout,
        },
        "tokenizer_vocab_size": models.tokenizer.vocab_size,
    }
    payload = {
        "meta_json": json.dumps(meta),
        "params": flax.serialization.to_state_dict(models.params_tree()),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(flax.serialization.msgpack_serialize(payload))
    logger.info("saved pipeline checkpoint to %s", path)


def load_pipeline(path: str, seed: int = 0, create_if_missing: bool = True):
    """Rebuild PipelineModels from a checkpoint; create-if-missing semantics
    mirror the fusion checkpoint (fusion_model.py:286-294)."""
    from msa_tpu.models.audio import AudioModelConfig
    from msa_tpu.models.face import FaceModelConfig
    from msa_tpu.models.fusion import FusionMLP
    from msa_tpu.models.text import TextModelConfig
    from msa_tpu.models.transformer import EncoderConfig
    from msa_tpu.pipeline.graph import PipelineModels

    p = Path(path)
    if not p.exists():
        if not create_if_missing:
            raise FileNotFoundError(path)
        logger.warning("pipeline checkpoint not found at %s — creating", path)
        models = PipelineModels.initialize(seed=seed)
        save_pipeline(path, models)
        return models

    payload = flax.serialization.msgpack_restore(p.read_bytes())
    meta = json.loads(payload["meta_json"])

    def enc(d):
        return EncoderConfig(**d)

    face_cfg = FaceModelConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in meta["face"].items()}
    )
    audio_meta = dict(meta["audio"])
    audio_enc = enc(audio_meta.pop("encoder"))
    audio_cfg = AudioModelConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in audio_meta.items()},
        encoder=audio_enc,
    )
    text_meta = dict(meta["text"])
    text_enc = enc(text_meta.pop("encoder"))
    text_cfg = TextModelConfig(**text_meta, encoder=text_enc)
    fusion = FusionMLP(**meta["fusion"])

    models = PipelineModels.initialize(
        seed=seed, face_cfg=face_cfg, audio_cfg=audio_cfg, text_cfg=text_cfg,
        fusion=fusion,
    )
    template = models.params_tree()
    restored = flax.serialization.from_state_dict(template, payload["params"])
    models.landmark_params = restored["landmark"]
    models.face_cnn_params = restored["face_cnn"]
    models.audio_params = restored["audio"]
    models.text_params = restored["text"]
    models.fusion_params = restored["fusion"]
    return models
