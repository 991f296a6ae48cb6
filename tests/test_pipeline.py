"""End-to-end segment graph tests (tiny models, CPU).

Validates the single jitted pipeline: branch assembly per the canonical
streaming path (streaming_processor.py:230-300), default-analysis fallbacks,
combo-based fusion dispatch, and the movement carry.
"""

import numpy as np
import pytest

from msa_tpu.pipeline.graph import PipelineModels, SegmentInputs, SegmentPipeline

B, SAMPLES, TOKENS = 3, 4000, 16


@pytest.fixture(scope="module")
def pipeline(tiny_models):
    return SegmentPipeline(tiny_models, original_frame_hw=(480, 640))


@pytest.fixture(scope="module")
def inputs(pipeline):
    rng = np.random.default_rng(0)
    models = pipeline.models
    inp = SegmentInputs.zeros(models, B, samples=SAMPLES, tokens=TOKENS)
    inp.frames = rng.random(inp.frames.shape).astype(np.float32)
    inp.audio = rng.normal(size=inp.audio.shape).astype(np.float32) * 0.1
    inp.token_ids = rng.integers(
        0, models.text.cfg.vocab_size, size=inp.token_ids.shape
    ).astype(np.int32)
    inp.token_mask = np.ones_like(inp.token_mask)
    inp.completeness = rng.random(B).astype(np.float32)
    inp.relevance = rng.random(B).astype(np.float32)
    return inp


def test_output_shapes_and_finiteness(pipeline, inputs):
    out, carry = pipeline.run(inputs)
    assert out["face27"].shape == (B, 27)
    assert out["audio31"].shape == (B, 31)
    assert out["text783"].shape == (B, 783)
    assert out["fused"].shape == (B, 7)
    for k in ("face27", "audio31", "text783", "fused"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert np.asarray(out["combo"]).tolist() == [7, 7, 7]
    lm, detected = carry
    assert lm.shape == (478, 3)


def test_feature_assembly_slices(pipeline, inputs):
    """face27 = [LN-normalized 23 | raw position 4]; audio31 = [normalized 27
    | raw quality 4]; text783 = [normalized 779 | raw quality 4]
    (streaming_processor.py:230-288)."""
    out, _ = pipeline.run(inputs)
    f = out["face"]
    np.testing.assert_allclose(
        np.asarray(out["face27"]),
        np.concatenate(
            [
                np.asarray(f["emotion_probs"]),
                np.asarray(f["micro_expressions"]),
                np.asarray(f["gaze_direction"]),
                np.asarray(f["muscle_tension"]),
                np.asarray(f["movement_patterns"]),
                np.asarray(f["face_position"]),
            ],
            axis=-1,
        ),
        atol=1e-6,
    )
    a = out["audio"]
    np.testing.assert_allclose(
        np.asarray(out["audio31"])[:, 27:], np.asarray(a["audio_quality"]), atol=1e-6
    )
    t = out["text"]
    np.testing.assert_allclose(
        np.asarray(out["text783"])[:, 779:], np.asarray(t["text_quality"]), atol=1e-6
    )
    # text quality blend: 0.4*coherence + 0.3*completeness + 0.3*relevance
    q = np.asarray(t["text_quality"])
    np.testing.assert_allclose(
        q[:, 0], 0.4 * q[:, 1] + 0.3 * q[:, 2] + 0.3 * q[:, 3], atol=1e-5
    )


def test_missing_audio_uses_default_analysis(pipeline, inputs):
    """audio_avail=False → raw default vector [1/8 ×8, zeros] and 2-modality
    combo (audio_analyzer.py:331-345 + fusion dispatch)."""
    import dataclasses as dc

    inp = dc.replace(inputs) if dc.is_dataclass(inputs) else inputs
    inp = SegmentInputs(**{f.name: getattr(inputs, f.name) for f in dc.fields(inputs)})
    inp.audio_avail = np.asarray([True, False, True])
    out, _ = pipeline.run(inp)
    row = np.asarray(out["audio31"])[1]
    np.testing.assert_allclose(row[:8], 1.0 / 8.0, atol=1e-6)
    np.testing.assert_allclose(row[8:], 0.0, atol=1e-6)
    assert np.asarray(out["combo"]).tolist() == [7, 5, 7]  # face+text for row 1


def test_two_modality_combo_matches_direct_fusion(pipeline, inputs):
    import dataclasses as dc

    inp = SegmentInputs(**{f.name: getattr(inputs, f.name) for f in dc.fields(inputs)})
    inp.text_avail = np.zeros(B, bool)
    out, _ = pipeline.run(inp)
    models = pipeline.models
    direct = models.fusion.apply(
        {"params": models.fusion_params},
        face=np.asarray(out["face27"]),
        audio=np.asarray(out["audio31"]),
    )["fused"]
    np.testing.assert_allclose(
        np.asarray(out["fused"]), np.asarray(direct), atol=1e-4
    )


def test_movement_carry_chains_between_windows(pipeline, inputs):
    """Streaming: the carry from window k feeds window k+1; the first window
    without history must produce zero movement features on row 0."""
    import dataclasses as dc

    out1, carry1 = pipeline.run(inputs)
    lm, detected = carry1
    inp2 = SegmentInputs(**{f.name: getattr(inputs, f.name) for f in dc.fields(inputs)})
    inp2.prev_landmarks = np.asarray(lm)
    inp2.has_prev = np.asarray(detected)
    out2, _ = pipeline.run(inp2)
    # first window: row 0 has no history → movement slice is the z-score of
    # zeros == 0 pre-LN; with history it generally differs
    assert out1["face27"].shape == out2["face27"].shape
    if bool(np.asarray(detected)):
        assert not np.allclose(
            np.asarray(out1["face27"])[0], np.asarray(out2["face27"])[0]
        )


def test_second_call_does_not_retrace(pipeline, inputs):
    """Same shapes → cached executable (static-shape design goal)."""
    n0 = pipeline._jitted._cache_size()
    pipeline.run(inputs)
    assert pipeline._jitted._cache_size() == n0


def test_warmup_precompiles_all_buckets_zero_retraces(pipeline):
    """After warmup over every (batch, token-bucket) shape, live calls of any
    bucket hit the cache — zero retraces (VERDICT r1 #5). Warmup compiles the
    requested buckets ≤ the processors' token cap PLUS the cap itself (the
    dispatchers fall back to the cap for long transcripts, so that shape must
    be warm too — a config whose cap isn't a bucket used to stall mid-run)."""
    buckets = (8, TOKENS)
    cap = min(
        pipeline.config.text.max_length, pipeline.models.text.cfg.max_positions
    )
    expected = tuple(dict.fromkeys([t for t in buckets if t <= cap] + [cap]))
    n = pipeline.warmup(
        batch_sizes=(B,), token_buckets=buckets, samples=SAMPLES
    )
    assert n == len(expected)
    n0 = pipeline.cache_size()
    models = pipeline.models
    for tokens in expected:
        inp = SegmentInputs.zeros(models, B, samples=SAMPLES, tokens=tokens)
        # run_host is the production dispatch warmup precompiles
        out, _ = pipeline.run_host(inp)
        assert np.isfinite(np.asarray(out["hostpack"])).all()
    assert pipeline.cache_size() == n0


def test_imported_params_select_parity_mode():
    """Dropping pretrained params into PipelineModels.initialize must default
    the encoders to the PARITY serving mode — f32 matmuls, no int8 — because
    imported weights carry the ≤1e-3 drop-in contract (PARITY.md strategy #3)
    that int8's ~1% error would break (VERDICT r2 #6). The stand-in param
    trees are never applied; this is a wiring test."""
    stand_in = {"stand_in": np.zeros(1, np.float32)}
    models = PipelineModels.initialize(
        seed=0, text_params=stand_in, audio_params=stand_in
    )
    assert models.text.cfg.encoder.quantize == "none"
    assert models.text.cfg.encoder.compute_dtype == "float32"
    assert models.audio.cfg.encoder.quantize == "none"
    assert models.audio.cfg.encoder.compute_dtype == "float32"
    assert models.text_params is stand_in and models.audio_params is stand_in

    # an explicit quantize= still wins (serving is then the caller's choice)
    models = PipelineModels.initialize(
        seed=0, text_params=stand_in, audio_params=stand_in, quantize="int8"
    )
    assert models.text.cfg.encoder.quantize == "int8"
    assert models.text.cfg.encoder.compute_dtype == "bfloat16"


def test_parity_mode_pallas_f32_matches_einsum_end_to_end(tiny_models, inputs):
    """The parity-mode serving path (f32 + fused Pallas kernels) must stay
    within the 1e-3 contract of the plain einsum/dense f32 graph end-to-end
    over the full pipeline — same params, same inputs (VERDICT r2 #6)."""
    import dataclasses as dc

    def pallas_f32(model_cfg):
        enc = dc.replace(
            model_cfg.encoder, attention_impl="pallas", ffn_impl="pallas"
        )
        return dc.replace(model_cfg, encoder=enc)

    from msa_tpu.models.audio import AudioEmotionModel
    from msa_tpu.models.text import TextModel

    models_p = dc.replace(
        tiny_models,
        text=TextModel(pallas_f32(tiny_models.text.cfg)),
        audio=AudioEmotionModel(pallas_f32(tiny_models.audio.cfg)),
    )
    ref = SegmentPipeline(tiny_models, original_frame_hw=(480, 640))
    par = SegmentPipeline(models_p, original_frame_hw=(480, 640))
    out_ref, _ = ref.run(inputs)
    out_par, _ = par.run(inputs)
    for k in ("text783", "audio31", "face27", "fused"):
        np.testing.assert_allclose(
            np.asarray(out_ref[k]), np.asarray(out_par[k]), atol=1e-3, err_msg=k
        )


def test_hostpack_columns_match_dict_fields(pipeline, inputs):
    """out["hostpack"] is the ONE-fetch contract: every column must equal
    the dict field it mirrors (pipeline/graph.py _PACK_FIELDS)."""
    from msa_tpu.pipeline.graph import unpack_hostpack

    out, _ = pipeline.run(inputs)
    cols = unpack_hostpack(np.asarray(out["hostpack"]))
    expect = {
        "fused": out["fused"],
        "face27": out["face27"],
        "audio31": out["audio31"],
        "text783": out["text783"],
        "face_probs_raw": out["face"]["emotion_probs_raw"],
        "audio_probs_raw": out["audio"]["emotion_probs_raw"],
        "text_probs_raw": out["text"]["emotion_probs_raw"],
        "s_face27": out["face"]["face27"],
        "s_face_quality": out["face"]["face_quality"],
        "s_audio31": out["audio"]["audio31"],
        "s_text783": out["text"]["text783"],
    }
    for name, ref in expect.items():
        np.testing.assert_array_equal(
            cols[name], np.asarray(ref, np.float32), err_msg=name
        )
    np.testing.assert_array_equal(
        cols["combo"][:, 0], np.asarray(out["combo"], np.float32)
    )


def test_packed_stream_dispatch_matches_pytree(tiny_models):
    """run_stream's one-buffer bitcast unpacking must reproduce the pytree
    dispatch bit-for-bit: same graph, same values (the i16 audio region is
    divided by the same 32768 the host float path uses)."""
    import dataclasses as dc

    from msa_tpu.core.config import SystemConfig
    from msa_tpu.pipeline.graph import pack_stream_inputs

    cfg = SystemConfig()
    cfg = dc.replace(
        cfg, pipeline=dc.replace(cfg.pipeline, segment_samples=SAMPLES)
    )
    pipe = SegmentPipeline(tiny_models, config=cfg, original_frame_hw=(480, 640))
    rng = np.random.default_rng(7)
    s = tiny_models.landmark.cfg.frame_size
    frames_u8 = rng.integers(0, 255, size=(s, s, 3), dtype=np.uint8)
    pcm = rng.integers(-3000, 3000, size=SAMPLES).astype(np.int16)
    ids = rng.integers(0, tiny_models.text.cfg.vocab_size, size=TOKENS).astype(
        np.int32
    )
    mask = np.ones(TOKENS, np.int32)

    inp = SegmentInputs.zeros(tiny_models, 1, samples=SAMPLES, tokens=TOKENS)
    inp.frames[0] = frames_u8
    inp.audio = pcm[None]  # i16 path, same dtype the packed buffer ships
    inp.token_ids[0] = ids
    inp.token_mask[0] = mask
    inp.completeness[0] = 0.4
    inp.relevance[0] = 0.7
    out_ref, carry_ref = pipe.run(inp)

    packed = pack_stream_inputs(
        frames_u8, pcm, ids, mask, True, True, True, 0.4, 0.7
    )
    lc = tiny_models.landmark.cfg.landmark_count
    out_pk, carry_pk = pipe.run_stream(
        packed, np.zeros((lc, 3), np.float32), np.asarray(False)
    )
    np.testing.assert_array_equal(
        np.asarray(out_ref["hostpack"]), np.asarray(out_pk["hostpack"])
    )
    np.testing.assert_array_equal(np.asarray(carry_ref[0]), np.asarray(carry_pk[0]))
    np.testing.assert_array_equal(np.asarray(carry_ref[1]), np.asarray(carry_pk[1]))
