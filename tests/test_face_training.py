"""Face-branch weight path tests (VERDICT r1 item #3).

The reference's face path was PRETRAINED (MediaPipe FaceMesh + DeepFace FER
CNN, reference face_analyzer.py:26-32, :151-157). These tests cover the
rebuild's equivalents: the Keras-FER import converter (numpy-golden
equivalence, same pattern as the HF BERT/wav2vec2/Whisper import tests) and
the synthetic-supervision landmark training recipe proving the spatial
(integral-heatmap) head actually localizes — which the round-1 GAP+FC head
could not.
"""

import numpy as np
import pytest

from msa_tpu.models import face as face_lib
from msa_tpu.models.face import (
    DeepFaceEmotionCNN,
    FaceLandmarkNet,
    FaceModelConfig,
    params_from_keras_fer,
)
from msa_tpu.training import train_landmarks as TL


# --- numpy golden of the Keras FER architecture -------------------------------


def _conv_valid(x, k, b):
    from numpy.lib.stride_tricks import sliding_window_view

    kh, kw = k.shape[0], k.shape[1]
    win = sliding_window_view(x, (kh, kw), axis=(0, 1))  # [oh, ow, C, kh, kw]
    return np.einsum("ijckl,klco->ijo", win, k) + b


def _pool(x, size, stride, op):
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(x, (size, size), axis=(0, 1))[::stride, ::stride]
    return op(win, axis=(-1, -2))


def _keras_fer_forward_np(x, state):
    """Independent numpy forward of the exact Keras FER-2013 graph."""
    relu = lambda v: np.maximum(v, 0.0)  # noqa: E731
    x = relu(_conv_valid(x, state["conv2d"]["kernel"], state["conv2d"]["bias"]))
    x = _pool(x, 5, 2, np.max)
    x = relu(_conv_valid(x, state["conv2d_1"]["kernel"], state["conv2d_1"]["bias"]))
    x = relu(_conv_valid(x, state["conv2d_2"]["kernel"], state["conv2d_2"]["bias"]))
    x = _pool(x, 3, 2, np.mean)
    x = relu(_conv_valid(x, state["conv2d_3"]["kernel"], state["conv2d_3"]["bias"]))
    x = relu(_conv_valid(x, state["conv2d_4"]["kernel"], state["conv2d_4"]["bias"]))
    x = _pool(x, 3, 2, np.mean)
    x = x.reshape(-1)
    x = relu(x @ state["dense"]["kernel"] + state["dense"]["bias"])
    x = relu(x @ state["dense_1"]["kernel"] + state["dense_1"]["bias"])
    logits = x @ state["dense_2"]["kernel"] + state["dense_2"]["bias"]
    e = np.exp(logits - logits.max())
    return e / e.sum()


def _random_keras_state(rng):
    def layer(kshape):
        return {
            "kernel": (rng.normal(size=kshape) * 0.05).astype(np.float32),
            "bias": (rng.normal(size=kshape[-1]) * 0.01).astype(np.float32),
        }

    return {
        "conv2d": layer((5, 5, 1, 64)),
        "conv2d_1": layer((3, 3, 64, 64)),
        "conv2d_2": layer((3, 3, 64, 64)),
        "conv2d_3": layer((3, 3, 64, 128)),
        "conv2d_4": layer((3, 3, 128, 128)),
        "dense": layer((128, 1024)),
        "dense_1": layer((1024, 1024)),
        "dense_2": layer((1024, 7)),
    }


def test_deepface_cnn_matches_numpy_golden(rng):
    """Converted Keras weights through the Flax clone == the independent
    numpy forward of the source architecture (import-equivalence, like the
    HF trunk tests)."""
    state = _random_keras_state(rng)
    params = params_from_keras_fer(state)
    model = DeepFaceEmotionCNN(FaceModelConfig(cnn_arch="deepface"))

    crops = rng.random((2, 48, 48, 1)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, crops))
    for i in range(2):
        want = _keras_fer_forward_np(crops[i], state)
        np.testing.assert_allclose(got[i], want, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-6)


def test_keras_fer_converter_accepts_flat_npz_keys(rng, tmp_path):
    state = _random_keras_state(rng)
    flat = {
        f"{name}/{part}": arr
        for name, layer in state.items()
        for part, arr in layer.items()
    }
    np.savez(tmp_path / "fer.npz", **flat)
    model = DeepFaceEmotionCNN(FaceModelConfig(cnn_arch="deepface"))
    params = face_lib.load_emotion_weights(model, str(tmp_path / "fer.npz"))
    ref = params_from_keras_fer(state)
    for layer in ref:
        np.testing.assert_array_equal(params[layer]["kernel"], ref[layer]["kernel"])
        np.testing.assert_array_equal(params[layer]["bias"], ref[layer]["bias"])


def test_pipeline_loads_face_assets(rng, tmp_path):
    """PipelineModels.initialize picks up configured face weight assets."""
    import flax.serialization

    from msa_tpu.pipeline.graph import PipelineModels

    state = _random_keras_state(rng)
    flat = {
        f"{n}/{p}": a for n, layer in state.items() for p, a in layer.items()
    }
    np.savez(tmp_path / "fer.npz", **flat)

    lm_cfg = FaceModelConfig.tiny()
    lm_model = FaceLandmarkNet(lm_cfg)
    lm_params = face_lib.init_landmark_params(lm_model, seed=7)
    (tmp_path / "lm.msgpack").write_bytes(flax.serialization.to_bytes(lm_params))

    import dataclasses

    cfg = dataclasses.replace(
        lm_cfg,
        cnn_arch="deepface",
        crop_size=48,
        emotion_weights=str(tmp_path / "fer.npz"),
        landmark_weights=str(tmp_path / "lm.msgpack"),
    )
    from msa_tpu.models.audio import AudioModelConfig
    from msa_tpu.models.fusion import FusionMLP
    from msa_tpu.models.text import TextModelConfig

    models = PipelineModels.initialize(
        seed=0,
        face_cfg=cfg,
        audio_cfg=AudioModelConfig.tiny(),
        text_cfg=TextModelConfig.tiny(),
        fusion=FusionMLP(hidden_dim=32),
    )
    assert isinstance(models.face_cnn, DeepFaceEmotionCNN)
    np.testing.assert_array_equal(
        np.asarray(models.face_cnn_params["conv_0"]["kernel"]),
        state["conv2d"]["kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(models.landmark_params["conv_0"]["kernel"]),
        np.asarray(lm_params["conv_0"]["kernel"]),
    )


# --- synthetic-supervision landmark training ----------------------------------


def test_template_and_renderer_are_consistent(rng):
    tmpl = TL.make_template(478)
    assert tmpl.shape == (478, 3)
    assert np.all(tmpl[:, :2] >= 0) and np.all(tmpl[:, :2] <= 1)
    s = TL.render_batch(rng, 8, 32, tmpl)
    assert s.frames.shape == (8, 32, 32, 3)
    assert s.frames.min() >= 0 and s.frames.max() <= 1
    pos = s.present > 0.5
    # landmark targets of present faces stay inside the frame
    assert np.all(s.landmarks[pos][..., :2] >= 0)
    assert np.all(s.landmarks[pos][..., :2] <= 1)


def test_landmark_net_learns_to_localize():
    """The spatial head trained on procedural faces must beat the
    mean-predictor baseline by a wide margin on held-out faces — the
    capability the round-1 GAP+FC head structurally lacked — and the
    presence head must separate faces from face-less frames."""
    params, m = TL.train(
        cfg=FaceModelConfig.tiny(), steps=500, batch=32, log_every=0
    )
    assert m["landmark_err"] < 0.5 * m["mean_predictor_err"], m
    assert m["presence_pos"] > 0.8 > 0.3 > m["presence_neg"], m


def test_landmark_weights_roundtrip(tmp_path):
    import flax.serialization

    cfg = FaceModelConfig.tiny()
    model = FaceLandmarkNet(cfg)
    params = face_lib.init_landmark_params(model, seed=3)
    path = tmp_path / "lm.msgpack"
    path.write_bytes(flax.serialization.to_bytes(params))
    loaded = face_lib.load_landmark_weights(model, str(path))
    for a, b in zip(
        __import__("jax").tree.leaves(params), __import__("jax").tree.leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- synthetic-supervision expression training (face emotion CNN) -------------


def test_expression_deformation_geometry():
    """deform_template must move the template the way the class semantics
    say: surprise opens the eyes and mouth, happy raises the mouth corners
    relative to sad, anger pulls the inner brow ends down."""
    from msa_tpu.training import face_synth as FS

    tmpl = FS.make_template(478)
    neutral = FS.deform_template(tmpl, FS.Expression())
    np.testing.assert_allclose(neutral, tmpl)  # identity at defaults

    surprise = FS.deform_template(
        tmpl, FS._CLASS_PARAMS["surprise"]
    )
    eye_extent = lambda t, sl: t[sl, 1].max() - t[sl, 1].min()  # noqa: E731
    assert eye_extent(surprise, FS.EYE_L) > 1.3 * eye_extent(tmpl, FS.EYE_L)
    mouth_extent = lambda t: t[FS.MOUTH_IN, 1].max() - t[FS.MOUTH_IN, 1].min()  # noqa: E731
    assert mouth_extent(surprise) > 1.8 * mouth_extent(tmpl)

    happy = FS.deform_template(tmpl, FS._CLASS_PARAMS["happy"])
    sad = FS.deform_template(tmpl, FS._CLASS_PARAMS["sad"])

    def corner_minus_center(t):
        xs, ys = t[FS.MOUTH_OUT, 0], t[FS.MOUTH_OUT, 1]
        corner = ys[np.argmax(xs)]
        center = ys[np.argmin(np.abs(xs - 0.5))]
        return corner - center

    # y is down: happy corners ABOVE center (negative), sad below
    assert corner_minus_center(happy) < corner_minus_center(tmpl)
    assert corner_minus_center(sad) > corner_minus_center(tmpl)

    angry = FS.deform_template(tmpl, FS._CLASS_PARAMS["angry"])
    # left brow inner end (max x within BROW_L) pulled down vs neutral
    bl = FS.BROW_L
    inner = np.argmax(tmpl[bl, 0])
    assert angry[bl, 1][inner] > tmpl[bl, 1][inner]


def test_expression_renderer_consistency(rng):
    """Rendered frames stay in range; landmarks of present faces stay inside
    the frame; labels cover the 7 classes over a large batch."""
    from msa_tpu.training import face_synth as FS

    s = FS.render_expression_batch(rng, 32, 48)
    assert s.frames.shape == (32, 48, 48, 3)
    assert s.frames.min() >= 0 and s.frames.max() <= 1
    assert np.all(s.landmarks[s.present > 0.5][..., :2] >= 0)
    assert np.all(s.landmarks[s.present > 0.5][..., :2] <= 1)
    assert set(np.unique(s.labels)) <= set(range(7))


def test_face_emotion_cnn_learns_expressions():
    """Short training run on procedural expression crops must classify
    held-out expressions far above chance (1/7) — the semantic capability
    the reference got from pretrained DeepFace (VERDICT r2 #2)."""
    from msa_tpu.training import train_face_emotion as TF

    cfg = FaceModelConfig(cnn_channels=(8, 16, 32))
    params, m = TF.train(cfg=cfg, steps=120, batch=32, frame_size=64, log_every=0)
    assert m["accuracy"] > 0.5, m
    assert m["worst_class_recall"] > 0.15, m
