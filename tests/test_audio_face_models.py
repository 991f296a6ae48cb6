"""Audio encoder + face model tests (tiny configs, CPU)."""

import numpy as np
import pytest

from msa_tpu.models import audio as AM
from msa_tpu.models import face as FM


def test_audio_encoder_shapes_and_d7_contract(rng):
    cfg = AM.AudioModelConfig.tiny()
    model = AM.AudioEmotionModel(cfg)
    params = AM.init_params(model, samples=4000)
    wav = rng.normal(size=(2, 4000)).astype(np.float32)
    out = model.apply({"params": params}, wav)
    assert out["probs4"].shape == (2, 4)
    assert out["emotion_probs"].shape == (2, 8)
    p = np.asarray(out["emotion_probs"])
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    # D7: duplicated halves are equal (audio_analyzer.py:162-168)
    np.testing.assert_allclose(p[:, :4], p[:, 4:], atol=1e-6)
    np.testing.assert_allclose(p[:, :4] * 2, np.asarray(out["probs4"]), atol=1e-5)


def test_audio_encoder_downsampling():
    cfg = AM.AudioModelConfig.tiny()
    assert cfg.downsample_factor() == 20
    model = AM.AudioEmotionModel(cfg)
    params = AM.init_params(model, samples=4000)
    wav = np.zeros((1, 4000), np.float32)
    out = model.apply({"params": params}, wav)
    # VALID conv framing: floor behavior, > 0 frames
    assert out["hidden"].shape[1] > 0
    assert out["hidden"].shape[2] == cfg.encoder.d_model


def test_landmark_net_outputs(rng):
    cfg = FM.FaceModelConfig.tiny()
    model = FM.FaceLandmarkNet(cfg)
    params = FM.init_landmark_params(model)
    frame = rng.random((2, cfg.frame_size, cfg.frame_size, 3)).astype(np.float32)
    out = model.apply({"params": params}, frame)
    lm = np.asarray(out["landmarks"])
    assert lm.shape == (2, 478, 3)
    assert (lm[..., :2] >= 0).all() and (lm[..., :2] <= 1).all()
    assert (np.abs(lm[..., 2]) <= 0.1 + 1e-6).all()
    pres = np.asarray(out["presence"])
    assert pres.shape == (2,)
    assert (pres >= 0).all() and (pres <= 1).all()


def test_emotion_cnn_probs(rng):
    cfg = FM.FaceModelConfig.tiny()
    model = FM.FaceEmotionCNN(cfg)
    params = FM.init_emotion_params(model)
    crop = rng.random((3, cfg.crop_size, cfg.crop_size, 1)).astype(np.float32)
    probs = np.asarray(model.apply({"params": params}, crop))
    assert probs.shape == (3, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_bilinear_crop_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((64, 80, 3)).astype(np.float32)
    bbox = np.asarray([10.0, 8.0, 40.0, 32.0], np.float32)
    got = np.asarray(FM.bilinear_crop_resize(img, bbox, 16))
    crop = img[8 : 8 + 32, 10 : 10 + 40]
    want = cv2.resize(crop, (16, 16), interpolation=cv2.INTER_LINEAR)
    # identical sample-center convention as OpenCV bilinear
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_bilinear_crop_degenerate_bbox_uses_full_frame(rng):
    img = rng.random((32, 32, 1)).astype(np.float32)
    got = np.asarray(FM.bilinear_crop_resize(img, np.zeros(4, np.float32), 8))
    want = np.asarray(
        FM.bilinear_crop_resize(img, np.asarray([0, 0, 32, 32], np.float32), 8)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rgb_to_gray():
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 0] = 1.0
    gray = np.asarray(FM.rgb_to_gray(rgb))
    np.testing.assert_allclose(gray, 0.299, atol=1e-6)


def test_audio_trunk_matches_hf_wav2vec2(rng):
    """Convert a random-init transformers Wav2Vec2Model's weights and require
    the hidden states to match within 1e-4 (the audio counterpart of the BERT
    import test — pretrained trunks drop in when checkpoints are available)."""

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from msa_tpu.models.audio import params_from_hf_wav2vec2
    from msa_tpu.models.transformer import EncoderConfig

    cfg = AM.AudioModelConfig(
        conv_channels=(8, 8),
        conv_kernels=(10, 8),
        conv_strides=(5, 4),
        pool_hidden=8,
        positional="conv",
        pos_conv_kernel=16,
        pos_conv_groups=2,
        encoder=EncoderConfig(
            num_layers=2, d_model=32, num_heads=2, d_ff=64, layer_norm_eps=1e-5
        ),
    )
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=(8, 8),
        conv_kernel=(10, 8),
        conv_stride=(5, 4),
        num_feat_extract_layers=2,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_act="gelu",
        feat_extract_activation="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    hf = transformers.Wav2Vec2Model(hf_cfg)
    hf.eval()

    model = AM.AudioEmotionModel(cfg)
    params = AM.init_params(model, samples=4000)
    trunk = params_from_hf_wav2vec2(hf.state_dict(), cfg)
    merged = dict(params)
    for k, v in trunk.items():
        merged[k] = v

    wav = (0.1 * rng.normal(size=(2, 4000))).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": merged}, wav)["hidden"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extractor_matmul_impl_matches_conv(rng):
    """extractor_impl='matmul' must equal the lax-conv path bit-for-bit in
    f32, on the SAME params (identical conv_{i}/kernel tree), including odd
    intermediate lengths and both kernel sizes (3 and 2)."""
    import dataclasses

    import jax

    cfg = AM.AudioModelConfig(
        conv_channels=(16, 16, 16, 16),
        conv_kernels=(10, 3, 3, 2),
        conv_strides=(5, 2, 2, 2),
        encoder=AM.EncoderConfig.tiny(),
    )
    fx = AM.ConvFeatureExtractor(cfg)
    wav = rng.normal(size=(2, 4003)).astype(np.float32)
    params = fx.init(jax.random.PRNGKey(0), wav)["params"]

    fx_mm = AM.ConvFeatureExtractor(dataclasses.replace(cfg, extractor_impl="matmul"))
    params_mm = fx_mm.init(jax.random.PRNGKey(0), wav)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_mm)

    out_conv = np.asarray(fx.apply({"params": params}, wav))
    out_mm = np.asarray(fx_mm.apply({"params": params}, wav))
    assert out_conv.shape == out_mm.shape
    np.testing.assert_allclose(out_mm, out_conv, atol=2e-5)
