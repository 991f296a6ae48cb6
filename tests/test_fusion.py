"""Fusion MLP numerics parity and behavior tests.

The parity contract (BASELINE.json): per-segment fused outputs within 1e-3 of
the reference math. Verified two independent ways:

1. a pure-numpy golden implementation of the reference architecture
   (LayerNorm eps 1e-5 → Linear → processor blocks → fusion head,
   reference fusion_model.py:44-95, :386-417) driven by the SAME params;
2. a torch cross-check constructing torch.nn layers with copied weights.

Also covers: 1/2/3-modality dispatch (fusion_model.py:139-178), the fuse_combo
lax.switch path, get_weights softmax order (fusion_model.py:192-203),
checkpoint save/load/create-if-missing (fusion_model.py:239-294), and the
repaired KL training loss.
"""

import numpy as np
import pytest

from msa_tpu.models import fusion as F

from conftest import np_layer_norm


@pytest.fixture(scope="module")
def model_and_params():
    model = F.FusionMLP()
    params = F.init_params(model, seed=42)
    return model, params


def _inputs(rng, batch=2):
    face = rng.normal(size=(batch, 27)).astype(np.float32)
    audio = rng.normal(size=(batch, 31)).astype(np.float32)
    text = rng.normal(size=(batch, 783)).astype(np.float32)
    return face, audio, text


# --- numpy golden of the reference math -------------------------------------


def _np_affine_ln(x, scale, bias, eps=1e-5):
    return np_layer_norm(x, eps) * np.asarray(scale) + np.asarray(bias)


def _np_dense(x, p):
    return x @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"], np.float64)


def _np_branch(params, mod, x):
    x = _np_affine_ln(x, params[f"{mod}_norm"]["scale"], params[f"{mod}_norm"]["bias"])
    x = _np_dense(x, params[f"{mod}_proj"])
    x = _np_affine_ln(
        x, params[f"{mod}_proc_ln1"]["scale"], params[f"{mod}_proc_ln1"]["bias"]
    )
    x = np.maximum(x, 0)
    x = _np_dense(x, params[f"{mod}_proc_fc"])
    x = _np_affine_ln(
        x, params[f"{mod}_proc_ln2"]["scale"], params[f"{mod}_proc_ln2"]["bias"]
    )
    return np.maximum(x, 0)


def _np_head_tail(params, x):
    x = _np_affine_ln(x, params["fusion_ln1"]["scale"], params["fusion_ln1"]["bias"])
    x = np.maximum(x, 0)
    x = _np_dense(x, params["fusion_fc2"])
    x = _np_affine_ln(x, params["fusion_ln2"]["scale"], params["fusion_ln2"]["bias"])
    x = np.maximum(x, 0)
    return _np_dense(x, params["fusion_out"])


def _np_fuse3(params, face, audio, text):
    x = np.concatenate(
        [
            _np_branch(params, "face", face),
            _np_branch(params, "audio", audio),
            _np_branch(params, "text", text),
        ],
        axis=-1,
    )
    return _np_head_tail(params, _np_dense(x, params["fusion_fc1"]))


def _np_fuse2(params, mod_a, xa, mod_b, xb):
    x = np.concatenate(
        [_np_branch(params, mod_a, xa), _np_branch(params, mod_b, xb)], axis=-1
    )
    return _np_head_tail(params, _np_dense(x, params["fusion2"]))


def test_fuse3_matches_numpy_golden(model_and_params, rng):
    model, params = model_and_params
    face, audio, text = _inputs(rng)
    out = model.apply({"params": params}, face, audio, text)
    golden = _np_fuse3(params, face, audio, text)
    np.testing.assert_allclose(np.asarray(out["fused"]), golden, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["fused"]), golden, atol=1e-4)


def test_fuse2_face_audio_matches_numpy_golden(model_and_params, rng):
    model, params = model_and_params
    face, audio, _ = _inputs(rng)
    out = model.apply({"params": params}, face=face, audio=audio)
    golden = _np_fuse2(params, "face", face, "audio", audio)
    np.testing.assert_allclose(np.asarray(out["fused"]), golden, atol=1e-4)
    assert "text" not in out


def test_fuse2_repaired_paths_use_bridge(model_and_params, rng):
    """D5 repair: face+text and audio+text go through the fusion2 bridge
    instead of crashing into passthrough (reference fusion_model.py:330-384)."""
    model, params = model_and_params
    face, audio, text = _inputs(rng)
    out_ft = model.apply({"params": params}, face=face, text=text)
    np.testing.assert_allclose(
        np.asarray(out_ft["fused"]),
        _np_fuse2(params, "face", face, "text", text),
        atol=1e-4,
    )
    out_at = model.apply({"params": params}, audio=audio, text=text)
    np.testing.assert_allclose(
        np.asarray(out_at["fused"]),
        _np_fuse2(params, "audio", audio, "text", text),
        atol=1e-4,
    )


def test_single_modality_passthrough(model_and_params, rng):
    """Reference fusion_model.py:155-162 returns the raw vector."""
    model, params = model_and_params
    face, _, _ = _inputs(rng)
    out = model.apply({"params": params}, face=face)
    assert set(out) == {"face"}
    np.testing.assert_array_equal(np.asarray(out["face"]), face)


def test_fuse_combo_switch_matches_python_dispatch(model_and_params, rng):
    import jax.numpy as jnp

    model, params = model_and_params
    FusionCombo = F.FusionMLP.fuse_combo
    face, audio, text = _inputs(rng, batch=1)
    ref3 = model.apply({"params": params}, face, audio, text)["fused"]
    got3 = model.apply(
        {"params": params},
        face,
        audio,
        text,
        jnp.asarray(0b111),
        method=FusionCombo,
    )
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3), atol=1e-5)

    ref_fa = model.apply({"params": params}, face=face, audio=audio)["fused"]
    got_fa = model.apply(
        {"params": params}, face, audio, text, jnp.asarray(0b110), method=FusionCombo
    )
    np.testing.assert_allclose(np.asarray(got_fa), np.asarray(ref_fa), atol=1e-5)

    # single-modality combo returns the leading 7 dims of the raw vector
    got_face = model.apply(
        {"params": params}, face, audio, text, jnp.asarray(0b100), method=FusionCombo
    )
    np.testing.assert_array_equal(np.asarray(got_face), face[:, :7])


def test_torch_cross_check(model_and_params, rng):
    """Cross-framework parity: the same params executed by torch.nn layers."""
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    face, audio, text = _inputs(rng)

    def t_dense(p):
        lin = torch.nn.Linear(
            np.asarray(p["kernel"]).shape[0], np.asarray(p["kernel"]).shape[1]
        )
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T.copy()))
            lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"]).copy()))
        return lin

    def t_ln(p):
        dim = np.asarray(p["scale"]).shape[0]
        ln = torch.nn.LayerNorm(dim)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(np.asarray(p["scale"]).copy()))
            ln.bias.copy_(torch.from_numpy(np.asarray(p["bias"]).copy()))
        return ln

    def t_branch(mod, x):
        x = t_ln(params[f"{mod}_norm"])(x)
        x = t_dense(params[f"{mod}_proj"])(x)
        x = torch.relu(t_ln(params[f"{mod}_proc_ln1"])(x))
        x = t_dense(params[f"{mod}_proc_fc"])(x)
        return torch.relu(t_ln(params[f"{mod}_proc_ln2"])(x))

    with torch.no_grad():
        tf = t_branch("face", torch.from_numpy(face))
        ta = t_branch("audio", torch.from_numpy(audio))
        tt = t_branch("text", torch.from_numpy(text))
        x = t_dense(params["fusion_fc1"])(torch.cat([tf, ta, tt], dim=-1))
        x = torch.relu(t_ln(params["fusion_ln1"])(x))
        x = t_dense(params["fusion_fc2"])(x)
        x = torch.relu(t_ln(params["fusion_ln2"])(x))
        want = t_dense(params["fusion_out"])(x).numpy()

    out = model.apply({"params": params}, face, audio, text)
    np.testing.assert_allclose(np.asarray(out["fused"]), want, atol=1e-3)


def test_get_weights_softmax(model_and_params):
    model, params = model_and_params
    w = F.get_weights(model, params)
    assert set(w) == {"audio", "text", "face"}
    np.testing.assert_allclose(sum(w.values()), 1.0, atol=1e-6)
    # init values audio 0.3 / text 0.3 / face 0.4 → face has the largest share
    assert w["face"] > w["audio"] == pytest.approx(w["text"], abs=1e-6)


def test_checkpoint_roundtrip(tmp_path, model_and_params, rng):
    model, params = model_and_params
    path = str(tmp_path / "ckpt" / "best_model.msgpack")
    F.save_checkpoint(path, model, params)
    model2, params2, weights = F.load_checkpoint(path)
    face, audio, text = _inputs(rng)
    a = model.apply({"params": params}, face, audio, text)["fused"]
    b = model2.apply({"params": params2}, face, audio, text)["fused"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert weights["face"] == pytest.approx(F.get_weights(model, params)["face"])


def test_checkpoint_create_if_missing(tmp_path):
    """Reference fusion_model.py:286-294: missing checkpoint → fresh model is
    created AND saved to the path."""
    path = tmp_path / "nope" / "model.msgpack"
    model, params, _ = F.load_checkpoint(str(path))
    assert path.exists()
    model2, params2, _ = F.load_checkpoint(str(path))
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compute_loss_matches_torch_kl(model_and_params, rng):
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    face, audio, text = _inputs(rng, batch=4)
    target = rng.random((4, 7)).astype(np.float32)
    target /= target.sum(axis=1, keepdims=True)
    loss, pred = F.compute_loss(model, params, face, audio, text, target)
    with torch.no_grad():
        want = torch.nn.functional.kl_div(
            torch.log(torch.from_numpy(np.asarray(pred)) + 1e-8),
            torch.from_numpy(target),
            reduction="batchmean",
        ).item()
    assert float(loss) == pytest.approx(want, abs=1e-4)
    assert np.isfinite(float(loss))


def test_dropout_active_in_training_mode(model_and_params, rng):
    import jax

    model, params = model_and_params
    face, audio, text = _inputs(rng)
    out1 = model.apply(
        {"params": params},
        face,
        audio,
        text,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )["fused"]
    out2 = model.apply(
        {"params": params},
        face,
        audio,
        text,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )["fused"]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
