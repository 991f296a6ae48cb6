"""Text model tests.

Centerpiece: cross-framework equivalence of the BERT trunk against a
random-init ``transformers`` BertModel with converted weights — validates
that pretrained Portuguese BERT checkpoints (the reference's
neuralmind/bert-base-portuguese-cased, text_analyzer.py:28-60) would import
bit-compatibly when available.
"""

import numpy as np
import pytest

from msa_tpu.models import text as T


@pytest.fixture(scope="module")
def tiny_model():
    cfg = T.TextModelConfig.tiny()
    model = T.TextModel(cfg)
    params = T.init_params(model, seed=0)
    return cfg, model, params


def test_forward_shapes_and_ranges(tiny_model, rng):
    cfg, model, params = tiny_model
    ids = rng.integers(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0
    out = model.apply({"params": params}, ids, mask)
    assert out["emotion_probs"].shape == (2, 7)
    np.testing.assert_allclose(np.asarray(out["emotion_probs"]).sum(-1), 1.0, atol=1e-5)
    assert out["sarcasm_score"].shape == (2, 1)
    assert out["humor_score"].shape == (2, 1)
    assert out["context_embedding"].shape == (2, cfg.encoder.d_model)
    # D4 repair: polarity ∈ [−1, 1], intensity ∈ [0, 1]
    pol = np.asarray(out["polarity"])
    inten = np.asarray(out["intensity"])
    assert (pol >= -1).all() and (pol <= 1).all()
    assert (inten >= 0).all() and (inten <= 1).all()
    # coherence is a bounded cosine mean (D12 repair)
    coh = np.asarray(out["coherence"])
    assert coh.shape == (2,)
    assert (np.abs(coh) <= 1.0 + 1e-5).all()


def test_padding_mask_isolates_tokens(tiny_model, rng):
    """Padded positions must not affect [CLS]-derived outputs."""
    cfg, model, params = tiny_model
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16)).astype(np.int32)
    mask = np.ones((1, 16), np.int32)
    mask[0, 8:] = 0
    out_a = model.apply({"params": params}, ids, mask)
    ids_b = ids.copy()
    ids_b[0, 8:] = (ids_b[0, 8:] + 7) % cfg.vocab_size  # scramble padded ids
    out_b = model.apply({"params": params}, ids_b, mask)
    np.testing.assert_allclose(
        np.asarray(out_a["context_embedding"]),
        np.asarray(out_b["context_embedding"]),
        atol=1e-5,
    )


def test_trunk_matches_hf_bert(tiny_model, rng):
    """Convert a random-init transformers BertModel's weights and require the
    hidden states to match within 1e-4."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg, model, params = tiny_model

    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.encoder.d_model,
        num_hidden_layers=cfg.encoder.num_layers,
        num_attention_heads=cfg.encoder.num_heads,
        intermediate_size=cfg.encoder.d_ff,
        max_position_embeddings=cfg.max_positions,
        type_vocab_size=cfg.type_vocab_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    hf = transformers.BertModel(hf_cfg)
    hf.eval()

    trunk = T.params_from_hf_bert(hf.state_dict(), cfg)
    merged = dict(params)
    merged["embeddings"] = trunk["embeddings"]
    merged["encoder"] = trunk["encoder"]

    ids = rng.integers(0, cfg.vocab_size, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = np.asarray(
        model.apply({"params": merged}, ids, mask)["last_hidden_state"]
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quality_heuristics_reference_formulas():
    """text_analyzer.py:275-303 exact formulas."""
    assert T.completeness("eu vou falar agora.") == pytest.approx(1.0)
    assert T.completeness("ola mundo") == pytest.approx(0.4)  # no verb-suffix/punct
    assert T.completeness("") == 0.0
    assert T.relevance("a emoção aqui") == pytest.approx(1 / 3)
    assert T.relevance("nada relacionado") == 0.0
    assert T.relevance("") == 0.0
    assert T.text_quality(0.5, 1.0, 0.0) == pytest.approx(0.4 * 0.5 + 0.3)


def test_tokenizer_hash_fallback_deterministic():
    tok = T.WordPieceTokenizer(vocab_size=1000)
    ids1, mask1 = tok.encode("olá mundo feliz", max_length=16)
    ids2, mask2 = tok.encode("olá mundo feliz", max_length=16)
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1[0] == tok.cls_id
    assert ids1[mask1.sum() - 1] == tok.sep_id
    assert mask1.sum() == 5  # CLS + 3 words + SEP
    assert ids1.shape == (16,)
    # truncation to the static length
    long_ids, long_mask = tok.encode("palavra " * 100, max_length=16)
    assert long_ids.shape == (16,)
    assert long_mask.sum() == 16


def test_tokenizer_wordpiece_with_vocab(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "ola", "mun", "##do", "feliz"]
    f = tmp_path / "vocab.txt"
    f.write_text("\n".join(vocab) + "\n")
    tok = T.WordPieceTokenizer(str(f))
    ids, mask = tok.encode("ola mundo", max_length=8)
    # ola → [ola]; mundo → [mun, ##do]
    want = [tok.cls_id, 4, 5, 6, tok.sep_id, 0, 0, 0]
    np.testing.assert_array_equal(ids, want)
    assert mask.sum() == 5
    # unknown word → UNK
    ids2, _ = tok.encode("xyz", max_length=8)
    assert ids2[1] == 1


def test_remat_gradients_match(tiny_model, rng):
    """jax.checkpoint rematerialization must not change values or grads."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from msa_tpu.models.transformer import TransformerEncoder

    cfg, _, _ = tiny_model
    enc_cfg = cfg.encoder
    x = rng.normal(size=(2, 12, enc_cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 12), np.int32)

    enc = TransformerEncoder(enc_cfg)
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]
    enc_remat = TransformerEncoder(dataclasses.replace(enc_cfg, remat=True))

    def loss(e, p):
        return jnp.sum(e.apply({"params": p}, x, mask) ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(enc, p))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(enc_remat, p))(params)
    assert float(v1) == pytest.approx(float(v2), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
