"""Text analysis model — one shared BERT trunk + four heads + CLS embedding.

The reference loads FIVE full BERT-base instances from
``neuralmind/bert-base-portuguese-cased`` — emotion (7 labels), context
embedder, sarcasm (2), humor (2), sentiment (3) — and runs five separate
forwards per utterance (reference ``src/analyzers/text_analyzer.py:28-60``,
``:76-96``; SURVEY §6 counts 5 BERT forwards/segment). That is 5× the memory
and 5× the FLOPs for identical trunks.

TPU-native redesign: ONE trunk forward produces the hidden states; the four
classification heads and the [CLS] context embedding read from it in the same
jitted graph. Coherence (mean cosine similarity of consecutive token
embeddings, text_analyzer.py:243-273) is computed in-graph from the same
hidden states instead of a sixth forward.

Defect decisions:
- D4 (sentiment unpack crash → text always degraded to defaults): repaired to
  the documented intent — 3-way [negative, neutral, positive] softmax mapped
  to polarity = P(pos) − P(neg) ∈ [−1, 1] and intensity = 1 − P(neutral).
- D12 (new): the reference's coherence calls torch.cosine_similarity with
  dim=0 over a singleton batch dim and then torch.tensor() over a list of
  768-dim tensors, which raises → coherence is always 0.0. Implemented here
  per intent: cosine similarity along the feature dim, masked mean over
  consecutive valid tokens.

Weight import: :func:`params_from_hf_bert` converts a ``transformers``
BertModel state dict into this trunk's params so pretrained Portuguese BERT
weights drop in when a checkpoint is available (none are downloadable in this
environment; conversion is covered by a random-init equivalence test).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.models.transformer import EncoderConfig, TransformerEncoder


@dataclasses.dataclass(frozen=True)
class TextModelConfig:
    vocab_size: int = 29794  # neuralmind/bert-base-portuguese-cased
    max_positions: int = 512
    type_vocab_size: int = 2
    # trained head asset (training.train_text_heads, lexicon-supervised over
    # the default deterministic trunk — same shipped-checkpoint pattern as
    # the audio head). Only applied to default-initialized trunks: an
    # imported trunk produces different [CLS] features.
    head_weights: "str | None" = "checkpoints/text_heads.msgpack"
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)

    @classmethod
    def tiny(cls) -> "TextModelConfig":
        # head_weights=None: the shipped full-size heads must not load into
        # the tiny trunk (shape mismatch)
        return cls(
            vocab_size=128,
            max_positions=64,
            head_weights=None,
            encoder=EncoderConfig.tiny(),
        )


class BertEmbeddings(nn.Module):
    cfg: TextModelConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        c = self.cfg
        d = c.encoder.d_model
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        positions = jnp.arange(input_ids.shape[-1])[None, :]
        x = (
            nn.Embed(c.vocab_size, d, name="word_embeddings")(input_ids)
            + nn.Embed(c.max_positions, d, name="position_embeddings")(positions)
            + nn.Embed(c.type_vocab_size, d, name="token_type_embeddings")(
                token_type_ids
            )
        )
        x = nn.LayerNorm(epsilon=c.encoder.layer_norm_eps, name="ln")(x)
        return nn.Dropout(c.encoder.dropout)(x, deterministic=deterministic)


class TextModel(nn.Module):
    """Trunk + heads. Head dims mirror the reference instantiations
    (text_analyzer.py:28-60): emotion 7, sarcasm 2, humor 2, sentiment 3."""

    cfg: TextModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [b, t] int32
        attention_mask: jnp.ndarray,  # [b, t] 1 = real token
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        x = BertEmbeddings(c, name="embeddings")(
            input_ids, deterministic=deterministic
        )
        hidden = TransformerEncoder(c.encoder, name="encoder")(
            x, attention_mask, deterministic
        )  # [b, t, d]
        hidden_f32 = hidden.astype(jnp.float32)
        cls = hidden_f32[:, 0, :]  # [CLS] embedding (text_analyzer.py:223)

        # Heads read the [CLS] state — equivalent placement to the
        # reference's BertForSequenceClassification pooled heads.
        emotion_logits = nn.Dense(7, name="emotion_head")(cls)
        sarcasm_logits = nn.Dense(2, name="sarcasm_head")(cls)
        humor_logits = nn.Dense(2, name="humor_head")(cls)
        sentiment_logits = nn.Dense(3, name="sentiment_head")(cls)

        emotion_probs = nn.softmax(emotion_logits, axis=-1)  # [b, 7]
        sarcasm = nn.softmax(sarcasm_logits, axis=-1)[:, 1:2]  # P(sarcasm)
        humor = nn.softmax(humor_logits, axis=-1)[:, 1:2]  # P(humor)
        sentiment = nn.softmax(sentiment_logits, axis=-1)  # [neg, neu, pos]
        polarity = (sentiment[:, 2] - sentiment[:, 0])[:, None]  # D4 repair
        intensity = (1.0 - sentiment[:, 1])[:, None]

        # Coherence (D12 repair): masked mean cosine similarity between
        # consecutive token hidden states.
        a = hidden_f32[:, :-1, :]
        b = hidden_f32[:, 1:, :]
        cos = jnp.sum(a * b, axis=-1) / (
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
        )  # [b, t-1]
        pair_mask = (attention_mask[:, :-1] * attention_mask[:, 1:]).astype(
            jnp.float32
        )
        coherence = jnp.sum(cos * pair_mask, axis=-1) / jnp.maximum(
            jnp.sum(pair_mask, axis=-1), 1.0
        )

        return {
            "last_hidden_state": hidden_f32,
            "context_embedding": cls,  # [b, 768]
            "emotion_probs": emotion_probs,
            "sarcasm_score": sarcasm,
            "humor_score": humor,
            "sentiment": sentiment,
            "polarity": polarity,
            "intensity": intensity,
            "coherence": coherence,  # [b]
        }


def _init_host(model: TextModel, seed: int) -> Any:
    t = min(8, model.cfg.max_positions)
    ids = jnp.zeros((1, t), jnp.int32)
    mask = jnp.ones((1, t), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), ids, mask)["params"]


def init_params(model: TextModel, seed: int = 0) -> Any:
    """Init on the host CPU backend, then ONE transfer to the accelerator —
    eager flax init over the axon tunnel measured 40 s for this trunk
    (see msa_tpu.utils.host_init)."""
    from msa_tpu.utils.host_init import host_init

    return host_init(_init_host, model, seed)


# --- host-side text quality heuristics (string ops stay on host) -------------


def completeness(text: str) -> float:
    """Subject/verb-suffix/punctuation heuristic, exact reference formula
    (text_analyzer.py:275-287, Portuguese verb endings -ar/-er/-ir)."""
    try:
        words = text.split()
        has_subject = len([t for t in words if t.isalpha()]) > 0
        has_verb = (
            len([t for t in words if t.endswith(("ar", "er", "ir"))]) > 0
        )
        has_punct = any(c in text for c in (".", "!", "?"))
        return float(0.4 * has_subject + 0.4 * has_verb + 0.2 * has_punct)
    except Exception:
        return 0.0


RELEVANT_WORDS = ("emoção", "sentimento", "expressão", "reação", "comportamento")


def relevance(text: str) -> float:
    """Keyword density, exact reference formula (text_analyzer.py:289-303)."""
    try:
        count = sum(1 for w in RELEVANT_WORDS if w in text.lower())
        total = len(text.split())
        if total == 0:
            return 0.0
        return float(min(count / total, 1.0))
    except Exception:
        return 0.0


def text_quality(coherence: float, completeness_: float, relevance_: float) -> float:
    """0.4·coherence + 0.3·completeness + 0.3·relevance
    (text_analyzer.py:230-241)."""
    return 0.4 * coherence + 0.3 * completeness_ + 0.3 * relevance_


# --- tokenizer ---------------------------------------------------------------


class WordPieceTokenizer:
    """Minimal WordPiece tokenizer compatible with BERT vocab files.

    Loads a ``vocab.txt`` when available (one token per line, HF format); in
    environments without downloadable tokenizer assets it falls back to a
    deterministic hashing tokenizer over the configured vocab size so the
    whole pipeline stays runnable and reproducible. The interface matches the
    reference call sites (truncation to ``max_length`` = 512,
    text_analyzer.py:143).
    """

    CLS = "[CLS]"
    SEP = "[SEP]"
    PAD = "[PAD]"
    UNK = "[UNK]"

    def __init__(
        self,
        vocab_file: Optional[str] = None,
        vocab_size: int = 29794,
        do_lower_case: bool = False,
    ):
        # the reference's BERT is CASED (neuralmind/bert-base-portuguese-
        # cased); case is preserved unless a lowercase vocab asks otherwise
        self.do_lower_case = do_lower_case
        self.vocab: Optional[Dict[str, int]] = None
        self.vocab_size = vocab_size
        if vocab_file:
            vocab = {}
            with open(vocab_file, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    vocab[line.rstrip("\n")] = i
            self.vocab = vocab
            self.vocab_size = len(vocab)
        # Special ids: HF BERT convention when hashing.
        self.pad_id = self._tok_id(self.PAD, 0)
        self.unk_id = self._tok_id(self.UNK, 100)
        self.cls_id = self._tok_id(self.CLS, 101)
        self.sep_id = self._tok_id(self.SEP, 102)

    def _tok_id(self, token: str, default: int) -> int:
        if self.vocab is not None:
            return self.vocab.get(token, default)
        return default

    def _hash_id(self, token: str) -> int:
        # Deterministic FNV-1a; reserves low ids for specials (1000 like HF
        # BERT's unused range when the vocab is big enough, 104 otherwise).
        lo = 1000 if self.vocab_size > 2000 else 104
        h = 2166136261
        for ch in token.encode("utf-8"):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return lo + h % (self.vocab_size - lo)

    def _wordpiece(self, word: str):
        """Greedy longest-match-first WordPiece (BERT algorithm)."""
        assert self.vocab is not None
        if len(word) > 100:
            return [self.unk_id]
        out, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            out.append(cur)
            start = end
        return out

    def encode(
        self, text: str, max_length: int = 512
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (input_ids[max_length], attention_mask[max_length]) int32,
        padded/truncated to the static length."""
        # hash mode normalizes case for determinism; vocab mode preserves it
        words = (
            text.lower().split()
            if self.do_lower_case or self.vocab is None
            else text.split()
        )
        ids = [self.cls_id]
        for w in words:
            w = "".join(ch for ch in w if ch.isalnum() or ch in "#'-")
            if not w:
                continue
            if self.vocab is not None:
                ids.extend(self._wordpiece(w))
            else:
                ids.append(self._hash_id(w))
            if len(ids) >= max_length - 1:
                break
        ids = ids[: max_length - 1] + [self.sep_id]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        ids = ids + [self.pad_id] * pad
        mask = mask + [0] * pad
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


# --- HF weight import --------------------------------------------------------


def params_from_hf_bert(state_dict: Dict[str, Any], cfg: TextModelConfig) -> Any:
    """Convert a ``transformers`` BertModel state dict (torch tensors or
    numpy arrays, standard ``embeddings./encoder.layer.N.`` naming) into this
    module's trunk params. Heads are NOT populated (the reference's heads are
    random-init too — it loads base BERT into classification models)."""

    def g(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
            "position_embeddings": {
                "embedding": g("embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {
                "embedding": g("embeddings.token_type_embeddings.weight")
            },
            "ln": {
                "scale": g("embeddings.LayerNorm.weight"),
                "bias": g("embeddings.LayerNorm.bias"),
            },
        },
        "encoder": {},
    }
    for i in range(cfg.encoder.num_layers):
        hf = f"encoder.layer.{i}."
        p["encoder"][f"layer_{i}"] = {
            "attention": {
                # q/k/v concatenated into the trunk's fused [d, 3d] projection
                "qkv": {
                    "kernel": np.concatenate(
                        [
                            g(hf + f"attention.self.{n}.weight").T
                            for n in ("query", "key", "value")
                        ],
                        axis=1,
                    ),
                    "bias": np.concatenate(
                        [
                            g(hf + f"attention.self.{n}.bias")
                            for n in ("query", "key", "value")
                        ]
                    ),
                },
                "attn_out": {
                    "kernel": g(hf + "attention.output.dense.weight").T,
                    "bias": g(hf + "attention.output.dense.bias"),
                },
            },
            "attn_ln": {
                "scale": g(hf + "attention.output.LayerNorm.weight"),
                "bias": g(hf + "attention.output.LayerNorm.bias"),
            },
            "fc_in": {
                "kernel": g(hf + "intermediate.dense.weight").T,
                "bias": g(hf + "intermediate.dense.bias"),
            },
            "fc_out": {
                "kernel": g(hf + "output.dense.weight").T,
                "bias": g(hf + "output.dense.bias"),
            },
            "ffn_ln": {
                "scale": g(hf + "output.LayerNorm.weight"),
                "bias": g(hf + "output.LayerNorm.bias"),
            },
        }
    return p
