"""Lexicon-supervised training for the four text heads.

Closes the text-semantics gap: the reference instantiated FIVE pretrained
Portuguese BERT classifiers (reference ``src/analyzers/text_analyzer.py:
28-60``) — emotion 7, sarcasm 2, humor 2, sentiment 3, plus the context
embedder. None of those checkpoints are downloadable here, so the four
classification heads are trained on synthetic Portuguese sentences whose
lexicon encodes the label (:mod:`msa_tpu.training.text_synth`), over the
FROZEN deterministic trunk the default pipeline builds
(``PipelineModels.initialize(seed=0)`` → text seed 3) — the same
frozen-trunk recipe as the shipped audio head
(:mod:`msa_tpu.training.train_audio_emotion`).

The emotion head is trained in the CANONICAL class order
(:data:`msa_tpu.core.emotions.CANONICAL`) — the order
``emotion_probs_raw`` is documented to carry through the pipeline — and
the sentiment head in [negative, neutral, positive] (the D4-repair
contract: polarity = P(pos) − P(neg)).

CLI: ``python -m msa_tpu.training.train_text_heads`` writes
``checkpoints/text_heads.msgpack`` with one {kernel, bias} tree per head.
"""

from __future__ import annotations

import logging
import zlib
from typing import Any, Dict, Tuple

import numpy as np

from msa_tpu.training import text_synth
from msa_tpu.training.train_audio_emotion import train_head

logger = logging.getLogger(__name__)

TOKENS = 64  # one static shape for the cached trunk forward

TASKS: Tuple[Tuple[str, Any, int], ...] = (
    ("emotion_head", text_synth.emotion_sentences, 7),
    ("sentiment_head", text_synth.sentiment_sentences, 3),
    ("sarcasm_head", text_synth.sarcasm_sentences, 2),
    ("humor_head", text_synth.humor_sentences, 2),
)


def encode_batch(tokenizer, texts, tokens: int = TOKENS):
    ids = np.zeros((len(texts), tokens), np.int32)
    mask = np.zeros((len(texts), tokens), np.int32)
    for i, t in enumerate(texts):
        ids[i], mask[i] = tokenizer.encode(t, max_length=tokens)
    return ids, mask


def cls_features(
    model, params, tokenizer, texts, batch: int = 64, tokens: int = TOKENS
) -> np.ndarray:
    """Frozen-trunk [CLS] features [N, d_model], one jitted shape."""
    import jax

    fwd = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m)["context_embedding"]
    )
    ids, mask = encode_batch(tokenizer, texts, tokens)
    out = []
    for lo in range(0, len(texts), batch):
        ci, cm = ids[lo : lo + batch], mask[lo : lo + batch]
        if len(ci) < batch:  # keep ONE compiled shape
            pad = batch - len(ci)
            ci = np.pad(ci, [(0, pad), (0, 0)])
            cm = np.pad(cm, [(0, pad), (0, 0)])
        out.append(np.asarray(fwd(params, ci, cm))[: len(texts) - lo])
    return np.concatenate(out, axis=0)


def evaluate_heads(
    model, params, tokenizer, heads: Dict[str, Any], n: int = 256, seed: int = 1,
    adversarial: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Held-out metrics per task: fresh sentences from the RESERVED
    (word × template) grid cells — compositions never seen in training
    (:func:`msa_tpu.training.text_synth._holdout_templates`).

    ``adversarial=True`` additionally wraps every held-out sentence in OOV
    pseudo-word context (text_synth.with_oov_context): same labels, same
    surface tokens, but shifted positions + unseen-token noise — a protocol
    whose number moves when robustness degrades, unlike the saturating
    in-family holdout (VERDICT r4 #5)."""
    from msa_tpu.training.text_synth import with_oov_context

    metrics: Dict[str, Dict[str, float]] = {}
    for name, gen, _ in TASKS:
        rng = np.random.default_rng(seed + zlib.crc32(name.encode()) % 1000)
        texts, labels = gen(rng, n, holdout=True)
        if adversarial:
            texts = with_oov_context(rng, texts)
        feats = cls_features(model, params, tokenizer, texts)
        logits = feats @ heads[name]["kernel"] + heads[name]["bias"]
        pred = logits.argmax(axis=-1)
        acc = float((pred == labels).mean())
        recalls = [
            float((pred[labels == k] == k).mean())
            for k in range(logits.shape[-1])
            if (labels == k).any()
        ]
        metrics[name] = {"accuracy": acc, "worst_class_recall": min(recalls)}
    return metrics


def train(
    model=None,
    params=None,
    tokenizer=None,
    n_train: int = 4096,
    steps: int = 3000,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, Dict[str, float]]]:
    """Full recipe: synth sentences → frozen-trunk CLS cache → fit each
    linear head → held-out eval. Returns ({head: {kernel, bias}}, metrics)."""
    from msa_tpu.models import text as text_lib
    from msa_tpu.models.text import TextModel, TextModelConfig, WordPieceTokenizer

    cfg = TextModelConfig()
    if model is None:
        model = TextModel(cfg)
    if params is None:
        # the trunk the default pipeline builds: PipelineModels.initialize
        # seeds the text model with seed+3 (pipeline/graph.py)
        params = text_lib.init_params(model, seed + 3)
    if tokenizer is None:
        tokenizer = WordPieceTokenizer(vocab_size=cfg.vocab_size)

    from msa_tpu.training.text_synth import with_oov_context

    heads: Dict[str, Any] = {}
    for name, gen, n_classes in TASKS:
        rng = np.random.default_rng(seed + 100 + zlib.crc32(name.encode()) % 1000)
        texts, labels = gen(rng, n_train)
        # OOV-noise augmentation (round 5): ~30% of training sentences are
        # wrapped in pseudo-word context so keyword detection learns to
        # ignore unseen-token embeddings — field text contains words outside
        # every lexicon, and the unaugmented heads measured 0.38–0.79 on the
        # adversarial protocol vs 0.78–0.99 in-family (metrics.json)
        noisy = rng.random(len(texts)) < 0.3
        wrapped = with_oov_context(rng, [t for t, z in zip(texts, noisy) if z])
        it = iter(wrapped)
        texts = [next(it) if z else t for t, z in zip(texts, noisy)]
        feats = cls_features(model, params, tokenizer, texts)
        head0 = {
            "kernel": np.asarray(params[name]["kernel"], np.float32),
            "bias": np.asarray(params[name]["bias"], np.float32),
        }
        assert head0["kernel"].shape[-1] == n_classes
        heads[name] = train_head(
            feats, labels, head0, steps=steps, seed=seed, log_every=log_every
        )
        logger.info("trained %s on %d sentences", name, n_train)
    metrics = evaluate_heads(model, params, tokenizer, heads)
    return heads, metrics


def save_heads(heads: Dict[str, Any], path: str) -> None:
    from pathlib import Path

    import flax.serialization

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(flax.serialization.to_bytes(heads))


def load_heads(path: str) -> Dict[str, Any]:
    """→ {head_name: {kernel, bias}} numpy trees (msgpack restore without a
    template keeps the stored structure)."""
    from pathlib import Path

    import flax.serialization

    return flax.serialization.msgpack_restore(Path(path).read_bytes())


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Treina os classificadores de texto (léxico sintético)"
    )
    parser.add_argument("--n-train", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--out", default="checkpoints/text_heads.msgpack")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    heads, metrics = train(n_train=args.n_train, steps=args.steps, log_every=500)
    for name, m in metrics.items():
        logger.info("%s: %s", name, m)
    save_heads(heads, args.out)
    logger.info("wrote %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
