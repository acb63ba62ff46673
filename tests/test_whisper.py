"""Whisper: log-mel parity vs torch-STFT oracle, encoder/decoder parity
vs HF WhisperModel (random weights), greedy decode mechanics."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import transformers

from video_llava_tpu.models import whisper
from video_llava_tpu.models.whisper import WhisperConfig
from video_llava_tpu.ops.audio import (
    N_FFT,
    HOP_LENGTH,
    log_mel_spectrogram,
    mel_filterbank,
)


def _log_mel_torch(audio: np.ndarray) -> np.ndarray:
    """Oracle transcription of openai/whisper's log_mel_spectrogram."""
    x = torch.from_numpy(audio)
    n = 480000
    x = torch.nn.functional.pad(x, (0, n - x.shape[0]))
    window = torch.hann_window(N_FFT)
    stft = torch.stft(
        x, N_FFT, HOP_LENGTH, window=window, return_complex=True
    )
    mag = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank())
    mel = filters @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def test_log_mel_matches_torch_stft():
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(16000 * 3,)).astype(np.float32) * 0.1
    got = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    want = _log_mel_torch(audio)
    assert got.shape == want.shape == (80, 3000)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def whisper_pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=256,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=1500,
        max_target_positions=64,
        attn_implementation="eager",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(hf_cfg).eval()
    cfg = WhisperConfig.tiny_test()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = whisper.convert_hf_whisper(sd, cfg)
    return model, cfg, params


def test_encoder_matches_hf(whisper_pair):
    model, cfg, params = whisper_pair
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        want = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(whisper.encode(params, jnp.asarray(mel), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decoder_logits_match_hf(whisper_pair):
    model, cfg, params = whisper_pair
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, 80, 3000)).astype(np.float32)
    toks = rng.integers(0, 256, size=(1, 7))
    with torch.no_grad():
        enc = model.encoder(torch.from_numpy(mel)).last_hidden_state
        dec = model.decoder(
            input_ids=torch.from_numpy(toks), encoder_hidden_states=enc
        ).last_hidden_state
        want = (dec @ model.decoder.embed_tokens.weight.T).numpy()
    enc_j = whisper.encode(params, jnp.asarray(mel), cfg)
    got = np.asarray(
        whisper.decoder_forward(params, jnp.asarray(toks), enc_j, cfg)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_greedy_decode_shapes(whisper_pair):
    _, cfg, params = whisper_pair
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(2, 80, 3000)).astype(np.float32)
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    start = jnp.asarray([[1, 2], [1, 2]], jnp.int32)
    toks, lens = whisper.greedy_decode(params, enc, cfg, start, 8, eot_token=0)
    assert toks.shape == (2, 8)
    assert (np.asarray(lens) <= 8).all()


def test_audio_tag_head(whisper_pair):
    _, cfg, params = whisper_pair
    # convert_hf_whisper attaches NO at_head (HF weights carry none; a
    # zero probe would drop all speech in the filter) — the tagging head
    # comes from convert_whisper_at (tests/test_whisper_at.py) or init.
    assert "at_head" not in params
    init = whisper.init_params(jax.random.PRNGKey(0), cfg)
    enc = jnp.zeros((1, 1500, cfg.d_model))
    logits = whisper.audio_tag_logits(init, enc)
    assert logits.shape == (1, cfg.num_audio_tags)
