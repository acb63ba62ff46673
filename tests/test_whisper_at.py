"""whisper-at TL-TR head: torch-formulation parity + transcript filter
integration (reference: audio_transcript/transcribe.py:49,:70-95)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_llava_tpu.models import whisper as whisper_mod
from video_llava_tpu.models.whisper import WhisperATConfig, WhisperConfig

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class TBlock(nn.Module):
    """timm/AST-style pre-LN transformer block (the whisper-at Block)."""

    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(self.norm1(x)).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = torch.softmax(q @ k.transpose(-2, -1) / np.sqrt(hd), dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        h = torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x)))
        return x + self.mlp.fc2(h)


class TTLTR(nn.Module):
    def __init__(self, cfg: WhisperATConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.att_dim
        self.mlp_down = nn.Linear(cfg.rep_dim, d)
        self.time_tr = nn.ModuleList(
            [TBlock(d, cfg.num_heads) for _ in range(cfg.time_blocks)]
        )
        self.layer_tr = nn.ModuleList(
            [TBlock(d, cfg.num_heads) for _ in range(cfg.layer_blocks)]
        )
        self.mlp_head = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, cfg.n_class)
        )

    def forward(self, layer_states):  # (L, b, T, rep_dim)
        L, b, T, D = layer_states.shape
        p = self.cfg.pool_stride
        tp = T // p
        x = layer_states[:, :, : tp * p].reshape(L, b, tp, p, D).mean(3)
        x = self.mlp_down(x)
        t = x.reshape(L * b, tp, -1)
        for blk in self.time_tr:
            t = blk(t)
        tokens = t.mean(1).reshape(L, b, -1).permute(1, 0, 2)
        for blk in self.layer_tr:
            tokens = blk(tokens)
        return self.mlp_head(tokens.mean(1))


@pytest.fixture(scope="module")
def tltr_pair():
    cfg = WhisperATConfig(
        n_class=16, rep_dim=48, att_dim=32, num_heads=2, pool_stride=4,
        time_blocks=1, layer_blocks=1,
    )
    torch.manual_seed(0)
    tm = TTLTR(cfg).eval()
    params = whisper_mod.convert_whisper_at(tm.state_dict(), cfg)
    return tm, params, cfg


def test_tltr_parity(tltr_pair):
    tm, params, cfg = tltr_pair
    g = torch.Generator().manual_seed(1)
    ls = torch.randn(3, 2, 40, cfg.rep_dim, generator=g)
    with torch.no_grad():
        ref = tm(ls)
    out = whisper_mod.audio_tag_logits_tltr(
        params, jnp.asarray(ls.numpy()), cfg
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_tltr_windowed(tltr_pair):
    """Windowed tagging == tagging each window independently."""
    tm, params, cfg = tltr_pair
    g = torch.Generator().manual_seed(2)
    ls = torch.randn(3, 1, 40, cfg.rep_dim, generator=g)
    win = 5  # pooled tokens per window; 40/4 = 10 tokens -> 2 windows
    out = whisper_mod.audio_tag_logits_tltr(
        params, jnp.asarray(ls.numpy()), cfg, window_tokens=win
    )
    assert out.shape == (1, 2, cfg.n_class)
    with torch.no_grad():
        w0 = tm(ls[:, :, : win * cfg.pool_stride])
        w1 = tm(ls[:, :, win * cfg.pool_stride : 2 * win * cfg.pool_stride])
    np.testing.assert_allclose(np.asarray(out[0, 0]), w0[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 1]), w1[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_encode_layer_states():
    cfg = WhisperConfig.tiny_test()
    params = whisper_mod.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, cfg.n_mels, 200))
    out, ls = whisper_mod.encode(params, mel, cfg, return_layer_states=True)
    assert ls.shape == (cfg.encoder_layers,) + out.shape
    # Last tap is the pre-ln_post residual stream.
    from video_llava_tpu.models.layers import layer_norm

    np.testing.assert_allclose(
        np.asarray(layer_norm(params["encoder"]["ln_post"], ls[-1])),
        np.asarray(out), rtol=1e-5, atol=1e-5,
    )


def test_transcriber_tltr_filter():
    """Transcriber with a TL-TR head: biased head -> segment filter
    actually drives keep/drop decisions per window."""
    from video_llava_tpu.audio.transcribe import Transcriber

    cfg = WhisperConfig.tiny_test()
    params = whisper_mod.init_params(jax.random.PRNGKey(0), cfg)
    atcfg = WhisperATConfig(
        n_class=8, rep_dim=cfg.d_model, att_dim=32, num_heads=2,
        pool_stride=20, time_blocks=1, layer_blocks=1,
    )
    head = whisper_mod.init_at_head_tltr(jax.random.PRNGKey(1), atcfg)
    # Bias the classifier so speech (tag 0) always beats music (tag 1).
    head["head"]["bias"] = (
        jnp.zeros((atcfg.n_class,)).at[0].set(10.0).at[1].set(-10.0)
    )
    params = dict(params)
    params["at_head"] = head
    tr = Transcriber(
        params, cfg, decode_text=lambda ids: "hello",
        speech_tag=0, music_tags=(1,), at_cfg=atcfg,
    )
    audio = np.random.default_rng(0).standard_normal(16000 * 3).astype(
        np.float32
    ) * 0.01
    segs = tr.transcribe_audio(audio)
    assert segs and all(s.keep for s in segs)
    assert all(s.speech_logit > s.music_logit for s in segs)

    # Flip the bias: music dominates -> everything dropped.
    head["head"]["bias"] = (
        jnp.zeros((atcfg.n_class,)).at[0].set(-10.0).at[1].set(10.0)
    )
    tr2 = Transcriber(
        params, cfg, decode_text=lambda ids: "hello",
        speech_tag=0, music_tags=(1,), at_cfg=atcfg,
    )
    segs2 = tr2.transcribe_audio(audio)
    assert segs2 and not any(s.keep for s in segs2)


def test_transcriber_without_at_head_keeps_everything():
    """Plain HF whisper weights carry no at_head: the filter must keep
    all segments (an untrained/zero probe would drop all speech)."""
    from video_llava_tpu.audio.transcribe import Transcriber

    cfg = WhisperConfig.tiny_test()
    params = whisper_mod.init_params(jax.random.PRNGKey(0), cfg)
    params = {k: v for k, v in params.items() if k != "at_head"}
    tr = Transcriber(params, cfg, decode_text=lambda ids: "hi")
    audio = np.zeros(16000, np.float32)
    segs = tr.transcribe_audio(audio)
    assert segs and all(s.keep for s in segs)
