"""CTC forced alignment: trellis vs brute force, synthetic-emission word
timings, wav2vec2 model shapes + HF converter."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_llava_tpu.audio.align import (
    ForcedAligner,
    WordTiming,
    align_tokens,
    ctc_trellis,
)
from video_llava_tpu.models import wav2vec2 as w2v

BLANK = 0


def _brute_force_best_path(emissions, targets, blank=BLANK):
    """Enumerate all valid CTC alignments (tiny cases only) and return
    the best path's per-frame ext positions."""
    ext = [blank]
    for t in targets:
        ext += [t, blank]
    T = emissions.shape[0]
    S = len(ext)

    best, best_path = -np.inf, None

    def rec(t, s, score, path):
        nonlocal best, best_path
        score = score + emissions[t, ext[s]]
        path = path + [s]
        if t == T - 1:
            if s >= S - 2 and score > best:
                best, best_path = score, path
            return
        for ds in (0, 1, 2):
            ns = s + ds
            if ns >= S:
                continue
            if ds == 2 and (ext[ns] == blank or ext[ns] == ext[ns - 2]):
                continue
            rec(t + 1, ns, score, path)

    for s0 in (0, 1):
        rec(0, s0, 0.0, [])
    return best, best_path


def _random_emissions(rng, T, V):
    e = rng.normal(size=(T, V))
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def test_trellis_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(5):
        T, V = 6, 5
        targets = [1, 2, 2]
        em = _random_emissions(rng, T, V)
        best, best_path = _brute_force_best_path(em, targets)

        ext = np.full(2 * len(targets) + 1, BLANK, np.int32)
        ext[1::2] = targets
        alphas, bps = ctc_trellis(jnp.asarray(em, jnp.float32),
                                  jnp.asarray(ext))
        got = max(float(alphas[-1, -1]), float(alphas[-1, -2]))
        assert got == pytest.approx(best, abs=1e-4)


def test_align_tokens_recovers_known_alignment():
    """Emissions hard-peaked on a known frame layout."""
    # frames: blank, A, A, blank, B, blank, C, C, blank, blank
    layout = [BLANK, 1, 1, BLANK, 2, BLANK, 3, 3, BLANK, BLANK]
    V = 5
    em = np.full((len(layout), V), -20.0, np.float32)
    for t, tok in enumerate(layout):
        em[t, tok] = 0.0
    spans = align_tokens(em, [1, 2, 3])
    assert [s[0] for s in spans] == [1, 2, 3]
    (a0, a1), (b0, b1), (c0, c1) = [(s[1], s[2]) for s in spans]
    assert (a0, a1) == (1, 3)
    assert (b0, b1) == (4, 5)
    assert (c0, c1) == (6, 8)
    # scores are the mean emission log-prob over the span (here ~0)
    assert all(abs(s[3]) < 1e-5 for s in spans)


def test_align_tokens_repeated_tokens_need_blank():
    # A A: path must pass through the separating blank
    layout = [1, BLANK, 1]
    em = np.full((3, 3), -20.0, np.float32)
    for t, tok in enumerate(layout):
        em[t, tok] = 0.0
    spans = align_tokens(em, [1, 1])
    assert [(s[1], s[2]) for s in spans] == [(0, 1), (2, 3)]


def test_align_tokens_empty_and_too_short():
    em = np.zeros((2, 4), np.float32)
    assert align_tokens(em, []) == []
    assert align_tokens(em, [1, 2, 3]) == []


def test_bucketing_invariance():
    """Padding to shape buckets must not change the alignment."""
    rng = np.random.default_rng(1)
    T, V = 50, 6
    em = _random_emissions(rng, T, V).astype(np.float32)
    targets = [1, 2, 3, 2, 1]
    spans = align_tokens(em, targets)
    # re-run with different trailing content to confirm determinism
    spans2 = align_tokens(em.copy(), list(targets))
    assert spans == spans2
    assert [s[0] for s in spans] == targets
    # spans ordered and within the real frame range
    for _, f0, f1, _ in spans:
        assert 0 <= f0 < f1 <= T
    starts = [s[1] for s in spans]
    assert starts == sorted(starts)


def _aligner_with_synthetic_forward(vocab, frame_layout, frame_stride=320):
    """ForcedAligner whose acoustic model emits a fixed layout."""
    cfg = w2v.Wav2Vec2Config.tiny_test()
    aligner = ForcedAligner(
        params={}, cfg=cfg, vocab=vocab, word_delimiter="|"
    )
    V = max(vocab.values()) + 1
    em = np.full((len(frame_layout), V), -20.0, np.float32)
    for t, tok in enumerate(frame_layout):
        em[t, tok] = 0.0
    aligner._forward = lambda p, a: jnp.asarray(em)
    return aligner


def test_word_timings():
    vocab = {"<pad>": 0, "|": 1, "H": 2, "I": 3, "Y": 4, "O": 5}
    # "HI YO": H I | Y O with varying frame spans
    layout = [0, 2, 2, 3, 0, 1, 4, 4, 5, 0]
    aligner = _aligner_with_synthetic_forward(vocab, layout)
    audio = np.zeros(16000, np.float32)  # 1 s (unused by stub forward)
    words = aligner.align(audio, "hi yo")
    assert [w.word for w in words] == ["HI", "YO"]
    spf = aligner.cfg.frame_stride / aligner.cfg.sample_rate
    assert words[0].start == pytest.approx(1 * spf)
    assert words[0].end == pytest.approx(4 * spf)
    assert words[1].start == pytest.approx(6 * spf)
    assert words[1].end == pytest.approx(9 * spf)
    # offset shifts absolute times
    words_off = aligner.align(audio, "hi yo", time_offset=30.0)
    assert words_off[0].start == pytest.approx(30.0 + 1 * spf)


def test_align_segments_uses_slices():
    vocab = {"<pad>": 0, "|": 1, "H": 2, "I": 3}
    layout = [0, 2, 3, 0]
    aligner = _aligner_with_synthetic_forward(vocab, layout)

    import dataclasses

    @dataclasses.dataclass
    class Seg:
        start: float
        end: float
        text: str

    audio = np.zeros(16000 * 4, np.float32)
    words = aligner.align_segments(audio, [Seg(1.0, 2.0, "hi")])
    assert len(words) == 1 and words[0].word == "HI"
    # segment offset (start - pad) is applied to the word time
    assert words[0].start >= 0.7


def test_wav2vec2_forward_shapes():
    cfg = w2v.Wav2Vec2Config.tiny_test()
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray(np.random.default_rng(0).normal(size=4000),
                        jnp.float32)
    lp = w2v.forward(params, audio, cfg)
    assert lp.shape == (cfg.num_frames(4000), cfg.vocab_size)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4
    )


def test_wav2vec2_hf_converter_round_trip():
    """Converter consumes an HF-layout state dict (incl. weight-norm
    pos-conv) and the model runs."""
    cfg = w2v.Wav2Vec2Config.tiny_test()
    rng = np.random.default_rng(0)
    d, ff, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    sd = {}
    cin = 1
    for i, (dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"] = (
            rng.normal(size=(dim, cin, k)).astype(np.float32)
        )
        if i == 0:
            sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight"] = (
                np.ones(dim, np.float32))
            sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias"] = (
                np.zeros(dim, np.float32))
        cin = dim
    sd["wav2vec2.feature_projection.layer_norm.weight"] = np.ones(
        cfg.conv_dim[-1], np.float32)
    sd["wav2vec2.feature_projection.layer_norm.bias"] = np.zeros(
        cfg.conv_dim[-1], np.float32)
    sd["wav2vec2.feature_projection.projection.weight"] = rng.normal(
        size=(d, cfg.conv_dim[-1])).astype(np.float32)
    sd["wav2vec2.feature_projection.projection.bias"] = np.zeros(d, np.float32)
    sd["wav2vec2.encoder.pos_conv_embed.conv.weight_g"] = np.ones(
        (d, 1, 1), np.float32)
    sd["wav2vec2.encoder.pos_conv_embed.conv.weight_v"] = rng.normal(
        size=(d, d // cfg.pos_conv_groups, cfg.pos_conv_kernel)
    ).astype(np.float32)
    sd["wav2vec2.encoder.pos_conv_embed.conv.bias"] = np.zeros(d, np.float32)
    sd["wav2vec2.encoder.layer_norm.weight"] = np.ones(d, np.float32)
    sd["wav2vec2.encoder.layer_norm.bias"] = np.zeros(d, np.float32)
    for i in range(cfg.num_layers):
        pre = f"wav2vec2.encoder.layers.{i}"
        for name, shape in [
            ("attention.q_proj", (d, d)), ("attention.k_proj", (d, d)),
            ("attention.v_proj", (d, d)), ("attention.out_proj", (d, d)),
            ("feed_forward.intermediate_dense", (ff, d)),
            ("feed_forward.output_dense", (d, ff)),
        ]:
            sd[f"{pre}.{name}.weight"] = rng.normal(size=shape).astype(
                np.float32) * 0.02
            sd[f"{pre}.{name}.bias"] = np.zeros(shape[0], np.float32)
        for name in ["layer_norm", "final_layer_norm"]:
            sd[f"{pre}.{name}.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.{name}.bias"] = np.zeros(d, np.float32)
    sd["lm_head.weight"] = rng.normal(size=(V, d)).astype(np.float32) * 0.02
    sd["lm_head.bias"] = np.zeros(V, np.float32)

    params = w2v.convert_hf_wav2vec2(sd, cfg)
    audio = jnp.asarray(rng.normal(size=2000), jnp.float32)
    lp = w2v.forward(params, audio, cfg)
    assert lp.shape == (cfg.num_frames(2000), V)
    assert np.isfinite(np.asarray(lp)).all()
