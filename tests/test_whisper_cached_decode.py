"""KV-cached Whisper decode must reproduce the re-forward greedy
oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from video_llava_tpu.models import whisper
from video_llava_tpu.models.whisper import WhisperConfig


def test_cached_matches_reforward():
    cfg = WhisperConfig.tiny_test()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 80, 3000)).astype(np.float32)
    enc = whisper.encode(params, jnp.asarray(mel), cfg)
    start = jnp.asarray([[1, 3], [1, 4]], jnp.int32)

    want_toks, want_lens = whisper.greedy_decode(
        params, enc, cfg, start, 6, eot_token=0
    )
    got_toks, got_lens = whisper.greedy_decode_cached(
        params, enc, cfg, start, 6, eot_token=0
    )
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(want_toks))
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
