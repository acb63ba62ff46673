"""Judge-client backoff/rate-limit behavior (monkeypatched transport)."""

import requests
import pytest

from video_llava_tpu.eval.openai_client import ChatCompletionClient, RateLimiter


class FakeResponse:
    def __init__(self, status_code, payload=None, headers=None):
        self.status_code = status_code
        self._payload = payload or {}
        self.headers = headers or {}

    def raise_for_status(self):
        if self.status_code >= 400:
            raise requests.HTTPError(str(self.status_code), response=self)

    def json(self):
        return self._payload


OK = FakeResponse(
    200, {"choices": [{"message": {"content": "a good answer"}}]}
)


def _client(responses, **kw):
    sleeps = []
    client = ChatCompletionClient(
        api_base="http://stub/v1", sleep=sleeps.append, **kw
    )
    seq = iter(responses)

    def fake_post(url, **kwargs):
        r = next(seq)
        if isinstance(r, Exception):
            raise r
        return r

    return client, fake_post, sleeps


def test_retries_on_429_then_succeeds(monkeypatch):
    client, post, sleeps = _client([FakeResponse(429), FakeResponse(503), OK])
    monkeypatch.setattr(requests, "post", post)
    out = client.chat_text("judge", [{"role": "user", "content": "q"}])
    assert out == "a good answer"
    assert sleeps == [1.0, 2.0]  # exponential


def test_retry_after_header_honored(monkeypatch):
    client, post, sleeps = _client(
        [FakeResponse(429, headers={"Retry-After": "7"}), OK]
    )
    monkeypatch.setattr(requests, "post", post)
    client.create("judge", [])
    assert sleeps == [7.0]


def test_connection_errors_retry(monkeypatch):
    client, post, sleeps = _client(
        [requests.ConnectionError("down"), requests.Timeout("slow"), OK]
    )
    monkeypatch.setattr(requests, "post", post)
    assert client.create("judge", [])["choices"]
    assert len(sleeps) == 2


def test_non_retryable_4xx_raises_immediately(monkeypatch):
    client, post, sleeps = _client([FakeResponse(400), OK])
    monkeypatch.setattr(requests, "post", post)
    with pytest.raises(requests.HTTPError):
        client.create("judge", [])
    assert sleeps == []


def test_exhausted_retries_raise(monkeypatch):
    client, post, sleeps = _client(
        [FakeResponse(503)] * 3, max_retries=2
    )
    monkeypatch.setattr(requests, "post", post)
    with pytest.raises(requests.HTTPError):
        client.create("judge", [])
    assert len(sleeps) == 2


def test_backoff_capped(monkeypatch):
    client, post, sleeps = _client(
        [FakeResponse(503)] * 7 + [OK], max_retries=7, backoff_max=5.0
    )
    monkeypatch.setattr(requests, "post", post)
    client.create("judge", [])
    assert max(sleeps) == 5.0


def test_rate_limiter_spacing():
    import time

    rl = RateLimiter(requests_per_second=50)  # 20 ms interval
    t0 = time.monotonic()
    for _ in range(4):
        rl.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.055  # 3 intervals of 20 ms (first is free)
