"""Minimal OpenAI-compatible chat-completions client.

Replaces the reference's `openai==0.28` usage (quantitative_evaluation/
evaluate_*.py, grounding_evaluation/util/entity_matching_openai.py)
with a dependency-free client that talks to any OpenAI-compatible
endpoint — including our own serving/server.py (the FastChat-served
Vicuna-13b-v1.5 judge replacement, quantitative_evaluation/README.md:
5-16).

Adds what the reference's retry-until-done outer loop
(evaluate_activitynet_qa.py:127-154) leaves to chance: per-request
exponential backoff on 429/5xx/connection errors (honoring
Retry-After) and an optional client-side request-rate cap, so pools of
judge workers don't stampede an external endpoint.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional

import requests

RETRYABLE_STATUS = {429, 500, 502, 503, 504}


class RateLimiter:
    """Thread-safe minimum-interval limiter (requests per second)."""

    def __init__(self, requests_per_second: float):
        self.min_interval = 1.0 / requests_per_second
        self._lock = threading.Lock()
        self._next_slot = 0.0

    def acquire(self):
        with self._lock:
            now = time.monotonic()
            wait = self._next_slot - now
            self._next_slot = max(self._next_slot, now) + self.min_interval
        if wait > 0:
            time.sleep(wait)


class ChatCompletionClient:
    def __init__(
        self,
        api_base: Optional[str] = None,
        api_key: Optional[str] = None,
        timeout: float = 120.0,
        max_retries: int = 5,
        backoff_base: float = 1.0,
        backoff_max: float = 30.0,
        requests_per_second: Optional[float] = None,
        sleep=time.sleep,
    ):
        self.api_base = (
            api_base
            or os.environ.get("OPENAI_API_BASE")
            or "http://localhost:8000/v1"
        ).rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "EMPTY")
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.backoff_max = backoff_max
        self.rate_limiter = (
            RateLimiter(requests_per_second) if requests_per_second else None
        )
        self._sleep = sleep  # injectable for tests

    def _backoff_seconds(self, attempt: int, resp) -> float:
        if resp is not None:
            retry_after = resp.headers.get("Retry-After")
            if retry_after:
                try:
                    return min(float(retry_after), self.backoff_max)
                except ValueError:
                    pass
        return min(self.backoff_base * (2.0 ** attempt), self.backoff_max)

    def create(
        self,
        model: str,
        messages: List[Dict[str, str]],
        temperature: float = 0.2,
        max_tokens: int = 512,
        **kw,
    ) -> dict:
        last_exc = None
        for attempt in range(self.max_retries + 1):
            if self.rate_limiter is not None:
                self.rate_limiter.acquire()
            resp = None
            try:
                resp = requests.post(
                    f"{self.api_base}/chat/completions",
                    json={
                        "model": model,
                        "messages": messages,
                        "temperature": temperature,
                        "max_tokens": max_tokens,
                        **kw,
                    },
                    headers={"Authorization": f"Bearer {self.api_key}"},
                    timeout=self.timeout,
                )
                if resp.status_code in RETRYABLE_STATUS:
                    last_exc = requests.HTTPError(
                        f"{resp.status_code} from {self.api_base}",
                        response=resp,
                    )
                else:
                    resp.raise_for_status()
                    return resp.json()
            except requests.RequestException as e:
                # non-retryable HTTP errors (4xx other than 429) re-raise
                r = getattr(e, "response", None)
                if r is not None and r.status_code not in RETRYABLE_STATUS:
                    raise
                last_exc = e
            if attempt < self.max_retries:
                self._sleep(self._backoff_seconds(attempt, resp))
        raise last_exc

    def chat_text(self, model: str, messages: List[Dict[str, str]], **kw) -> str:
        out = self.create(model, messages, **kw)
        return out["choices"][0]["message"]["content"]
