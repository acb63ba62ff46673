"""Minimal OpenAI-compatible chat-completions client.

Replaces the reference's `openai==0.28` usage (quantitative_evaluation/
evaluate_*.py, grounding_evaluation/util/entity_matching_openai.py)
with a dependency-free client that talks to any OpenAI-compatible
endpoint — including our own serving/server.py (the FastChat-served
Vicuna-13b-v1.5 judge replacement, quantitative_evaluation/README.md:
5-16).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import requests


class ChatCompletionClient:
    def __init__(
        self,
        api_base: Optional[str] = None,
        api_key: Optional[str] = None,
        timeout: float = 120.0,
    ):
        self.api_base = (
            api_base
            or os.environ.get("OPENAI_API_BASE")
            or "http://localhost:8000/v1"
        ).rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "EMPTY")
        self.timeout = timeout

    def create(
        self,
        model: str,
        messages: List[Dict[str, str]],
        temperature: float = 0.2,
        max_tokens: int = 512,
        **kw,
    ) -> dict:
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
        resp.raise_for_status()
        return resp.json()

    def chat_text(self, model: str, messages: List[Dict[str, str]], **kw) -> str:
        out = self.create(model, messages, **kw)
        return out["choices"][0]["message"]["content"]
