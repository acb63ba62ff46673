"""Serving: OpenAI-compatible chat-completions endpoint over the JAX LM."""
