"""Evaluation harnesses: zero-shot QA runners, generative-benchmark
runners, LLM judges, grounding sIoU."""
