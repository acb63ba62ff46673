"""JAX model zoo: CLIP, LLaMA/Vicuna, projector, VideoLLaVA, Whisper,
and the grounding-stack backbones — pure-functional params + apply."""
