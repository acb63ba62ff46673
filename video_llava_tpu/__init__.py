"""video_llava_tpu — a TPU-native video multimodal LLM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
PG-Video-LLaVA (reference: mbzuai-oryx/Video-LLaVA): video decoding and
frame sampling, CLIP ViT-L/14 vision encoding with spatio-temporal
pooling, a Vicuna/LLaMA multimodal LM with video-token splicing, KV-cache
generation, audio transcription, pixel grounding, training, and the
evaluation harnesses — all designed TPU-first (SPMD meshes, pjit,
Pallas kernels) rather than translated from the reference's CUDA/torch
implementation.
"""

__version__ = "0.1.0"
