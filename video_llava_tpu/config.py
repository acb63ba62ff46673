"""Model / runtime configuration dataclasses.

All shapes are static by construction (TPU/XLA requirement): frame
counts, token counts and sequence lengths are padded to fixed maxima so
every jitted program compiles once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower config (ViT-L/14 defaults).

    Mirrors the shapes the reference consumes from HF CLIPVisionModel
    (reference video_chatgpt/eval/model_utils.py:104-108,147-148):
    224px -> 16x16 = 256 patches, 336px -> 24x24 = 576 patches, both
    with hidden_size 1024.
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    # OpenAI CLIP ViT-L/14 uses quick_gelu.
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def b32(cls) -> "CLIPVisionConfig":
        """OpenAI CLIP ViT-B/32 — the tower the grounding stack's
        zero-shot crop filter runs (reference loads clip.load('ViT-B/32'),
        grounding_evaluation/grounding_new_api.py:295)."""
        return cls(
            image_size=224, patch_size=32, hidden_size=768,
            intermediate_size=3072, num_layers=12, num_heads=12,
            projection_dim=512,
        )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text tower (ViT-L/14 companion; used by the grounding
    stack's zero-shot crop filter, reference
    grounding_evaluation/grounding_new_api.py:111,295)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768

    @classmethod
    def b32(cls) -> "CLIPTextConfig":
        """ViT-B/32 companion text tower (crop-filter zero-shot
        classifier)."""
        return cls(
            hidden_size=512, intermediate_size=2048, num_layers=12,
            num_heads=8, projection_dim=512,
        )


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """LLaMA / Vicuna decoder config.

    Defaults are Vicuna-7B-v1.x shapes (the reference loads Vicuna via
    HF LlamaForCausalLM; video_chatgpt/model/video_chatgpt.py:178-198).
    vocab_size already includes the 3 added video tokens
    (<vid_patch>/<vid_start>/<vid_end> -> 32000..32002; reference
    model_utils.py:112-119 resizes embeddings after add_tokens).
    """

    vocab_size: int = 32006  # 32000 + specials, padded up for tiling
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    @classmethod
    def vicuna_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def vicuna_13b(cls) -> "LlamaConfig":
        return cls(
            hidden_size=5120,
            intermediate_size=13824,
            num_layers=40,
            num_heads=40,
            num_kv_heads=40,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 32006) -> "LlamaConfig":
        """Structurally complete but small; for tests and dry runs."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=688,
            num_layers=4,
            num_heads=8,
            num_kv_heads=8,
            head_dim=32,
            max_position_embeddings=2048,
        )


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    """mm_projector config.

    Reference semantics (video_chatgpt/model/multimodal_projector/
    builder.py:33-51): 'linear', 'mlp{N}x_gelu', or 'identity';
    224px checkpoints use 'linear' (video_chatgpt.py:52-56).
    """

    projector_type: str = "linear"
    mm_hidden_size: int = 1024
    hidden_size: int = 4096


@dataclasses.dataclass(frozen=True)
class VideoLLaVAConfig:
    """Full multimodal model: vision tower + projector + LM.

    video_token_len = num_patches_per_frame + 100 temporal tokens
    (reference video_chatgpt/eval/model_utils.py:147-148).
    """

    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    llm: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    projector_type: str = "linear"
    use_vid_start_end: bool = True
    max_temporal_tokens: int = 100
    # Token ids of the added special tokens (assigned at tokenizer
    # extension time; defaults match a 32000-vocab LLaMA tokenizer).
    vid_patch_token_id: int = 32000
    vid_start_token_id: int = 32001
    vid_end_token_id: int = 32002

    @property
    def video_token_len(self) -> int:
        return self.vision.num_patches + self.max_temporal_tokens

    @property
    def projector(self) -> ProjectorConfig:
        return ProjectorConfig(
            projector_type=self.projector_type,
            mm_hidden_size=self.vision.hidden_size,
            hidden_size=self.llm.hidden_size,
        )

    @classmethod
    def tiny(cls) -> "VideoLLaVAConfig":
        """Small end-to-end config for tests / dry runs; keeps the real
        CLIP feature dim ratios but shrinks everything."""
        vision = CLIPVisionConfig(
            image_size=56,
            patch_size=14,
            hidden_size=64,
            intermediate_size=256,
            num_layers=2,
            num_heads=4,
            projection_dim=64,
        )
        llm = LlamaConfig.tiny()
        return cls(vision=vision, llm=llm, max_temporal_tokens=100)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Sampling parameters.

    Reference defaults: do_sample=True, temperature=0.2,
    max_new_tokens=1024 (video_chatgpt/inference.py:105-112).
    """

    max_new_tokens: int = 1024
    temperature: float = 0.2
    do_sample: bool = True
    top_p: float = 1.0
    eos_token_id: int = 2
    pad_token_id: int = 0
    # Token ids that terminate generation immediately (keyword stop;
    # reference video_chatgpt/model/utils.py:6-26).
    stop_token_ids: Tuple[int, ...] = ()
    # Decoded-substring stop strings, checked host-side in chunks.
    stop_strings: Tuple[str, ...] = ()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data: batch/FSDP axis; model: tensor axis."""

    data: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "model")
