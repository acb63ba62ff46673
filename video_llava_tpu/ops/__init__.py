"""TPU-first compute ops: frame sampling, pooling, preprocessing,
attention kernels, box math."""

from video_llava_tpu.ops.sampling import get_seq_frames, get_seq_frames_np
from video_llava_tpu.ops.pooling import (
    spatio_temporal_pool,
    spatio_temporal_pool_pallas,
)
