"""Special tokens and global constants.

Parity: reference video_chatgpt/constants.py:1-12 defines the video
placeholder tokens and the transcript prefix used in prompt assembly.
"""

DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_VIDEO_PATCH_TOKEN = "<vid_patch>"
DEFAULT_VID_START_TOKEN = "<vid_start>"
DEFAULT_VID_END_TOKEN = "<vid_end>"
DEFAULT_AUDIO_TOKEN = "<audio_transcript>"
DEFAULT_TRANSCRIPT_START = "The noisy audio transcript of this video is:"

# Label value ignored by the training loss (HF convention, reference
# video_chatgpt/train/train.py uses IGNORE_INDEX from constants).
IGNORE_INDEX = -100

# The temporal token budget: videos of any length are mean-pooled to at
# most this many temporal tokens, zero-padded up to it (reference
# video_chatgpt/inference.py:31-36).
MAX_TEMPORAL_TOKENS = 100

# Default number of frames uniformly sampled from a video (reference
# video_chatgpt/eval/model_utils.py:12).
DEFAULT_NUM_FRAMES = 100

LOGDIR = "."
