"""Host media runtime: native (libav) decode/encode + frame sampling."""

from video_llava_tpu.media.loader import VideoReader, encode_video, load_video
