"""Entry-point-parity alias for the reference script
video_chatgpt/eval/run_inference_qa_msrvtt.py — delegates to the unified
runner (eval/run_inference.py) with --dataset msrvtt."""

import sys

from video_llava_tpu.eval.run_inference import main

if __name__ == "__main__":
    main(["--dataset", "msrvtt"] + sys.argv[1:])
