"""Interactive chat CLI + grounded chat orchestrator.

Parity: reference video_chatgpt/chat.py —
  * VideoChatGPTInterface (:15-225): stateful session with
    upload_video, add_text (1536/1200-char cutoffs, auto <video> /
    <audio_transcript> injection), answer() (prompt replace, generate,
    code-block post-processing), interact() REPL;
  * PGVideoLLaVA (:240-333): after the LLM answer — tag frames ->
    top-10 unique tags -> entity matching -> class list -> scene split
    -> per-scene tracker -> overlaid output video. Scene splitting and
    encoding run through our native media layer instead of scenedetect
    and ffmpeg subprocesses (chat.py:272,295-298).

Run: python -m video_llava_tpu.runtime.chat --model-name ... \
     [--with_grounding] [--use_asr]
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import os
import random
import string
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.constants import (
    DEFAULT_AUDIO_TOKEN,
    DEFAULT_TRANSCRIPT_START,
    DEFAULT_VID_END_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VIDEO_PATCH_TOKEN,
    DEFAULT_VIDEO_TOKEN,
)
from video_llava_tpu.engine.generate import generate_with_keywords
from video_llava_tpu.media.loader import load_video
from video_llava_tpu.runtime.conversation import (
    conv_templates,
    default_conversation,
)
from video_llava_tpu.runtime.inference import InferenceEngine
from video_llava_tpu.runtime.model_init import initialize_model


class VideoChatGPTInterface:
    """Stateful multi-turn video chat."""

    def __init__(
        self,
        engine: InferenceEngine,
        use_asr: bool = False,
        conv_mode: str = "pg-video-llava",
        temperature: float = 0.2,
        max_output_tokens: int = 1024,
        transcriber=None,
    ):
        self.engine = engine
        self.use_asr = use_asr
        self.conv_mode = conv_mode
        self.temperature = temperature
        self.max_new_tokens = max_output_tokens
        cfg = engine.cfg
        if cfg.use_vid_start_end:
            self.replace_token = (
                DEFAULT_VID_START_TOKEN
                + DEFAULT_VIDEO_PATCH_TOKEN * cfg.video_token_len
                + DEFAULT_VID_END_TOKEN
            )
        else:
            self.replace_token = DEFAULT_VIDEO_PATCH_TOKEN * cfg.video_token_len
        self.transcriber = transcriber
        self.clear_history()

    def clear_history(self):
        self.state = default_conversation.copy()
        self.video_features = None
        self.video_frames = None
        self.video_path: Optional[str] = None
        self.transcript_text: Optional[str] = None
        self.first_run = True

    def upload_video(self, video_path: str):
        if not isinstance(video_path, str):
            raise NotImplementedError
        size = self.engine.cfg.vision.image_size
        frames = load_video(video_path, shape=(size, size))
        self.video_path = video_path
        self.video_frames = frames
        self.video_features = self.engine.encode_video_frames(
            frames, num_valid_frames=frames.shape[0]
        )
        if self.use_asr and self.transcriber is not None:
            self.transcript_text, _ = self.transcriber.transcribe_video(
                video_path
            )
        else:
            self.transcript_text = None

    def add_text(self, text: str, video_path: Optional[str]):
        if len(text) <= 0 and video_path is None:
            self.state.skip_next = True
            return
        text = text[:1536]  # hard cut-off (chat.py:93)
        if self.first_run:
            text = text[:1200]  # hard cut-off for videos (chat.py:95)
            if DEFAULT_VIDEO_TOKEN not in text:
                text = text + "\n" + DEFAULT_VIDEO_TOKEN
            if self.use_asr:
                text = text + "\n" + DEFAULT_AUDIO_TOKEN
            self.state = default_conversation.copy()
        self.state.append_message(self.state.roles[0], text)
        self.state.append_message(self.state.roles[1], None)
        self.state.skip_next = False

    def answer(self) -> Optional[str]:
        if getattr(self.state, "skip_next", False):
            return None
        if self.first_run:
            new_state = conv_templates[self.conv_mode].copy()
            new_state.append_message(
                new_state.roles[0], self.state.messages[-2][1]
            )
            new_state.append_message(new_state.roles[1], None)
            self.state = new_state
            self.first_run = False

        prompt = self.state.get_prompt()
        prompt = prompt.replace(DEFAULT_VIDEO_TOKEN, self.replace_token, 1)
        prompt = prompt.replace(
            DEFAULT_AUDIO_TOKEN,
            f'{DEFAULT_TRANSCRIPT_START}\n"{self.transcript_text}"',
            1,
        )
        stop_str = self.state.stop_string()

        tok = self.engine.tokenizer
        ids = tok.encode(prompt)
        s_real = len(ids)
        pad = -s_real % self.engine.seq_pad_multiple
        input_ids = np.full((1, s_real + pad), tok.pad_token_id, np.int32)
        input_ids[0, :s_real] = ids

        gen = dataclasses.replace(
            self.engine.gen,
            temperature=float(self.temperature),
            do_sample=self.temperature > 0,
            max_new_tokens=min(int(self.max_new_tokens), 1536),
            eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
        )
        feats = (
            self.video_features[None] if self.video_features is not None else None
        )
        text, _ = generate_with_keywords(
            self.engine.params,
            self.engine.cfg,
            gen,
            jnp.asarray(input_ids),
            jnp.asarray([s_real], jnp.int32),
            feats,
            jax.random.PRNGKey(random.getrandbits(31)),
            decode_fn=lambda t: tok.decode(t, skip_special_tokens=True),
            keywords=(stop_str,) if stop_str and stop_str != "</s>" else (),
            cache_dtype=self.engine.cache_dtype,
        )
        outputs = text.strip()
        if stop_str and outputs.endswith(stop_str):
            outputs = outputs[: -len(stop_str)]
        outputs = self._post_process_code(outputs.strip())
        self.state.messages[-1][-1] = outputs
        return outputs

    @staticmethod
    def _post_process_code(code: str) -> str:
        """Un-escape underscores inside fenced code blocks
        (chat.py:214-223)."""
        sep = "\n```"
        if sep in code:
            blocks = code.split(sep)
            if len(blocks) % 2 == 1:
                for i in range(1, len(blocks), 2):
                    blocks[i] = blocks[i].replace("\\_", "_")
            code = sep.join(blocks)
        return code

    def interact(self):
        print("Welcome to PG-Video-LLaVA (TPU)!")
        video_set = False
        while True:
            try:
                if not video_set:
                    video_path = input("Please enter the video file path:   ")
                    self.upload_video(video_path)
                    video_set = True
                text = input("USER>>")
                if not text:
                    print("----------\n\n")
                    self.clear_history()
                    video_set = False
                    continue
                self.add_text(text, self.video_path)
                output = self.answer()
                print("ASSISTANT>>", output)
            except (KeyboardInterrupt, EOFError):
                print("----------")
                print("QUITTING...")
                return


class PGVideoLLaVA(VideoChatGPTInterface):
    """Grounded chat: answer + pixel grounding of answer entities
    (reference chat.py:240-333)."""

    def __init__(
        self,
        engine: InferenceEngine,
        tracker,
        tagging_model,
        entity_match_module,
        **kw,
    ):
        super().__init__(engine, **kw)
        self.tracker = tracker
        self.tagging_model = tagging_model
        self.entity_match_module = entity_match_module

    def answer(self, with_grounding: bool = True, output_dir: str = "outputs"):
        llm_output = super().answer()
        if not with_grounding or llm_output is None:
            return llm_output

        # Tag all frames (batched) -> top-10 unique tags. Raw uint8
        # frames upload to the device ONCE and are shared by tagging
        # and (when the fused tracker path is available) tracking —
        # the /255 + resize + normalize all run on device
        # (tagging.run_on_frames_raw). Reference runs tagging then
        # tracking over the same frames (chat.py:254-302).
        import jax.numpy as jnp

        dev_frames = jnp.asarray(np.asarray(self.video_frames))
        entity_list = self.tagging_model.run_on_video(
            dev_frames, top_k=10
        )
        highlight_output, match_state = self.entity_match_module(
            llm_output, entity_list
        )
        class_list = sorted(set(match_state.values()))

        # Scene split on the decoded frames (no subprocess), track per
        # scene, annotate, concatenate, encode.
        from video_llava_tpu.grounding.results import annotate_frame
        from video_llava_tpu.media.loader import encode_video
        from video_llava_tpu.media.scene import detect_scenes

        os.makedirs(output_dir, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
        rand = "".join(random.choices(string.ascii_letters + string.digits, k=6))
        output_video_path = os.path.join(output_dir, f"video_{stamp}_{rand}.mp4")

        annotated = []
        fused = getattr(self.tracker, "fused_eligible", lambda: False)()
        if class_list:
            for start, end in detect_scenes(self.video_frames):
                # fused path: device slices of the shared clip upload;
                # host loop: np frames (it works frame-by-frame on host)
                scene = (
                    dev_frames[start:end] if fused
                    else list(self.video_frames[start:end])
                )
                results = self.tracker.run_on_list_of_images(
                    scene, class_list
                )
                for r, frame in zip(results, self.video_frames[start:end]):
                    cids = [o.category_id for o in r.objects]
                    annotated.append(annotate_frame(frame, r.masks, cids))
        if annotated:
            encode_video(output_video_path, np.stack(annotated), fps=5.0)
        else:
            output_video_path = None
        return llm_output, output_video_path, highlight_output, match_state

    def interact(self):
        print("Welcome to PG-Video-LLaVA (TPU)!")
        video_set = False
        while True:
            try:
                if not video_set:
                    video_path = input("Please enter the video file path:   ")
                    self.upload_video(video_path)
                    video_set = True
                text = input("USER>>")
                if not text:
                    print("----------\n\n")
                    self.clear_history()
                    video_set = False
                    continue
                self.add_text(text, self.video_path)
                out = self.answer(with_grounding=True)
                llm_output, video_out, highlight, match_state = out
                print("ASSISTANT>>", llm_output)
                print("\nGROUNDING>>", "\t", video_out, "\n\t", match_state, "\n")
            except (KeyboardInterrupt, EOFError):
                print("----------")
                print("QUITTING...")
                return


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-name", default=None)
    p.add_argument("--projection_path", default=None)
    p.add_argument("--clip_path", default=None)
    p.add_argument("--model_size", default="7b")
    p.add_argument("--use_asr", action="store_true")
    p.add_argument("--with_grounding", action="store_true")
    p.add_argument("--sam_variant", default="mobile",
                   choices=("mobile", "vit_b"),
                   help="segmenter encoder: MobileSAM TinyViT (the "
                        "reference's live default) or SAM ViT-B")
    p.add_argument("--conv_mode", default="pg-video-llava")
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--max_output_tokens", type=int, default=1024)
    p.add_argument("--quant", default=None,
                   choices=["int8", "int4", "auto"],
                   help="weights-only LLM quantization (int4 decodes "
                   "~3x faster than bf16 on one chip); 'auto' / 'int4' "
                   "against real weights are gated by the checkpoint's "
                   "quant_preflight.json like serving --quant")
    args = p.parse_args(argv)

    from video_llava_tpu.engine.quant_select import resolve_quant

    quant = resolve_quant(args.quant, args.model_name)
    engine = initialize_model(
        args.model_name, args.projection_path, args.clip_path,
        model_size=args.model_size,
        llm_quant=quant,
        llm_fuse=bool(quant),
    )
    transcriber = None
    if args.use_asr:
        from video_llava_tpu.audio.builders import build_default_transcriber

        transcriber = build_default_transcriber()

    if args.with_grounding:
        from video_llava_tpu.grounding.builders import build_grounding_stack

        tracker, tagging, matching = build_grounding_stack(
            sam_variant=args.sam_variant
        )
        chat = PGVideoLLaVA(
            engine, tracker, tagging, matching,
            use_asr=args.use_asr, conv_mode=args.conv_mode,
            temperature=args.temperature,
            max_output_tokens=args.max_output_tokens,
            transcriber=transcriber,
        )
    else:
        chat = VideoChatGPTInterface(
            engine, use_asr=args.use_asr, conv_mode=args.conv_mode,
            temperature=args.temperature,
            max_output_tokens=args.max_output_tokens,
            transcriber=transcriber,
        )
    chat.interact()


if __name__ == "__main__":
    main()
