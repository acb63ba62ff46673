"""Conversation state and prompt templates.

Parity: reference video_chatgpt/video_conversation.py:7-179 — the
Conversation dataclass with SINGLE/TWO/MPT separator styles and the
four shipped templates (default/v1_2, video-chatgpt_v1, vicuna_v1_1,
pg-video-llava). Prompt strings produced here must match the reference
byte-for-byte, since tokenization and label masking depend on them.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()
    MPT = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, ...]
    messages: List[List[Optional[str]]]
    offset: int
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in self.messages:
                if message:
                    if isinstance(message, tuple):  # (text, video_path)
                        message = message[0]
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(self.messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        if self.sep_style == SeparatorStyle.MPT:
            ret = self.system + self.sep
            for role, message in self.messages:
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + message + self.sep
                else:
                    ret += role
            return ret
        raise ValueError(f"Invalid style: {self.sep_style}")

    def append_message(self, role: str, message) -> None:
        """message: str, None, or a (text, video_path) tuple — matching
        the reference's tuple-message convention for uploaded media
        (video_conversation.py:63-77)."""
        self.messages.append([role, message])

    def get_video_frames(self, load_video, n_clips: int = 1,
                         num_frm: int = 100):
        """Collect frames for every tuple-message video in user turns
        (video_conversation.py:66-77). `load_video` is injected (our
        media.loader or any callable) instead of a module-level import."""
        frames = []
        for i, (_, msg) in enumerate(self.messages[self.offset:]):
            if i % 2 == 0 and isinstance(msg, tuple):
                _, video_path = msg
                frames.extend(load_video(video_path, n_clips, num_frm))
        return frames

    def to_chatbot_pairs(self) -> List[List[Optional[str]]]:
        """(user, assistant) message pairs for a chat UI — the
        reference's `to_gradio_chatbot` (video_conversation.py:79-96)
        without the gradio dependency; strips the `<video>` placeholder
        from the first user turn."""
        ret: List[List[Optional[str]]] = []
        for i, (_, msg) in enumerate(self.messages[self.offset:]):
            if i % 2 == 0:
                if isinstance(msg, tuple):
                    msg = msg[0]
                ret.append([msg, None])
            else:
                ret[-1][-1] = msg
        if ret and ret[0][0] and "<video>" in ret[0][0]:
            ret[0][0] = ret[0][0].replace("<video>", "")
        return ret

    def stop_string(self) -> str:
        """The keyword-stop string for this template
        (video_chatgpt/inference.py:103)."""
        return self.sep if self.sep_style != SeparatorStyle.TWO else self.sep2

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
        )

    def dict(self):
        return {
            "system": self.system,
            "roles": self.roles,
            "messages": self.messages,
            "offset": self.offset,
            "sep": self.sep,
            "sep2": self.sep2,
        }


conv_v1_2 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence"
        " assistant. The assistant gives helpful, detailed, and polite"
        " answers to the human's questions."
    ),
    roles=("Human", "Assistant"),
    messages=[
        [
            "Human",
            "What are the key differences between renewable and"
            " non-renewable energy sources?",
        ],
        [
            "Assistant",
            "Renewable energy sources are those that can be replenished"
            " naturally.\n",
        ],
    ],
    offset=2,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
)

conv_vicuna_v1_1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence"
        " assistant. The assistant gives helpful, detailed, and polite"
        " answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_video_chatgpt_v1 = Conversation(
    system=(
        "You are Video-ChatGPT, a large vision-language assistant. "
        "You are able to understand the video content that the user"
        " provides, and assist the user with a variety of tasks using"
        " natural language."
        "Follow the instructions carefully and explain your answers in"
        " detail based on the provided video."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_pg_video_llava = Conversation(
    system=(
        "You are PG-Video-LLaVA, a large vision-language assistant. "
        "You are able to understand the video content that the user"
        " provides, and assist the user with a variety of tasks using"
        " natural language."
        "Follow the instructions carefully and explain your answers in"
        " detail based on the provided video."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

default_conversation = conv_v1_2
conv_templates = {
    "default": conv_v1_2,
    "video-chatgpt_v1": conv_video_chatgpt_v1,
    "vicuna_v1_1": conv_vicuna_v1_1,
    "pg-video-llava": conv_pg_video_llava,
}
