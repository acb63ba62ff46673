"""Prompt templates must match the reference byte-for-byte
(video_chatgpt/video_conversation.py:28-61,118-179)."""

from video_llava_tpu.runtime.conversation import (
    SeparatorStyle,
    conv_templates,
)
from video_llava_tpu.runtime.inference import build_video_question


def test_vicuna_v1_1_prompt_exact():
    conv = conv_templates["vicuna_v1_1"].copy()
    conv.append_message(conv.roles[0], "Hello")
    conv.append_message(conv.roles[1], None)
    want = (
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions. USER: Hello ASSISTANT:"
    )
    assert conv.get_prompt() == want
    assert conv.stop_string() == "</s>"


def test_two_style_alternating_separators():
    conv = conv_templates["pg-video-llava"].copy()
    conv.append_message(conv.roles[0], "q1")
    conv.append_message(conv.roles[1], "a1")
    conv.append_message(conv.roles[0], "q2")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.endswith("USER: q1 ASSISTANT: a1</s>USER: q2 ASSISTANT:")


def test_default_single_style():
    conv = conv_templates["default"].copy()
    conv.append_message(conv.roles[0], "Hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert conv.sep_style == SeparatorStyle.SINGLE
    assert p.endswith("###Human: Hi###Assistant:")
    assert conv.stop_string() == "###"
    # seeded few-shot from v1_2 stays in the prompt
    assert "renewable" in p


def test_video_question_assembly():
    qs = build_video_question("What happens?", 3, True, transcript="hello")
    assert qs == (
        "What happens?\n<vid_start><vid_patch><vid_patch><vid_patch>"
        '<vid_end>\nThe noisy audio transcript of this video is:\n"hello"'
    )
    qs2 = build_video_question("Q", 2, False)
    assert qs2 == "Q\n<vid_patch><vid_patch>"


def test_tuple_message_prompt_and_chatbot_pairs():
    conv = conv_templates["pg-video-llava"].copy()
    conv.append_message(conv.roles[0], ("<video>\nWhat happens?", "/tmp/v.mp4"))
    conv.append_message(conv.roles[1], "A dog runs.")
    conv.append_message(conv.roles[0], "Where?")
    conv.append_message(conv.roles[1], None)
    # tuple messages contribute only their text to the prompt
    # (reference get_prompt tuple unwrap, video_conversation.py:32-34)
    p = conv.get_prompt()
    assert "/tmp/v.mp4" not in p and "What happens?" in p
    pairs = conv.to_chatbot_pairs()
    # <video> placeholder stripped from the first user turn
    assert pairs == [["\nWhat happens?", "A dog runs."], ["Where?", None]]


def test_get_video_frames_uses_injected_loader():
    calls = []

    def fake_loader(path, n_clips, num_frm):
        calls.append((path, n_clips, num_frm))
        return [f"{path}#frame{i}" for i in range(3)]

    conv = conv_templates["pg-video-llava"].copy()
    conv.append_message(conv.roles[0], ("<video> q", "/tmp/a.mp4"))
    conv.append_message(conv.roles[1], "ans")
    conv.append_message(conv.roles[0], "plain text turn")
    conv.append_message(conv.roles[1], "ans2")
    frames = conv.get_video_frames(fake_loader, n_clips=1, num_frm=7)
    assert calls == [("/tmp/a.mp4", 1, 7)]
    assert len(frames) == 3
