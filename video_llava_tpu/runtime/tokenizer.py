"""Tokenizer abstraction.

The reference uses the HF LLaMA (sentencepiece) tokenizer extended with
the video special tokens (video_chatgpt/eval/model_utils.py:101-119).
We wrap any HF tokenizer when its assets are on disk, and provide a
self-contained byte-level fallback with identical special-token
semantics for tests, benchmarks, and air-gapped environments.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from video_llava_tpu.constants import (
    DEFAULT_VID_END_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VIDEO_PATCH_TOKEN,
)

VIDEO_SPECIAL_TOKENS = (
    DEFAULT_VIDEO_PATCH_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VID_END_TOKEN,
)


class Tokenizer:
    """Minimal interface the framework needs."""

    bos_token_id: int
    eos_token_id: int
    pad_token_id: int
    vid_patch_token_id: int
    vid_start_token_id: int
    vid_end_token_id: int

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError


class ByteTokenizer(Tokenizer):
    """Byte-level tokenizer: ids 0..255 = bytes, then specials.

    Layout: [0..255] bytes, 256 = <pad>, 257 = <s>, 258 = </s>,
    259 = <vid_patch>, 260 = <vid_start>, 261 = <vid_end>.
    Special-token strings are segmented out of the text before byte
    encoding, mirroring HF added-token behavior.
    """

    PAD, BOS, EOS = 256, 257, 258

    def __init__(self):
        self.pad_token_id = self.PAD
        self.bos_token_id = self.BOS
        self.eos_token_id = self.EOS
        self.vid_patch_token_id = 259
        self.vid_start_token_id = 260
        self.vid_end_token_id = 261
        self._special_strs = {
            DEFAULT_VIDEO_PATCH_TOKEN: self.vid_patch_token_id,
            DEFAULT_VID_START_TOKEN: self.vid_start_token_id,
            DEFAULT_VID_END_TOKEN: self.vid_end_token_id,
            "<s>": self.BOS,
            "</s>": self.EOS,
        }

    @property
    def vocab_size(self) -> int:
        return 262

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids: List[int] = [self.BOS] if add_bos else []
        i = 0
        specials = sorted(self._special_strs, key=len, reverse=True)
        while i < len(text):
            for s in specials:
                if text.startswith(s, i):
                    ids.append(self._special_strs[s])
                    i += len(s)
                    break
            else:
                ids.extend(text[i].encode("utf-8"))
                i += 1
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        inv = {v: k for k, v in self._special_strs.items()}
        out: List[str] = []
        byte_buf = bytearray()

        def flush():
            nonlocal byte_buf
            if byte_buf:
                out.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf = bytearray()

        for t in ids:
            t = int(t)
            if t < 256:
                byte_buf.append(t)
            else:
                flush()
                if not skip_special_tokens and t in inv:
                    out.append(inv[t])
        flush()
        return "".join(out)


class HFTokenizer(Tokenizer):
    """HF tokenizer wrapper with the reference's special-token extension
    (model_utils.py:112-119): adds <vid_patch>/<vid_start>/<vid_end>."""

    def __init__(self, path: str, use_vid_start_end: bool = True):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path)
        self.tok.add_tokens([DEFAULT_VIDEO_PATCH_TOKEN], special_tokens=True)
        if use_vid_start_end:
            self.tok.add_tokens(
                [DEFAULT_VID_START_TOKEN, DEFAULT_VID_END_TOKEN],
                special_tokens=True,
            )
        ids = self.tok.convert_tokens_to_ids(list(VIDEO_SPECIAL_TOKENS))
        self.vid_patch_token_id, self.vid_start_token_id, self.vid_end_token_id = ids
        self.bos_token_id = self.tok.bos_token_id
        self.eos_token_id = self.tok.eos_token_id
        self.pad_token_id = (
            self.tok.pad_token_id
            if self.tok.pad_token_id is not None
            else self.tok.unk_token_id or 0
        )

    @property
    def vocab_size(self) -> int:
        return len(self.tok)

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        return self.tok(text, add_special_tokens=add_bos).input_ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self.tok.decode(ids, skip_special_tokens=skip_special_tokens)


def load_tokenizer(path: Optional[str] = None) -> Tokenizer:
    """HF tokenizer from `path` when available, else the byte fallback."""
    if path:
        return HFTokenizer(path)
    return ByteTokenizer()
