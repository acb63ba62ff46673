"""Supervised training data pipeline.

Parity: reference video_chatgpt/train/train.py —
  * `preprocess_multimodal` (:154-175): replace <video> with the
    <vid_patch> block (optionally wrapped in start/end tokens),
    optional video-first reordering;
  * `preprocess_v1` (:178-246) / `preprocess` default path (:321-352):
    conversation templating + IGNORE_INDEX label masking, including the
    tokenization-mismatch zeroing guard;
  * `LazySupervisedDataset` (:381-422): per-sample pickled CLIP
    features (we also accept .npy/.npz);
  * the pad-collator (:425-454) — here padding to a static bucket
    length so every batch shape compiles once on TPU.
"""

from __future__ import annotations

import copy
import json
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from video_llava_tpu.constants import (
    DEFAULT_VID_END_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VIDEO_PATCH_TOKEN,
    DEFAULT_VIDEO_TOKEN,
    IGNORE_INDEX,
)
from video_llava_tpu.runtime import conversation as conversation_lib
from video_llava_tpu.runtime.conversation import SeparatorStyle
from video_llava_tpu.runtime.tokenizer import Tokenizer


@dataclass
class MultimodalCfg:
    video_token_len: int
    is_multimodal: bool = True
    sep_video_conv_front: bool = False
    video_folder: Optional[str] = None
    use_vid_start_end: bool = True


def preprocess_multimodal(
    sources: Sequence[List[Dict]], cfg: MultimodalCfg
) -> Sequence[List[Dict]]:
    """Replace <video> in conversation turns with the patch-token block
    (train.py:154-175)."""
    if not cfg.is_multimodal:
        return sources
    conv = conversation_lib.default_conversation
    for source in sources:
        if cfg.sep_video_conv_front:
            assert DEFAULT_VIDEO_TOKEN in source[0]["value"]
            source[0]["value"] = (
                source[0]["value"].replace(DEFAULT_VIDEO_TOKEN, "").strip()
            )
            source[0]["value"] = (
                DEFAULT_VIDEO_TOKEN
                + conv.sep
                + conv.roles[0]
                + ": "
                + source[0]["value"]
            )
        replace_token = DEFAULT_VIDEO_PATCH_TOKEN * cfg.video_token_len
        if cfg.use_vid_start_end:
            replace_token = (
                DEFAULT_VID_START_TOKEN + replace_token + DEFAULT_VID_END_TOKEN
            )
        for sentence in source:
            sentence["value"] = sentence["value"].replace(
                DEFAULT_VIDEO_TOKEN, replace_token
            )
    return sources


def _truncate(ids: List[int], max_len: int) -> List[int]:
    return ids[:max_len]


def preprocess_v1(
    sources, tokenizer: Tokenizer, max_len: int = 2048
) -> Dict[str, List[np.ndarray]]:
    """Vicuna-v1 (TWO separator style) tokenize + mask (train.py:178-246)."""
    conv = conversation_lib.default_conversation.copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}

    conversations = []
    for source in sources:
        if roles.get(source[0]["from"]) != conv.roles[0]:
            source = source[1:]
        conv.messages = []
        for j, sentence in enumerate(source):
            role = roles[sentence["from"]]
            assert role == conv.roles[j % 2]
            conv.append_message(role, sentence["value"])
        conversations.append(conv.get_prompt())

    assert conv.sep_style == SeparatorStyle.TWO
    input_ids = [
        np.asarray(_truncate(tokenizer.encode(c), max_len), np.int32)
        for c in conversations
    ]
    targets = [ids.copy() for ids in input_ids]

    sep = conv.sep + conv.roles[1] + ": "
    for conversation, target in zip(conversations, targets):
        total_len = len(target)
        rounds = conversation.split(conv.sep2)
        cur_len = 1
        target[:cur_len] = IGNORE_INDEX
        for rou in rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            round_len = len(tokenizer.encode(rou))
            instruction_len = len(tokenizer.encode(parts[0])) - 2
            target[cur_len : cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX
        if cur_len < max_len and cur_len != total_len:
            target[:] = IGNORE_INDEX
            print(
                f"WARNING: tokenization mismatch: {cur_len} vs. {total_len}. (ignored)"
            )
    return {"input_ids": input_ids, "labels": targets}


def _add_speaker_and_signal(header: str, source, get_conversation: bool = True):
    """(train.py:133-152)"""
    BEGIN_SIGNAL = "### "
    END_SIGNAL = "\n"
    conversation = header
    for sentence in source:
        from_str = sentence["from"]
        if from_str.lower() == "human":
            from_str = conversation_lib.default_conversation.roles[0]
        elif from_str.lower() == "gpt":
            from_str = conversation_lib.default_conversation.roles[1]
        else:
            from_str = "unknown"
        sentence["value"] = (
            BEGIN_SIGNAL + from_str + ": " + sentence["value"] + END_SIGNAL
        )
        if get_conversation:
            conversation += sentence["value"]
    conversation += BEGIN_SIGNAL
    return conversation


def preprocess_default(
    sources, tokenizer: Tokenizer, max_len: int = 2048
) -> Dict[str, List[np.ndarray]]:
    """SINGLE-style path (train.py:321-352 + _mask_targets :123-130):
    mask the header and every human turn (+2 tokens of the speaker
    signal)."""
    conversations = []
    headers = []
    for source in sources:
        header = f"{conversation_lib.default_conversation.system}\n\n"
        headers.append(header)
        conversations.append(_add_speaker_and_signal(header, source))
    input_ids = [
        np.asarray(_truncate(tokenizer.encode(c), max_len), np.int32)
        for c in conversations
    ]
    targets = [ids.copy() for ids in input_ids]
    for target, source, header in zip(targets, sources, headers):
        lens = [len(tokenizer.encode(header))] + [
            len(tokenizer.encode(s["value"])) for s in source
        ]
        speakers = [s["from"] for s in source]
        cur_idx = lens[0]
        target[:cur_idx] = IGNORE_INDEX
        for ln, speaker in zip(lens[1:], speakers):
            if speaker == "human":
                target[cur_idx + 2 : cur_idx + ln] = IGNORE_INDEX
            cur_idx += ln
    return {"input_ids": input_ids, "labels": targets}


def preprocess(sources, tokenizer: Tokenizer, max_len: int = 2048):
    if conversation_lib.default_conversation.version == "v1":
        return preprocess_v1(sources, tokenizer, max_len)
    return preprocess_default(sources, tokenizer, max_len)


def load_video_features(path: str) -> np.ndarray:
    """Pickled (reference scripts/save_spatio_temporal_clip_features.py)
    or numpy feature files."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        return np.load(path)["features"]
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f))


class LazySupervisedDataset:
    """JSON instruction data + per-sample precomputed video features
    (train.py:381-422)."""

    def __init__(
        self,
        data_path: str,
        tokenizer: Tokenizer,
        multimodal_cfg: MultimodalCfg,
        max_len: int = 2048,
    ):
        with open(data_path) as f:
            self.list_data_dict = json.load(f)
        self.tokenizer = tokenizer
        self.multimodal_cfg = multimodal_cfg
        self.max_len = max_len

    def __len__(self):
        return len(self.list_data_dict)

    def __getitem__(self, i: int) -> Dict:
        entry = self.list_data_dict[i]
        sources = [entry]
        features = None
        if "video" in entry:
            video_file = entry["video"]
            folder = self.multimodal_cfg.video_folder or "."
            base = os.path.join(folder, video_file)
            for candidate in (base, base + ".pkl", base + ".npy"):
                if os.path.exists(candidate):
                    features = load_video_features(candidate)
                    break
            if features is None:
                raise FileNotFoundError(f"features for {video_file} not found")
            sources = preprocess_multimodal(
                copy.deepcopy([e["conversations"] for e in sources]),
                self.multimodal_cfg,
            )
        else:
            sources = copy.deepcopy([e["conversations"] for e in sources])
        data = preprocess(sources, self.tokenizer, self.max_len)
        out = {"input_ids": data["input_ids"][0], "labels": data["labels"][0]}
        if features is not None:
            out["video_features"] = features.astype(np.float32)
        return out


@dataclass
class Collator:
    """Pad to a static bucket length (multiple of `pad_multiple`, capped
    at max_len) — static shapes keep TPU recompilation bounded to a
    handful of buckets."""

    pad_token_id: int
    pad_multiple: int = 128
    max_len: int = 2048

    def __call__(self, instances: Sequence[Dict]) -> Dict[str, np.ndarray]:
        longest = max(len(x["input_ids"]) for x in instances)
        bucket = min(
            -(-longest // self.pad_multiple) * self.pad_multiple, self.max_len
        )
        b = len(instances)
        input_ids = np.full((b, bucket), self.pad_token_id, np.int32)
        labels = np.full((b, bucket), IGNORE_INDEX, np.int32)
        for r, inst in enumerate(instances):
            n = min(len(inst["input_ids"]), bucket)
            input_ids[r, :n] = inst["input_ids"][:n]
            labels[r, :n] = inst["labels"][:n]
        batch = {"input_ids": input_ids, "labels": labels}
        if "video_features" in instances[0]:
            batch["video_features"] = np.stack(
                [inst["video_features"] for inst in instances]
            ).astype(np.float32)
        return batch


def data_iterator(dataset, collator, batch_size: int, rng: np.random.Generator,
                  drop_last: bool = True, shuffle: bool = True):
    """Minimal epoch iterator (single-host; multi-host sharding happens
    at device_put with a 'data'-sharded NamedSharding)."""
    idx = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(idx)
    for start in range(0, len(idx) - (batch_size - 1 if drop_last else 0),
                       batch_size):
        rows = idx[start : start + batch_size]
        yield collator([dataset[int(r)] for r in rows])


def host_shard_rows(global_rows: np.ndarray, process_index: int,
                    process_count: int) -> np.ndarray:
    """Contiguous per-host slice of a global batch's row indices. Every
    host derives the SAME shuffled index stream (identically seeded
    rng), so slicing by process_index partitions each global batch with
    no host communication."""
    per_host = len(global_rows) // process_count
    assert per_host * process_count == len(global_rows), (
        f"global batch {len(global_rows)} not divisible by "
        f"{process_count} hosts"
    )
    return global_rows[process_index * per_host : (process_index + 1) * per_host]


def sharded_data_iterator(
    dataset,
    collator,
    global_batch_size: int,
    rng: np.random.Generator,
    mesh,
    *,
    drop_last: bool = True,
    shuffle: bool = True,
):
    """Multi-host iterator: each host LOADS only its shard of every
    global batch (replaces the reference's per-rank DistributedSampler
    under torchrun, docs/2-Training.md:42) and assembles global
    'data'-sharded jax.Arrays via make_array_from_process_local_data —
    no host ever materializes the full batch.

    Single-process it degenerates to data_iterator + device_put, so the
    same code path serves both (tested on the virtual CPU mesh)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid, nproc = jax.process_index(), jax.process_count()
    idx = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(idx)

    def spec(ndim):
        return P(*(("data",) + (None,) * (ndim - 1)))

    for start in range(
        0, len(idx) - (global_batch_size - 1 if drop_last else 0),
        global_batch_size,
    ):
        rows = idx[start : start + global_batch_size]
        if len(rows) % nproc:
            # Final partial batch (drop_last=False): wrap-pad with the
            # epoch's first indices to a multiple of process_count so
            # every host gets an equal shard. idx is identically seeded
            # on all hosts, so the padding is globally consistent.
            rows = np.concatenate([rows, idx[: -len(rows) % nproc]])
        rows = host_shard_rows(rows, pid, nproc)
        local = collator([dataset[int(r)] for r in rows])
        yield {
            k: jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec(v.ndim)), np.asarray(v)
            )
            for k, v in local.items()
        }
