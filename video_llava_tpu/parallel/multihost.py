"""Multi-host utilities.

Replaces the reference's vestigial NCCL/gloo pickled-object all_gather
and SLURM rendezvous (grounding_evaluation/util/dist.py:28-95,:210-246)
with the JAX-native equivalents: `jax.distributed.initialize` for the
DCN rendezvous and host-object gathers built on
`jax.experimental.multihost_utils`.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import numpy as np

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous (reference init_distributed_mode
    equivalent). No-ops on a single process; TPU pod environments
    auto-discover when no arguments are given."""
    if num_processes == 1 or (
        num_processes is None and jax.process_count() == 1
        and coordinator_address is None
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_objects(obj: Any, max_bytes: int = 1 << 20) -> List[Any]:
    """Gather an arbitrary picklable object from every host (reference
    dist.all_gather semantics, util/dist.py:34-66): pickle to a padded
    byte tensor, all-gather over DCN, unpickle per host."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    if len(payload) > max_bytes - 8:
        raise ValueError(f"object too large: {len(payload)} > {max_bytes - 8}")
    buf = np.zeros((max_bytes,), np.uint8)
    buf[:8] = np.frombuffer(
        np.int64(len(payload)).tobytes(), np.uint8
    )
    buf[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # (hosts, max_bytes)
    out = []
    for row in np.asarray(gathered):
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Cross-host mean/sum of a {name: scalar} dict (reference
    reduce_dict, util/dist.py:98-122)."""
    if jax.process_count() == 1:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vals))
    agg = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, agg)}
