"""Multi-host helpers degrade gracefully on a single process."""

import numpy as np

from video_llava_tpu.parallel.multihost import (
    all_gather_objects,
    get_rank,
    get_world_size,
    init_distributed,
    is_main_process,
    reduce_dict,
)


def test_single_process_behavior():
    init_distributed(num_processes=1)
    assert get_world_size() == 1
    assert get_rank() == 0
    assert is_main_process()
    assert all_gather_objects({"a": [1, 2]}) == [{"a": [1, 2]}]
    assert reduce_dict({"loss": 2.0}) == {"loss": 2.0}


def test_host_shard_rows_partition():
    from video_llava_tpu.train.data import host_shard_rows

    rows = np.arange(16)
    parts = [host_shard_rows(rows, p, 4) for p in range(4)]
    assert all(len(p) == 4 for p in parts)
    np.testing.assert_array_equal(np.concatenate(parts), rows)
    with np.testing.assert_raises(AssertionError):
        host_shard_rows(np.arange(10), 0, 4)


def test_sharded_data_iterator_matches_single_host():
    """On one process the sharded iterator must produce exactly the
    batches of data_iterator, as 'data'-sharded global arrays on the
    8-device mesh."""
    from video_llava_tpu.parallel import make_mesh
    from video_llava_tpu.train.data import data_iterator, sharded_data_iterator

    class DS:
        def __len__(self):
            return 19

        def __getitem__(self, i):
            return {"input_ids": np.full((8,), i, np.int32),
                    "labels": np.full((8,), -i, np.int32)}

    def collate(items):
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    mesh = make_mesh(8, None)
    want = list(data_iterator(DS(), collate, 8, np.random.default_rng(0)))
    got = list(
        sharded_data_iterator(DS(), collate, 8, np.random.default_rng(0), mesh)
    )
    assert len(got) == len(want) == 2
    for w, g in zip(want, got):
        for k in w:
            arr = g[k]
            assert arr.shape == w[k].shape
            assert "data" in str(arr.sharding.spec)
            np.testing.assert_array_equal(np.asarray(arr), w[k])
