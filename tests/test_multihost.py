"""Multi-host helpers degrade gracefully on a single process."""

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
