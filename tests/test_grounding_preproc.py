"""Annotation preprocessing + dataset consumption round trip on
synthetic VidSTG/HC-STVG raw annotations."""

import json

import numpy as np

from video_llava_tpu.scripts.preprocess_grounding_annotations import (
    preproc_hcstvg,
    preproc_vidstg_file,
)


def test_vidstg_preproc_and_dataset(tmp_path):
    vidor = {
        "vidA": {
            "video_id": "vidA",
            "video_path": "0001/vidA.mp4",
            "frame_count": 60,
            "fps": 30,
            "width": 120,
            "height": 90,
            "objects": {0: "dog"},
            "trajectories": {
                0: {
                    i: {"bbox": [10, 10, 50, 40], "generated": 0,
                        "tracker": None, "category_id": 0}
                    for i in range(10, 40)
                }
            },
        }
    }
    anns = [
        {
            "vid": "vidA",
            "frame_count": 60,
            "fps": 30,
            "width": 120,
            "height": 90,
            "used_segment": {"begin_fid": 0, "end_fid": 59},
            "temporal_gt": {"begin_fid": 10, "end_fid": 40},
            "questions": [
                {"description": "who walks?", "type": "human", "target_id": 0}
            ],
            "captions": [
                {"description": "a dog walks", "type": "human", "target_id": 0}
            ],
        }
    ]
    out = preproc_vidstg_file(anns, vidor)
    assert len(out["videos"]) == 2
    assert out["videos"][0]["qtype"] == "interrogative"
    assert out["videos"][1]["qtype"] == "declarative"
    assert out["trajectories"]["vidA"]["0"]["15"]["bbox"] == [10, 10, 50, 40]

    # Dataset consumption: frame-id/inter-idx bookkeeping (no decode —
    # we verify the annotation-side logic).
    from video_llava_tpu.datasets.grounding_datasets import (
        VidSTGDataset,
        resample_frame_ids,
    )

    (tmp_path / "test.json").write_text(json.dumps(out))
    ds = VidSTGDataset.__new__(VidSTGDataset)
    ds.annotations = out
    ds.videos = out["videos"]
    ds.required_fps = 5.0
    ds.video_max_len = 100
    ds.tmp_loc = True
    v = out["videos"][0]
    ids = resample_frame_ids(v["start_frame"], v["end_frame"], v["fps"], 5.0, 100)
    inter = [i for i, f in enumerate(ids)
             if v["tube_start_frame"] <= f < v["tube_end_frame"]]
    assert inter, "annotated tube must intersect sampled frames"


def test_hcstvg_preproc():
    anns = {
        "clip1.mp4": {
            "img_num": 100,
            "img_size": [90, 120],  # (h, w)
            "st_frame": 20,
            "st_time": 4.0,
            "ed_time": 8.0,
            "English": "the man waves",
            "bbox": [[5, 5, 20, 30]] * 25,  # ltwh
        }
    }
    out = preproc_hcstvg(anns, {"clip1": "dir/clip1.mp4"})
    v = out[0]
    assert v["tube_start_frame"] == 20
    assert v["tube_end_frame"] == 45
    assert v["width"] == 120 and v["height"] == 90
    assert v["video_path"] == "dir/clip1.mp4"
    assert v["trajectory"][0] == [5, 5, 20, 30]
