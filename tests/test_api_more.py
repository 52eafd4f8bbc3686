import os
import os.path as osp

import cv2
import numpy as np

from videotofaces_tpu import video_to_faces
from test_api import FakeEncoder, patched_models  # noqa: F401
from test_pipeline_detection import _write_test_video


def test_detection_only_mode(tmp_path, patched_models):  # noqa: F811
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=60, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live", mode="detection",
                   video_step=1, hash_thr=-1, det_scale=(1, 1, 1, 1), det_square=False)
    faces = os.listdir(osp.join(out, "faces"))
    assert len(faces) == 5  # frames 10..50, one passing box each, no dedup
    assert all(f.endswith(".jpg") for f in faces)
    # no grouping artifacts in detection mode
    assert not any(osp.isdir(osp.join(out, "faces", f)) for f in faces)


def test_full_mode_with_dupes_saved(tmp_path, patched_models):  # noqa: F811
    video = str(tmp_path / "clip.avi")
    # constant frames -> everything after the first face is a duplicate
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10, (320, 240))
    frame = np.full((240, 320, 3), 128, np.uint8)
    frame[50:100, 50:100] = 200
    for _ in range(60):
        vw.write(frame)
    vw.release()
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live", mode="detection",
                   video_step=1, hash_thr=8, save_dupes=True,
                   det_scale=(1, 1, 1, 1), det_square=False)
    kept = os.listdir(osp.join(out, "faces"))
    assert len(kept) == 1
    dupes1 = os.listdir(osp.join(out, "intermediate", "dupes1"))
    assert len(dupes1) == 4
    log = open(osp.join(out, "intermediate", "log_dupes1.csv")).read().splitlines()
    assert log[0] == "file_name,nearest_in_prev_5,hash_diff,marked_as_duplicate"


def test_enc_area_and_resize_to(tmp_path, patched_models):  # noqa: F811
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=40, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live", mode="full",
                   video_step=1, hash_thr=-1, enc_dup_thr=-1, clusters=2,
                   det_scale=(1, 1, 1, 1), det_square=False, resize_to=64,
                   enc_area=(0.1, 0.1, 0.9, 0.9), group_log=False)
    faces_dir = osp.join(out, "faces")
    subdirs = [d for d in os.listdir(faces_dir) if osp.isdir(osp.join(faces_dir, d))]
    grouped = [osp.join(faces_dir, d, f) for d in subdirs
               for f in os.listdir(osp.join(faces_dir, d))]
    assert grouped
    img = cv2.imread(grouped[0])
    assert max(img.shape[:2]) <= 64  # resize_to applied before saving


def test_mode_grouping_requires_images(tmp_path, capsys):
    out = str(tmp_path / "empty")
    os.makedirs(out)
    video_to_faces(mode="grouping", out_dir=out, style="live")
    assert "no image files for grouping" in capsys.readouterr().out


def test_enc_from_memory_matches_disk(tmp_path, patched_models):  # noqa: F811
    """Zero-disk encoding groups the same faces into the same folders (the
    FakeEncoder buckets by brightness, robust to JPEG loss)."""
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=80, fps=10)
    outs = {}
    for tag, from_mem in [("disk", False), ("mem", True)]:
        out = str(tmp_path / tag)
        os.makedirs(out)
        video_to_faces(input_path=video, out_dir=out, style="live", mode="full",
                       video_step=0.5, hash_thr=2, enc_dup_thr=0.01, clusters=2,
                       det_scale=(1, 1, 1, 1), det_square=False,
                       enc_from_memory=from_mem)
        faces = osp.join(out, "faces")
        outs[tag] = {d: sorted(os.listdir(osp.join(faces, d)))
                     for d in os.listdir(faces) if osp.isdir(osp.join(faces, d))}
    # same cluster labels may swap between runs; compare the grouping partition
    parts = [sorted(tuple(v) for v in o.values()) for o in outs.values()]
    assert parts[0] == parts[1]
