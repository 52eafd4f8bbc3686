"""End-to-end runs of the five BASELINE.json configs through the real
orchestration (api.video_to_faces -> pipeline -> dedup -> grouping), with
tiny deterministic stand-in models so the plumbing, flags, and output
layout of EACH config are what is under test:

  1. detection-only: MTCNN flags, video-step 0.25, OpenCV decode
  2. full live pipeline: detect + embed + K-means auto-cluster
  3. anime style: YOLO + ViT-L16, enc-batch-size 128, hash + embedding dedup
  4. classification mode: ref images, --enc-oth-thr open-set, group-log CSV
  5. batch folder, Decord reader (CPU fallback), clusters '2-6' sweep +
     clusters-save-all
"""

import os
import os.path as osp

import cv2
import numpy as np
import pytest

from videotofaces_tpu import video_to_faces
from test_api import FakeEncoder
from test_pipeline_detection import FakeDetector, _write_test_video


@pytest.fixture
def patched_models(monkeypatch):
    captured = {}

    def fake_det(style, det, dev):
        captured["det"] = (style, det)
        return FakeDetector()

    def fake_enc(style, enc, dev):
        captured["enc"] = (style, enc)
        return FakeEncoder()

    monkeypatch.setattr("videotofaces_tpu.api.get_detector_model", fake_det)
    monkeypatch.setattr("videotofaces_tpu.api.get_encoder_model", fake_enc)
    monkeypatch.setattr("videotofaces_tpu.pipeline.grouping.get_encoder_model",
                        fake_enc)
    return captured


def test_config1_detection_only_mtcnn(tmp_path, patched_models):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=40, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live",
                   det_model="mtcnn", mode="detection", video_step=0.25,
                   video_reader="opencv", det_scale=(1, 1, 1, 1),
                   det_square=False)
    assert patched_models["det"] == ("live", "mtcnn")
    faces = osp.join(out, "faces")
    files = [f for f in os.listdir(faces) if f.endswith(".jpg")]
    assert files, "detection-only must write face crops"
    # detection-only: no grouping artifacts
    assert not osp.isfile(osp.join(faces, "log_clustering.csv"))
    assert all(osp.isfile(osp.join(faces, f)) for f in files)


def test_config2_full_live_autocluster(tmp_path, patched_models):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=80, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live", mode="full",
                   video_step=0.5, hash_thr=2, enc_dup_thr=0.01,
                   clusters="2-3", det_scale=(1, 1, 1, 1), det_square=False,
                   group_log=True)
    faces = osp.join(out, "faces")
    subdirs = sorted(d for d in os.listdir(faces)
                     if osp.isdir(osp.join(faces, d)))
    assert subdirs and all(d.isdigit() for d in subdirs)
    # the silhouette sweep logged every candidate k
    log = open(osp.join(faces, "log_clustering.csv")).read().splitlines()
    assert len(log) >= 3  # header + k=2 + k=3
    assert sum(len(os.listdir(osp.join(faces, d))) for d in subdirs) > 0


def test_config3_anime_yolo_vitl_dedup(tmp_path, patched_models):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=60, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="anime",
                   det_model="yolo", enc_model="vit_l", enc_batch_size=128,
                   mode="full", video_step=0.5, hash_thr=2, enc_dup_thr=0.01,
                   clusters=2, det_scale=(1, 1, 1, 1), det_square=False,
                   save_dupes=True)
    # the style<->model relaxation (baseline config 3) must route exactly
    assert patched_models["det"] == ("anime", "yolo")
    assert patched_models["enc"] == ("anime", "vit_l")
    inter = osp.join(out, "intermediate")
    # hash dedup (detection stage) and embedding dedup (grouping stage) logs
    assert osp.isfile(osp.join(inter, "log_dupes2.csv"))
    assert osp.isfile(osp.join(inter, "log_dupes3.csv"))
    faces = osp.join(out, "faces")
    assert sorted(d for d in os.listdir(faces)
                  if osp.isdir(osp.join(faces, d))) == ["0", "1"]


def test_config4_classification_open_set(tmp_path, patched_models):
    out = str(tmp_path / "out")
    faces = osp.join(out, "faces")
    os.makedirs(faces)
    rng = np.random.default_rng(0)
    # dark and bright groups + one mid-gray face no reference matches
    vals = [30, 220, 30, 220, 130]
    for i, val in enumerate(vals):
        img = np.full((64, 64, 3), val, np.uint8)
        img[:8] = rng.integers(0, 40, size=(8, 64, 3))
        cv2.imwrite(osp.join(faces, "f%02d.jpg" % i), img)
    ref = osp.join(out, "ref")
    os.makedirs(osp.join(ref, "dark"))
    os.makedirs(osp.join(ref, "bright"))
    cv2.imwrite(osp.join(ref, "dark", "r.jpg"), np.full((64, 64, 3), 25, np.uint8))
    cv2.imwrite(osp.join(ref, "bright", "r.jpg"), np.full((64, 64, 3), 225, np.uint8))

    video_to_faces(mode="grouping", out_dir=out, style="live",
                   group_mode="classification", ref_dir=ref, enc_dup_thr=-1,
                   enc_oth_thr=0.25, group_log=True)
    assert len(os.listdir(osp.join(faces, "dark"))) == 2
    assert len(os.listdir(osp.join(faces, "bright"))) == 2
    # the open-set threshold sent the mid-gray face to "other"
    assert len(os.listdir(osp.join(faces, "other"))) == 1
    log = open(osp.join(faces, "log_classification.csv")).read()
    assert "dark" in log and "bright" in log


def test_config5_batch_folder_decord_sweep_save_all(tmp_path, patched_models):
    folder = str(tmp_path / "vids")
    os.makedirs(folder)
    rng = np.random.default_rng(3)
    for vi, name in enumerate(("a.avi", "b.avi")):
        vw = cv2.VideoWriter(osp.join(folder, name),
                             cv2.VideoWriter_fourcc(*"MJPG"), 10, (320, 240))
        assert vw.isOpened()
        for i in range(50):
            # distinct per-video texture so cross-video dedup keeps both
            frame = rng.integers(0, 255, size=(240, 320, 3)).astype(np.uint8)
            frame[:, :, vi] = (i * 6) % 255
            vw.write(frame)
        vw.release()
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=folder, input_ext="avi", out_dir=out,
                   style="live", mode="full", video_reader="decord",
                   video_step=0.5, hash_thr=0, enc_dup_thr=-1,
                   clusters="2-3", clusters_save_all=True,
                   det_scale=(1, 1, 1, 1), det_square=False, group_log=True)
    faces = osp.join(out, "faces")
    gdirs = sorted(d for d in os.listdir(faces) if d.startswith("G"))
    assert gdirs == ["G2", "G3"], gdirs  # save-all keeps every candidate k
    # multi-file runs prefix faces per source video, 1-based like the
    # reference ('%02d_' % (k + 1), detection.py:51)
    names = [f for g in gdirs for sub in os.listdir(osp.join(faces, g))
             for f in os.listdir(osp.join(faces, g, sub))]
    assert any(n.startswith("01_") for n in names)
    assert any(n.startswith("02_") for n in names)
    assert osp.isfile(osp.join(faces, "log_clustering.csv"))
