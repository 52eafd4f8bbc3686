import os
import os.path as osp

import cv2
import numpy as np
import pytest

import videotofaces_tpu.api as api
import videotofaces_tpu.prep as prep
from videotofaces_tpu import video_to_faces
from test_pipeline_detection import FakeDetector, _write_test_video


class FakeEncoder:
    """Embeddings = mean color of the image + noise by brightness bucket."""

    batch_size = None

    def __call__(self, images):
        out = []
        for img in images:
            base = np.zeros(32, dtype=np.float32)
            bucket = int(img.mean() // 64)
            base[bucket * 8: bucket * 8 + 8] = 1.0
            base += np.asarray([img.mean() / 255.0] * 32, dtype=np.float32) * 0.01
            out.append(base)
        return np.stack(out)


@pytest.fixture
def patched_models(monkeypatch):
    monkeypatch.setattr("videotofaces_tpu.api.get_detector_model",
                        lambda style, det, dev: FakeDetector())
    monkeypatch.setattr("videotofaces_tpu.api.get_encoder_model",
                        lambda style, enc, dev: FakeEncoder())
    monkeypatch.setattr("videotofaces_tpu.pipeline.grouping.get_encoder_model",
                        lambda style, enc, dev: FakeEncoder())


def test_full_mode_clustering(tmp_path, patched_models):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=80, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    video_to_faces(input_path=video, out_dir=out, style="live", mode="full",
                   video_step=0.5, hash_thr=2, enc_dup_thr=0.01, clusters=2,
                   det_scale=(1, 1, 1, 1), det_square=False, group_log=True)
    faces_dir = osp.join(out, "faces")
    subdirs = [d for d in os.listdir(faces_dir) if osp.isdir(osp.join(faces_dir, d))]
    assert sorted(subdirs) == ["0", "1"]
    assert osp.isfile(osp.join(faces_dir, "log_clustering.csv"))
    n_grouped = sum(len(os.listdir(osp.join(faces_dir, d))) for d in subdirs)
    assert n_grouped > 0


def test_grouping_mode_classification(tmp_path, patched_models):
    out = str(tmp_path / "out")
    faces = osp.join(out, "faces")
    os.makedirs(faces)
    rng = np.random.default_rng(0)
    # two visual groups: dark images and bright images
    for i in range(6):
        val = 30 if i % 2 == 0 else 220
        img = np.full((64, 64, 3), val, np.uint8)
        img[:8] = rng.integers(0, 50, size=(8, 64, 3))
        cv2.imwrite(osp.join(faces, "f%02d.jpg" % i), img)
    ref = osp.join(out, "ref")
    os.makedirs(osp.join(ref, "dark"))
    os.makedirs(osp.join(ref, "bright"))
    cv2.imwrite(osp.join(ref, "dark", "r.jpg"), np.full((64, 64, 3), 25, np.uint8))
    cv2.imwrite(osp.join(ref, "bright", "r.jpg"), np.full((64, 64, 3), 225, np.uint8))

    video_to_faces(mode="grouping", out_dir=out, style="anime",
                   group_mode="classification", ref_dir=ref, enc_dup_thr=-1,
                   enc_oth_thr=0.9, group_log=True)
    assert osp.isdir(osp.join(faces, "dark"))
    assert osp.isdir(osp.join(faces, "bright"))
    assert len(os.listdir(osp.join(faces, "dark"))) == 3
    assert len(os.listdir(osp.join(faces, "bright"))) == 3
    assert osp.isfile(osp.join(faces, "log_classification.csv"))


def test_validate_args_rejects_bad_options(tmp_path, capsys):
    assert not prep.validate_args("bogus", None, None, "live", "clustering",
                                  "opencv", "default", "default")
    assert not prep.validate_args("full", str(tmp_path / "nope.mp4"), None, "live",
                                  "clustering", "opencv", "default", "default")
    assert not prep.validate_args("full", None, None, "live", "clustering",
                                  "opencv", "bogus_model", "default")
    v = str(tmp_path / "v.avi")
    open(v, "w").close()
    assert prep.validate_args("full", v, None, "anime", "clustering",
                              "opencv", "rcnn", "vit_l")
    # cross-style pairings are allowed (with a printed note) — the reference
    # rejects them, but baseline config 3 needs anime + yolo + vit_l
    assert prep.validate_args("full", v, None, "anime", "clustering",
                              "opencv", "yolo", "vit_l")


def test_get_clusters():
    assert prep.get_clusters(None) == list(range(2, 9))
    assert prep.get_clusters(4) == [4]
    assert prep.get_clusters("4") == [4]  # CLI passes strings; reference errors here
    assert prep.get_clusters("0") is None
    assert prep.get_clusters("3,5,3,2") == [2, 3, 5]
    assert prep.get_clusters("2-5") == [2, 3, 4, 5]
    assert prep.get_clusters("5-2") is None
    assert prep.get_clusters("abc") is None


def test_get_video_list(tmp_path):
    d = tmp_path / "vids"
    d.mkdir()
    for name in ["b.mp4", "a.mkv", "c.txt_not_really.webm"]:
        (d / name).write_bytes(b"x")
    files = prep.get_video_list(str(d), None)
    assert [osp.basename(f) for f in files] == ["a.mkv", "b.mp4", "c.txt_not_really.webm"]
    files = prep.get_video_list(str(d), "mp4;mkv")
    assert [osp.basename(f) for f in files] == ["a.mkv", "b.mp4"]

    manifest = tmp_path / "list.txt"
    manifest.write_text(str(d / "a.mkv") + "\nmissing.mp4\n")
    files = prep.get_video_list(str(manifest), None)
    assert files == [str(d / "a.mkv")]


def test_cli_parser_roundtrip():
    from videotofaces_tpu.__main__ import build_parser

    args = build_parser().parse_args(
        ["-s", "live", "-i", "in.mp4", "--det-scale", "1", "1", "1", "1",
         "--video-fragment", "0.5", "2", "--clusters", "2-6", "--det-square"])
    d = vars(args)
    assert d["style"] == "live" and d["det_scale"] == [1, 1, 1, 1]
    assert d["video_fragment"] == [0.5, 2] and d["det_square"] is True
    # every CLI kwarg must be accepted by video_to_faces
    import inspect

    sig = inspect.signature(video_to_faces)
    for k in d:
        assert k in sig.parameters, k
