"""Multi-chip wiring of the USER surface: video_to_faces -> detect_faces with
a detector sharded over the virtual 8-device mesh must produce byte-identical
face files to the single-device run (the postprocess is strictly per-image)."""

import os
import os.path as osp


from videotofaces_tpu import video_to_faces
from videotofaces_tpu.pipeline import detection as PD
from videotofaces_tpu.pipeline.mesh_auto import default_mesh
from test_pipeline_detection import _write_test_video


def _run_v2f(tmp_path, tag, monkeypatch, single_device):
    if single_device:
        monkeypatch.setenv("V2F_SINGLE_DEVICE", "1")
    else:
        monkeypatch.delenv("V2F_SINGLE_DEVICE", raising=False)
    video = str(tmp_path / "clip.avi")
    if not osp.exists(video):
        _write_test_video(video, n_frames=40, fps=10, size=(160, 120))
    out = str(tmp_path / tag)
    os.makedirs(out)
    # the real factory, with a small jit bucket so the test stays fast
    real_factory = PD.get_detector_model
    monkeypatch.setattr(
        "videotofaces_tpu.api.get_detector_model",
        lambda style, det, dev: real_factory(style, det, dev, max_side=96,
                                             batch_size=8))
    video_to_faces(input_path=video, out_dir=out, style="live", mode="detection",
                   det_model="yolo", video_step=1, hash_thr=-1, det_min_score=0.0,
                   det_min_size=1, det_min_border=0, det_scale=(1, 1, 1, 1),
                   det_square=False)
    faces = osp.join(out, "faces")
    return {f: open(osp.join(faces, f), "rb").read() for f in os.listdir(faces)}


def test_default_mesh_uses_all_virtual_devices():
    mesh = default_mesh()
    assert mesh is not None and mesh.shape["data"] == 8


def test_default_mesh_opt_out(monkeypatch):
    monkeypatch.setenv("V2F_SINGLE_DEVICE", "1")
    assert default_mesh() is None


def test_video_to_faces_sharded_equals_single_device(tmp_path, monkeypatch):
    sharded = _run_v2f(tmp_path, "out_mesh", monkeypatch, single_device=False)
    solo = _run_v2f(tmp_path, "out_solo", monkeypatch, single_device=True)
    assert sharded and sorted(sharded) == sorted(solo)
    for name in sharded:
        assert sharded[name] == solo[name], name


def test_detect_faces_prints_stage_report(tmp_path, capsys):
    from videotofaces_tpu.pipeline.detection import detect_faces
    from videotofaces_tpu.specs import BoxCriteria, FrameSampling, OutputLayout
    from test_pipeline_detection import FakeDetector

    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=30, fps=10)
    out = str(tmp_path / "out")
    os.makedirs(out)
    detect_faces([video], FakeDetector(), FrameSampling(step=1),
                 BoxCriteria(scale=(1, 1, 1, 1), square=False),
                 OutputLayout(out), hash_thr=8)
    printed = capsys.readouterr().out
    assert "Stage timings:" in printed
    assert "host:postprocess" in printed
    assert "dedup:all-pairs" in printed
