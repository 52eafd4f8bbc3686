"""End-to-end driver runs with the real (randomly initialized) detector
wrappers on a tiny synthetic video — verifies wrapper/driver API contracts
(tuple vs list outputs, batch padding, jit bucket caching) on CPU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videotofaces_tpu.pipeline.detection import detect_faces
from test_pipeline_detection import _write_test_video


def _run(model, tmp_path, criteria=None):
    from videotofaces_tpu.specs import BoxCriteria, FrameSampling, OutputLayout

    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=30, fps=10, size=(128, 96))
    out = str(tmp_path / "out")
    os.makedirs(out)
    criteria = criteria or BoxCriteria(batch_size=2, min_score=0.0, min_size=1,
                                       min_border=0, scale=(1.0, 1.0, 1.0, 1.0),
                                       square=False)
    paths = detect_faces([video], model, FrameSampling(step=1), criteria,
                         OutputLayout(out), hash_thr=None)
    assert isinstance(paths, list)
    return paths


def test_yolo_wrapper_through_driver(tmp_path):
    from videotofaces_tpu.models.wrappers import YoloDetector
    from videotofaces_tpu.models import yolo as Y

    model = Y.YOLOv3(1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    det = YoloDetector(params=params, max_side=96)
    _run(det, tmp_path)
    assert len(det._cache) == 1  # one jit bucket for the whole video


def test_mtcnn_wrapper_through_driver(tmp_path):
    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.models.wrappers import MtcnnDetector

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    caps = M.Caps(pre1=128, post1=32, cross=128, stage2=64, stage3=32, out=16)
    det = MtcnnDetector(params=params, min_face_size=20, caps=caps)
    _run(det, tmp_path)


@pytest.mark.slow
def test_frcnn_wrapper_through_driver(tmp_path):
    from videotofaces_tpu.models import rcnn as R
    from videotofaces_tpu.models.wrappers import FrcnnDetector

    params = {
        "body": jax.jit(R.FasterRCNN(1).init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))["params"],
        "head": jax.jit(R.RoIHead(1).init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 256)))["params"],
    }
    det = FrcnnDetector(params=params, resize_spec=(64, 96), proposal_cap=64, out_top=16)
    _run(det, tmp_path)


def test_yolo_host_resize_close_to_device_resize(tmp_path, rng):
    """cv2 fixed-point resize vs device bilinear give near-identical scores."""
    import numpy as np
    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.models.wrappers import YoloDetector

    params = jax.jit(Y.YOLOv3(1).init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3)))["params"]
    frames = [rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)]
    dev = YoloDetector(params=params, max_side=96)
    host = YoloDetector(params=params, max_side=96, host_resize=True)
    b1, s1, _ = dev(frames)
    b2, s2, _ = host(frames)
    assert len(s1[0]) > 0
    # counts may differ by a couple of threshold-straddling candidates
    n = min(len(s1[0]), len(s2[0]))
    np.testing.assert_allclose(s1[0][:5], s2[0][:5], atol=0.05)
    np.testing.assert_allclose(b1[0][:3], b2[0][:3], atol=8.0)


def test_yolo_bf16_mode_matches_f32(tmp_path, rng):
    """bf16 throughput mode produces the same detections as f32 on easy inputs."""
    import numpy as np
    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.models.wrappers import YoloDetector

    params = jax.jit(Y.YOLOv3(1).init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3)))["params"]
    frames = [rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)]
    f32 = YoloDetector(params=params, max_side=96)
    bf16 = YoloDetector(params=params, max_side=96, bf16=True)
    b0, s0, _ = f32(frames)
    b1, s1, _ = bf16(frames)
    n = min(len(s0[0]), len(s1[0]))
    assert n > 0
    assert abs(len(s0[0]) - len(s1[0])) <= 2  # threshold-straddling tolerance
    np.testing.assert_allclose(s0[0][:5], s1[0][:5], atol=0.03)


def test_mtcnn_overflow_warning(tmp_path, capsys, rng):
    """A Caps too small for the candidate load must WARN (graceful truncation,
    never a crash) — stage2/stage3 checks included, not just stage1."""
    from videotofaces_tpu.models import mtcnn as M
    from videotofaces_tpu.models.wrappers import MtcnnDetector

    params = {
        "pnet": M.PNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": M.RNet().init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": M.ONet().init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))["params"],
    }
    # bias every subnet's face-class logit up so (nearly) every cell/crop is a
    # candidate; with a tiny Caps that overflows every stage
    for net in params.values():
        net["cls"]["bias"] = net["cls"]["bias"].at[1].add(6.0)
    caps = M.Caps(pre1=8, post1=8, cross=16, stage2=8, stage3=8, out=4)
    det = MtcnnDetector(params=params, min_face_size=20, caps=caps)
    frames = [rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)]
    res = det(frames)
    printed = capsys.readouterr().out
    assert "exceeded buffer capacity" in printed
    assert len(res) == 1 and res[0].shape[1] == 5  # truncated, still well-formed
    assert res[0].shape[0] <= 4
