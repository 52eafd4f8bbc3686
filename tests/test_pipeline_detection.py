import os
import os.path as osp

import cv2
import numpy as np

from videotofaces_tpu.pipeline import boxfilter as BF
from videotofaces_tpu.pipeline import dupes as DU
from videotofaces_tpu.pipeline.detection import detect_faces
from videotofaces_tpu.specs import BoxCriteria, FrameSampling, OutputLayout

import oracles


def test_adjust_boxes_matches_scalar_oracle(rng):
    img_size = (480, 640)
    for square in [True, False]:
        for scale in [(1.5, 1.5, 2.2, 1.2), (1.0, 1.0, 1.0, 1.0), (0.8, 1.3, 2.0, 0.7)]:
            boxes = []
            for _ in range(200):
                x1 = int(rng.integers(0, 600))
                y1 = int(rng.integers(0, 440))
                boxes.append([x1, y1, x1 + int(rng.integers(2, 300)), y1 + int(rng.integers(2, 300))])
            # include degenerate/edge cases
            boxes += [[0, 0, 640, 480], [0, 0, 5, 470], [600, 0, 640, 480], [0, 475, 640, 480]]
            iboxes = np.asarray(boxes, dtype=np.int64)
            iboxes[:, 2] = iboxes[:, 2].clip(max=640)
            iboxes[:, 3] = iboxes[:, 3].clip(max=480)
            got = BF.adjust_boxes(iboxes, img_size, scale, square)
            for k in range(len(iboxes)):
                want = oracles.np_adjust_box_single(tuple(iboxes[k]), img_size, scale, square)
                assert tuple(got[k]) == want, (tuple(iboxes[k]), scale, square, tuple(got[k]), want)


def test_check_conditions():
    iboxes = np.asarray([[10, 10, 100, 100], [10, 10, 40, 100], [2, 10, 100, 100],
                         [10, 10, 100, 478]])
    scores = np.asarray([0.9, 0.9, 0.9, 0.3])
    c1, c2, c3 = BF.check_conditions(iboxes, scores, (480, 640), 0.4, 50, 5)
    assert c1.tolist() == [False, False, False, True]
    assert c2.tolist() == [False, True, False, False]
    assert c3.tolist() == [False, False, True, True]


def test_dedup_hash_matches_numpy(rng):
    hashes = rng.integers(0, 2, size=(40, 64))
    hashes[7] = hashes[3]          # exact dup
    hashes[20] = hashes[5]
    hashes[20][:3] ^= 1            # distance 3
    mins, inds = np.asarray(DU.D.dedup_hash(hashes)[0]), np.asarray(DU.D.dedup_hash(hashes)[1])
    # numpy oracle
    want_mins = []
    for i in range(40):
        if i == 0:
            want_mins.append(None)
            continue
        d = (hashes[:i] != hashes[i]).sum(axis=1)
        want_mins.append(d.min())
        assert mins[i] == d.min()
        assert (hashes[inds[i]] != hashes[i]).sum() == d.min()
    assert mins[7] == 0 and mins[20] == 3


def test_nearest_earlier_device_fallback_matches_native(rng, monkeypatch):
    """Without a C++ toolchain the all-pairs hash dedup runs on device
    (ops/distances.dedup_hash); decisions must match the native path."""
    from videotofaces_tpu.utils import native as NV

    bits = rng.integers(0, 2, size=(300, 64)).astype(np.uint64)
    bits[250] = bits[17]
    packed = NV.pack_bits(bits)
    want_d, want_i = DU._nearest_earlier(packed, "hash")
    monkeypatch.setattr(DU.NV, "available", lambda: False)
    got_d, got_i = DU._nearest_earlier(packed, "hash")
    np.testing.assert_array_equal(got_d[1:], want_d[1:])
    # argmin ties may differ between backends; distances must agree
    for i in range(1, 300):
        assert int((bits[got_i[i]] != bits[i]).sum()) == int(got_d[i])


def test_remove_dupes_nearest_engines_agree(tmp_path, rng):
    """Parity (per-crop cv2 ahash + python window) and throughput (native
    fused hash + C++ window kernel) engines must make identical keep/drop
    decisions on clear-cut inputs: exact repeats (distance 0) vs distinct
    random crops (distance >> thr for 8x8 average hashes of noise)."""
    from videotofaces_tpu import config

    base = [rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
            for _ in range(6)]
    faces, k = [], 0
    for img in base:
        faces.append((img, "f%03d.jpg" % k)); k += 1
        faces.append((img.copy(), "f%03d.jpg" % k)); k += 1  # exact dup
    layout = OutputLayout(str(tmp_path))

    kept_p, _ = DU.remove_dupes_nearest(list(faces), [], 6, layout)
    with config.precision_scope("default"):
        kept_t, hashes_t = DU.remove_dupes_nearest(list(faces), [], 6, layout)
    assert [fn for _, fn in kept_p] == [fn for _, fn in kept_t]
    assert len(kept_p) == 6  # every second face is an exact window dup

    # batch-split equivalence: the throughput path threads state across
    # batches exactly like one big batch
    with config.precision_scope("default"):
        k1, h = DU.remove_dupes_nearest(list(faces[:5]), [], 6, layout)
        k2, h = DU.remove_dupes_nearest(list(faces[5:]), h, 6, layout)
    assert [fn for _, fn in k1 + k2] == [fn for _, fn in kept_t]
    assert [fn for _, fn in h] == [fn for _, fn in hashes_t]


def test_dedup_cosine_matches_sklearn(rng):
    import sklearn.metrics

    x = rng.normal(size=(30, 16)).astype(np.float32)
    x[9] = x[2] * 2.0  # cosine-identical
    mins, inds = DU.D.dedup_cosine(x)
    d = sklearn.metrics.pairwise.cosine_distances(x)
    d += (1 - np.tri(30, k=-1)) * 10000
    np.testing.assert_allclose(np.asarray(mins)[1:], d.min(axis=1)[1:], atol=1e-5)
    assert np.asarray(mins)[9] < 1e-5


class FakeDetector:
    """Deterministic stand-in emitting two boxes per frame (one too small)."""

    def __call__(self, frames):
        out = []
        for _ in range(len(frames)):
            out.append(np.asarray([
                [20.3, 30.2, 120.9, 130.1, 0.95],
                [5.0, 5.0, 20.0, 20.0, 0.9],      # rejected: too small + border
            ], dtype=np.float32))
        return out


def _write_test_video(path, n_frames=40, fps=10, size=(320, 240), seed=1):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, size)
    assert vw.isOpened()
    rng = np.random.default_rng(seed)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), (i * 6) % 255, np.uint8)
        frame[:, :, 1] = rng.integers(0, 255, size=(size[1], size[0]))
        vw.write(frame)
    vw.release()


def test_detect_faces_end_to_end(tmp_path):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    sampling = FrameSampling(step=1)                     # 1s step @ 10fps -> frames 10,20,30
    criteria = BoxCriteria(scale=(1.0, 1.0, 1.0, 1.0), square=False)
    layout = OutputLayout(out_dir, save_frames=True, save_rejects=True,
                          save_dupes=True)               # exercise all debug outputs
    paths = detect_faces([video], FakeDetector(), sampling, criteria, layout,
                         hash_thr=8)

    # frames 10, 20, 30 each yield 1 passing box; random green channel keeps
    # hashes distinct enough that at least one face survives dedup
    assert len(paths) >= 1
    for p in paths:
        assert osp.isfile(p)
        img = cv2.imread(p)
        assert img.shape == (101, 101, 3)  # box floor(20.3),floor(30.2)-ceil(120.9),ceil(130.1)
    assert osp.isfile(osp.join(out_dir, "intermediate", "log_rejects.csv"))
    with open(osp.join(out_dir, "intermediate", "log_rejects.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("file_name,score,width,height")
    assert len(lines) == 1 + 2 * 3  # 2 boxes x 3 frames
    assert osp.isfile(osp.join(out_dir, "intermediate", "frames", "000010.jpg"))


def test_detect_faces_multifile_prefix(tmp_path):
    v1, v2 = str(tmp_path / "a.avi"), str(tmp_path / "b.avi")
    _write_test_video(v1, n_frames=25)
    _write_test_video(v2, n_frames=25)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    paths = detect_faces([v1, v2], FakeDetector(), FrameSampling(step=1),
                         BoxCriteria(scale=(1.0, 1.0, 1.0, 1.0), square=False),
                         OutputLayout(out_dir), hash_thr=None)
    names = sorted(osp.basename(p) for p in paths)
    assert any(n.startswith("01_") for n in names)
    assert any(n.startswith("02_") for n in names)


def test_pipeline_depth_zero_still_pipelines(tmp_path, monkeypatch):
    """V2F_PIPELINE_DEPTH clamps to >= 1: even at 0 the loop must keep one
    batch in flight (submit batch i+1 before collecting batch i) — depth 0
    used to collect each batch immediately after its own submit, serializing
    host postprocess against device execution."""
    monkeypatch.setenv("V2F_PIPELINE_DEPTH", "0")
    calls = []

    class RecordingDetector(FakeDetector):
        batch_size = 1

        def submit(self, frames):
            calls.append("submit")
            return list(frames), len(frames)

        def collect(self, handle):
            calls.append("collect")
            frames, _ = handle
            return FakeDetector.__call__(self, frames)

    video = str(tmp_path / "clip.avi")
    _write_test_video(video)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    paths = detect_faces([video], RecordingDetector(), FrameSampling(step=1),
                         BoxCriteria(batch_size=1, scale=(1.0, 1.0, 1.0, 1.0),
                                     square=False),
                         OutputLayout(out_dir), hash_thr=None)
    assert len(paths) >= 1
    # 3 sampled frames at batch 1: one batch must ride ahead of the collect
    # point, so the trace starts submit, submit, collect — not submit, collect
    assert calls[:3] == ["submit", "submit", "collect"], calls


def test_packed_hash_array_stays_uint64():
    """Regression: np.stack on Python ints straddling 2^63 promotes to
    float64 and corrupts the low hash bits; the pipeline must build the
    dedup input as explicit uint64."""
    import numpy as np

    hashes = [2**63 + 0b10111, 0b10010]  # bit-63 set vs not
    arr = np.asarray(hashes, dtype=np.uint64)
    assert arr.dtype == np.uint64
    got = int(arr[0] ^ arr[1]).bit_count()
    want = bin(hashes[0] ^ hashes[1]).count("1")
    assert got == want == 3  # bit 63 plus 0b10111 ^ 0b10010 = 0b00101
    # the hazard this guards against: default promotion loses low bits
    assert np.stack(hashes).dtype == np.float64
