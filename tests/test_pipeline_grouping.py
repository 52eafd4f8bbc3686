import os
import os.path as osp

import cv2
import numpy as np

from videotofaces_tpu.pipeline import grouping as G
from videotofaces_tpu.pipeline.dupes import remove_dupes_overall
from videotofaces_tpu.specs import ClusterSpec, EncodeSpec, OutputLayout

from test_api import FakeEncoder


def _faces_dir(tmp_path, n=8):
    out = str(tmp_path / "out")
    faces = osp.join(out, "faces")
    os.makedirs(faces)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n):
        val = 20 if i % 2 == 0 else 230
        img = np.full((48, 48, 3), val, np.uint8)
        img[:6] = rng.integers(0, 40, size=(6, 48, 3))
        p = osp.join(faces, "f%02d.jpg" % i)
        cv2.imwrite(p, img)
        paths.append(p)
    return out, faces, paths


def test_cluster_faces_layout_and_log(tmp_path):
    out, faces, paths = _faces_dir(tmp_path)
    x = FakeEncoder()([cv2.imread(p) for p in paths])
    G.cluster_faces(paths, x, ClusterSpec([2, 3], False, 0, True), out)
    # best k chosen, images copied into <label>/ and originals removed
    log = osp.join(faces, "log_clustering.csv")
    assert osp.isfile(log)
    lines = open(log).read().strip().splitlines()
    assert lines[0] == "n_clusters,silhouette_score,calinski_harabasz_score,davies_bouldin_score"
    assert len(lines) == 3
    for p in paths:
        assert not osp.exists(p)
    grouped = sum(len(os.listdir(osp.join(faces, d)))
                  for d in os.listdir(faces) if osp.isdir(osp.join(faces, d)))
    assert grouped == len(paths)


def test_cluster_faces_save_all(tmp_path):
    out, faces, paths = _faces_dir(tmp_path)
    x = FakeEncoder()([cv2.imread(p) for p in paths])
    G.cluster_faces(paths, x, ClusterSpec([2, 4], True, 0, False), out)
    assert osp.isdir(osp.join(faces, "G2"))
    assert osp.isdir(osp.join(faces, "G4"))
    assert len(os.listdir(osp.join(faces, "G4"))) == 4


def test_classify_log_format(tmp_path):
    out, faces, paths = _faces_dir(tmp_path, n=4)
    x = FakeEncoder()([cv2.imread(p) for p in paths])
    r = x[:2] + 0.01
    inds, classes = G.classify(x, r, ["alice", "bob"], 0.9, True, paths, out)
    assert len(classes) == 3 and classes[-1] == "other"
    log = open(osp.join(faces, "log_classification.csv")).read().splitlines()
    assert log[0] == "file_name,dist_alice,dist_bob,assigned_to_class(other_threshold=0.9)"
    assert len(log) == 5


def test_test_grouping_harness(tmp_path, capsys):
    out, faces, paths = _faces_dir(tmp_path, n=6)
    with open(osp.join(out, "labels.txt"), "w") as f:
        f.write("\n".join(["1", "2", "1", "2", "1", "2"]))
    ref = osp.join(out, "ref")
    os.makedirs(osp.join(ref, "dark"))
    os.makedirs(osp.join(ref, "bright"))
    cv2.imwrite(osp.join(ref, "dark", "r.jpg"), np.full((48, 48, 3), 25, np.uint8))
    cv2.imwrite(osp.join(ref, "bright", "r.jpg"), np.full((48, 48, 3), 225, np.uint8))
    refs = [("dark", [osp.join(ref, "dark", "r.jpg")]),
            ("bright", [osp.join(ref, "bright", "r.jpg")])]

    import videotofaces_tpu.pipeline.grouping as GM
    orig = GM.get_encoder_model
    GM.get_encoder_model = lambda *a: FakeEncoder()
    try:
        G.test_grouping(paths, refs, "live", "facenet_vgg", None, out, False,
                        EncodeSpec(batch_size=4), None, 0)
    finally:
        GM.get_encoder_model = orig
    printed = capsys.readouterr().out.splitlines()
    tagline = "classification accuracy / rand score for clustering / silhouette score for clustering"
    assert tagline in printed
    # the metrics line precedes the tagline; dark images are labeled 1 and
    # match the dark ref -> perfect accuracy
    metrics = printed[printed.index(tagline) - 1]
    acc = float(metrics.split("/")[0])
    assert acc == 1.0


def test_remove_dupes_overall_moves_and_logs(tmp_path):
    out, faces, paths = _faces_dir(tmp_path, n=5)
    # rows 1 (colinear), 2 and 4 (identical) are cosine-duplicates of row 0
    feats = np.stack([np.ones(8), np.ones(8) * 2, np.ones(8),
                      np.asarray([1, 0, 0, 0, 0, 0, 0, 0.0]), np.ones(8)]).astype(np.float32)
    os.makedirs(osp.join(out, "intermediate"), exist_ok=True)
    x, goods = remove_dupes_overall(feats, paths, "enc", 0.05,
                                    OutputLayout(out, save_dupes=True))
    assert len(goods) == 2
    dupes_dir = osp.join(out, "intermediate", "dupes3")
    assert len(os.listdir(dupes_dir)) == 3
    log = open(osp.join(out, "intermediate", "log_dupes3.csv")).read().splitlines()
    assert log[0] == "file_name,nearest_in_prev,distance,marked_as_duplicate"
    assert len(log) == 5
