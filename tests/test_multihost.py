"""Multi-host data parallelism (parallel/multihost.py): pure helpers, the
file-exchange all-gather with real concurrent processes, and a full 2-host
video_to_faces job whose merged output must match the single-host run."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from videotofaces_tpu.parallel import multihost as MH
from test_pipeline_detection import _write_test_video

HERE = osp.dirname(osp.abspath(__file__))


def test_shard_list_round_robin():
    items = list("abcdefg")
    shards = [MH.shard_list(items, i, 3) for i in range(3)]
    assert shards == [["a", "d", "g"], ["b", "e"], ["c", "f"]]
    # single host: everything
    assert MH.shard_list(items, 0, 1) == items


def test_host_prefix():
    assert MH.host_prefix("x_", 0, 1) == "x_"
    assert MH.host_prefix("x_", 2, 4) == "h02_x_"
    assert MH.host_prefix("", 1, 2) == "h01_"


def test_pack_unpack_names_round_trip():
    names = ["000001_0.jpg", "h01_02_000123_4.jpg", ""]
    assert MH.unpack_names(MH.pack_names(names)) == names
    with pytest.raises(ValueError, match="exceeds"):
        MH.pack_names(["x" * 65])


def test_merge_gathered_trims_and_orders():
    c = [2, 0, 1]
    rows = [np.arange(8).reshape(4, 2), np.zeros((0, 1)), 10 + np.arange(2).reshape(1, 2)]
    names = [MH.pack_names(["a", "b", "pad", "pad"]), MH.pack_names([]),
             MH.pack_names(["c"])]
    merged, out = MH.merge_gathered(c, rows, names)
    np.testing.assert_array_equal(merged, [[0, 1], [2, 3], [10, 11]])
    assert out == ["a", "b", "c"]


def test_allgather_identity_single_host(monkeypatch):
    monkeypatch.delenv("V2F_PROCESS_COUNT", raising=False)
    feats = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    g, names = MH.allgather_rows(feats, list("abcde"))
    np.testing.assert_array_equal(g, feats)
    assert names == list("abcde")


def _gather_worker(code, index, count, gdir, env_extra=None):
    env = dict(os.environ, V2F_PROCESS_INDEX=str(index),
               V2F_PROCESS_COUNT=str(count), V2F_GATHER_DIR=gdir,
               V2F_RUN_ID="testrun", JAX_PLATFORMS="cpu", **(env_extra or {}))
    return subprocess.Popen([sys.executable, "-c", code], env=env,
                            cwd=osp.dirname(HERE),
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_file_exchange_allgather_two_processes(tmp_path):
    """Two REAL concurrent processes exchange uint64 hash rows; both must see
    the identical merged result, host-0 rows first."""
    code = r"""
import numpy as np, os, sys
sys.path.insert(0, ".")
from videotofaces_tpu.parallel import multihost as MH
i = int(os.environ["V2F_PROCESS_INDEX"])
rows = (np.arange(2 + i, dtype=np.uint64) + (1 << 63) + 1000 * i)
names = ["h%d_%d.jpg" % (i, k) for k in range(len(rows))]
g, out = MH.allgather_rows(rows, names)
print("MERGED", g.dtype, list(map(int, g)), out)
"""
    procs = [_gather_worker(code, i, 2, str(tmp_path)) for i in range(2)]
    outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    lines = [next(l for l in o.splitlines() if l.startswith("MERGED")) for o in outs]
    assert lines[0] == lines[1]
    # host order, exact uint64 (top bit set) round trip
    want = [int((1 << 63) + k) for k in range(2)] + \
           [int((1 << 63) + 1000 + k) for k in range(3)]
    assert str(want) in lines[0].replace("'", "")


def test_gather_dir_requires_run_id(tmp_path, monkeypatch):
    monkeypatch.setenv("V2F_GATHER_DIR", str(tmp_path))
    monkeypatch.delenv("V2F_RUN_ID", raising=False)
    monkeypatch.setenv("V2F_PROCESS_INDEX", "0")
    monkeypatch.setenv("V2F_PROCESS_COUNT", "2")
    with pytest.raises(RuntimeError, match="V2F_RUN_ID"):
        MH.allgather_rows(np.ones((1, 2), np.float32), ["a.jpg"])


def test_gather_dir_refuses_reused_run_id(tmp_path, monkeypatch):
    """seq>=1 leftovers under the SAME run id mean the id was reused; the
    seq-0 guard must refuse rather than risk merging a prior run's rows.
    Leftover g000 files from a DIFFERENT run id are invisible (scoped away)."""
    monkeypatch.setenv("V2F_RUN_ID", "dup")
    rdir = tmp_path / "run_dup"
    rdir.mkdir()
    np.savez(str(rdir / "g001_h00.npz"), rows=np.zeros((1, 1), np.uint8))
    MH._gather_seq[0] = 0
    with pytest.raises(RuntimeError, match="previous run"):
        MH._exchange_via_dir(str(tmp_path), 0, 2,
                             {"rows": np.zeros((1, 1), np.uint8)}, timeout=1)
    MH._gather_seq[0] = 0


def test_stale_run_dirs_reaped_fresh_kept(tmp_path, monkeypatch):
    """A long-lived shared gather root must not grow one run dir per job
    forever: dirs untouched past V2F_GATHER_REAP_HOURS are swept at the
    first gather of a new run; fresh dirs (possibly concurrent jobs) and the
    current run's dir survive."""
    import os
    import time

    monkeypatch.setenv("V2F_RUN_ID", "fresh")
    monkeypatch.setenv("V2F_GATHER_REAP_HOURS", "48")
    old = tmp_path / "run_old"
    old.mkdir()
    np.savez(str(old / "g000_h00.npz"), rows=np.zeros((1, 1), np.uint8))
    past = time.time() - 80 * 3600
    os.utime(str(old), (past, past))
    recent = tmp_path / "run_recent"
    recent.mkdir()  # fresh mtime — possibly a concurrent job
    MH._gather_seq[0] = 0
    MH._reaped[0] = False
    out = MH._exchange_via_dir(str(tmp_path), 0, 1,
                               {"rows": np.zeros((2, 3), np.uint8)}, timeout=5)
    assert len(out) == 1 and out[0]["rows"].shape == (2, 3)
    assert not old.exists(), "stale run dir should be reaped"
    assert recent.exists(), "fresh run dir must survive"
    assert (tmp_path / "run_fresh").exists()
    MH._gather_seq[0] = 0
    MH._reaped[0] = False


def test_grouping_mode_shards_paths_per_host(tmp_path, monkeypatch):
    """mode='grouping' must give each host a DISJOINT face shard — without
    it every host gathers identical copies of every row and the global
    dedup (distance 0) deletes the whole face set."""
    import cv2
    import numpy as np

    import videotofaces_tpu.api as api

    faces = tmp_path / "faces"
    faces.mkdir()
    for i in range(6):
        cv2.imwrite(str(faces / ("f%02d.jpg" % i)),
                    np.full((16, 16, 3), 40 * i, np.uint8))

    # stand-in for the listing-consistency all-gather (shared FS: every host
    # sees the same names)
    monkeypatch.setattr(api.MH, "allgather_rows",
                        lambda rows, names, **kw: (np.tile(rows, (2, 1)),
                                                   list(names) * 2))
    got = {}
    for idx in range(2):
        monkeypatch.setenv("V2F_PROCESS_INDEX", str(idx))
        monkeypatch.setenv("V2F_PROCESS_COUNT", "2")
        plan = api._plan_grouping("grouping", "clustering", 2, None,
                                  str(tmp_path), False)
        got[idx] = [osp.basename(p) for p in plan.paths]
    assert sorted(got[0] + got[1]) == ["f%02d.jpg" % i for i in range(6)]
    assert not set(got[0]) & set(got[1])


def test_grouping_mode_refuses_divergent_listings(tmp_path, monkeypatch):
    """Host-local out_dirs (differing listings) must fail loudly instead of
    silently never encoding (count-1)/count of each host's faces."""
    import cv2

    import videotofaces_tpu.api as api

    faces = tmp_path / "faces"
    faces.mkdir()
    for i in range(4):
        cv2.imwrite(str(faces / ("f%02d.jpg" % i)),
                    np.full((16, 16, 3), 50 * i, np.uint8))
    # the gathered union contains names the local listing lacks
    monkeypatch.setattr(
        api.MH, "allgather_rows",
        lambda rows, names, **kw: (np.tile(rows, (2, 1)),
                                   list(names) + ["other_host.jpg"] * len(names)))
    monkeypatch.setenv("V2F_PROCESS_INDEX", "0")
    monkeypatch.setenv("V2F_PROCESS_COUNT", "2")
    with pytest.raises(RuntimeError, match="shared filesystem"):
        api._plan_grouping("grouping", "clustering", 2, None, str(tmp_path),
                           False)


def test_allgather_with_one_empty_host(tmp_path):
    code = r"""
import numpy as np, os, sys
sys.path.insert(0, ".")
from videotofaces_tpu.parallel import multihost as MH
i = int(os.environ["V2F_PROCESS_INDEX"])
if i == 0:
    # the REAL empty-shard shape: encode_faces' (0, 1) placeholder, whose
    # width does NOT match the other host's embedding width (regression:
    # the final reshape used the local placeholder width and raised)
    rows, names = np.zeros((0, 1), np.float32), []
else:
    rows, names = np.ones((2, 4), np.float32), ["a.jpg", "b.jpg"]
g, out = MH.allgather_rows(rows, names)
assert g.shape == (2, 4) and out == ["a.jpg", "b.jpg"], (g.shape, out)
print("OK")
"""
    procs = [_gather_worker(code, i, 2, str(tmp_path)) for i in range(2)]
    outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all("OK" in o for o in outs)


def _faces_by_label(root):
    """After clustering: {label: sorted list of face-file bytes}."""
    faces = osp.join(root, "faces")
    out = {}
    for lbl in sorted(os.listdir(faces)):
        d = osp.join(faces, lbl)
        if not osp.isdir(d):
            continue
        out[lbl] = sorted(open(osp.join(d, f), "rb").read()
                          for f in os.listdir(d))
    return out


@pytest.mark.slow
def test_two_host_full_job_matches_single_host(tmp_path):
    """End-to-end: 2 videos, full mode (detect -> global hash dedup -> encode
    -> global gather -> embed dedup -> k-means). The 2-host run must place
    the same face images in the same global cluster labels as 1-host."""
    vids = tmp_path / "vids"
    os.makedirs(vids)
    _write_test_video(str(vids / "a.avi"), n_frames=30, fps=10, size=(128, 96))
    _write_test_video(str(vids / "b.avi"), n_frames=30, fps=10, size=(128, 96),
                      seed=7)

    driver = osp.join(HERE, "mh_driver.py")

    def run_host(index, count, out_dir, gdir):
        os.makedirs(out_dir, exist_ok=True)
        env = dict(os.environ, V2F_PROCESS_INDEX=str(index),
                   V2F_PROCESS_COUNT=str(count), JAX_PLATFORMS="cpu")
        env.pop("V2F_GATHER_DIR", None)
        if gdir:
            env["V2F_GATHER_DIR"] = gdir
            env["V2F_RUN_ID"] = "e2e"
        return subprocess.Popen(
            [sys.executable, driver, str(vids), out_dir, "full"], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    single = run_host(0, 1, str(tmp_path / "single"), None)
    s_out = single.communicate(timeout=900)[0].decode()
    assert single.returncode == 0, s_out

    gdir = str(tmp_path / "gather")
    hosts = [run_host(i, 2, str(tmp_path / ("h%d" % i)), gdir) for i in range(2)]
    m_outs = [p.communicate(timeout=900)[0].decode() for p in hosts]
    assert all(p.returncode == 0 for p in hosts), "\n----\n".join(m_outs)

    want = _faces_by_label(str(tmp_path / "single"))
    got0 = _faces_by_label(str(tmp_path / "h0"))
    got1 = _faces_by_label(str(tmp_path / "h1"))
    labels = set(want)
    assert set(got0) | set(got1) <= labels | set()
    merged = {lbl: sorted(got0.get(lbl, []) + got1.get(lbl, [])) for lbl in labels}
    assert {k: len(v) for k, v in merged.items()} == {k: len(v) for k, v in want.items()}
    assert merged == want
