"""tools/ smoke coverage: the cache pre-warmer compiles production graphs
ahead of time (AOT, no execution) through the exact production wrappers."""

import importlib.util
import os.path as osp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, osp.join(REPO, "tools", name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_warm_cache_detector_and_encoder(capsys):
    wc = _load("warm_cache")
    # tiny shapes keep the CPU compile cheap; the test mesh has 8 virtual
    # devices, so the batch rounds up to a multiple of 8 exactly like
    # production submit() would
    wc.warm_detector("yolo", (64, 64), 1, bf16=True)
    wc.warm_encoder("facenet_vgg", 1, bf16=True)
    out = capsys.readouterr().out
    assert "warmed yolo" in out
    assert "warmed facenet_vgg" in out
