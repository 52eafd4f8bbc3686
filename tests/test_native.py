import numpy as np

from videotofaces_tpu.utils import native as NV


def test_native_lib_builds():
    assert NV.available(), "g++ build of native/v2f_host.cpp failed"


def test_ahash_native_matches_numpy_fallback(rng):
    imgs = rng.integers(0, 256, size=(6, 37, 53, 3)).astype(np.uint8)
    got = NV.ahash64_batch(imgs)

    # independent scalar recomputation
    for i in range(6):
        gray = imgs[i] @ np.asarray([0.114, 0.587, 0.299])
        h, w = gray.shape
        cells = np.empty((8, 8))
        for cy in range(8):
            for cx in range(8):
                y0, y1 = (cy * h) // 8, max(-((-(cy + 1) * h) // 8), (cy * h) // 8 + 1)
                x0, x1 = (cx * w) // 8, max(-((-(cx + 1) * w) // 8), (cx * w) // 8 + 1)
                cells[cy, cx] = gray[y0:y1, x0:x1].mean()
        bits = (cells.flatten() > cells.mean()).astype(np.uint64)
        want = int((bits << np.arange(64, dtype=np.uint64)).sum())
        assert int(got[i]) == want, i


def test_hamming_nearest_earlier(rng):
    vecs = rng.integers(0, 2, size=(30, 64)).astype(np.uint64)
    vecs[11] = vecs[4]
    packed = NV.pack_bits(vecs)
    dist, ref = NV.hamming_nearest_earlier(packed)
    assert dist[0] == 10000
    assert dist[11] == 0 and ref[11] == 4
    for i in range(1, 30):
        want = min(int((vecs[i] != vecs[j]).sum()) for j in range(i))
        assert dist[i] == want
