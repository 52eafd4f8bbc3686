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


def _window_oracle(all_hashes, thr, window, n_seed):
    """Scalar reimplementation of the reference's prev-window loop
    (dupes.py:18-48): compare each new hash to the last `window` KEPT."""
    kept = list(range(n_seed))
    keep, dist, ref = [], [], []
    for i in range(n_seed, len(all_hashes)):
        if not kept:
            keep.append(True)
            dist.append(10000)
            ref.append(-1)
            kept.append(i)
            continue
        win = kept[-window:]
        ds = [bin(int(all_hashes[i] ^ all_hashes[j])).count("1") for j in win]
        b = int(np.argmin(ds))
        dist.append(ds[b])
        ref.append(win[b])
        if ds[b] > thr:
            keep.append(True)
            kept.append(i)
        else:
            keep.append(False)
    return np.asarray(keep), np.asarray(dist), np.asarray(ref)


def test_hamming_prev_window_matches_oracle(rng):
    for n_seed in (0, 1, 5):
        vecs = rng.integers(0, 2, size=(40 + n_seed, 64)).astype(np.uint64)
        # plant near-duplicates so both branches are taken
        for i in (7, 12, 25):
            vecs[n_seed + i] = vecs[n_seed + i - 3]
        packed = NV.pack_bits(vecs)
        seed, new = packed[:n_seed], packed[n_seed:]
        keep, dist, ref = NV.hamming_prev_window(new, thr=8, window=5, seed=seed)
        wk, wd, wr = _window_oracle(packed, 8, 5, n_seed)
        np.testing.assert_array_equal(keep, wk)
        np.testing.assert_array_equal(
            dist[np.asarray(wr) >= 0], wd[np.asarray(wr) >= 0])
        np.testing.assert_array_equal(ref, wr)


def test_hamming_prev_window_native_matches_numpy_fallback(rng):
    vecs = rng.integers(0, 2, size=(30, 64)).astype(np.uint64)
    vecs[9] = vecs[6]
    packed = NV.pack_bits(vecs)
    seed = packed[:4]
    want = NV.hamming_prev_window(packed[4:], thr=10, window=5, seed=seed)
    # force the numpy fallback
    lib, NV._LIB = NV._LIB, None
    try:
        got = NV.hamming_prev_window(packed[4:], thr=10, window=5, seed=seed)
    finally:
        NV._LIB = lib
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
